"""Image codecs for the ``bytes`` column — pure stdlib/numpy, no imaging libs.

The target input (`BASELINE.json` input_hint) carries images as opaque binary
with ``fmt ∈ {"png", "jpeg"}``. This container ships no imaging libraries
(no PIL / libjpeg), so:

* ``png`` — a REAL, spec-compliant PNG codec (zlib + filter-0 scanlines,
  8-bit gray or RGB). Files decode in any standard viewer; round-trip is
  lossless.
* ``jpeg`` — a clearly-marked DETERMINISTIC STAND-IN for libjpeg
  (``FakeJpeg``): uniform pixel quantization at a quality-derived step +
  zlib entropy coding, wrapped in a magic-tagged container. It is *lossy
  with a bounded, quality-controlled error* so the pipeline's PSNR≥40dB
  fidelity invariant (BASELINE.md) is exercised for real. The Ray-side
  plumbing (schema, batch shapes, actor decode path) is identical to what a
  libjpeg-backed codec would use — swap ``decode_fake_jpeg`` for a real
  decoder on a cluster with the library installed.

Unknown formats raise ``UnsupportedFormatError`` (NotImplementedError) — the
explicit stub gate required for absent decoders.

Same pattern per modality: video ships the deterministic ``fvid`` container
(mp4/webm stub-gated — no ffmpeg), audio ships a REAL RIFF/WAVE 16-bit PCM
codec (mp3/flac/ogg stub-gated — no codec libs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FJPG_MAGIC = b"FJPG"
PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SOI = b"\xff\xd8"  # real JPEG start-of-image marker

# Optional real-codec probe (VERDICT r4 #5): if PIL (which bundles
# libjpeg) is importable, real JPEG payloads decode through it; otherwise
# they hit the explicit stub gate below. This sandbox ships no PIL, so the
# gate path is what runs here — production images with pillow installed
# get real decode with zero config.
try:  # pragma: no cover - exercised only where PIL exists
    import io as _io

    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


class UnsupportedFormatError(NotImplementedError):
    """Raised for formats whose decoder is not available in this environment."""


def decode_real_jpeg(data: bytes) -> np.ndarray:
    """Decode a real JFIF/JPEG payload via PIL/libjpeg when available;
    explicit stub gate otherwise."""
    if not HAVE_PIL:
        raise UnsupportedFormatError(
            "real JPEG payload (SOI marker) but no PIL/libjpeg in this "
            "environment (stub gate: pip install pillow on a production "
            "image to enable)"
        )
    img = _PILImage.open(_io.BytesIO(data))  # pragma: no cover
    if img.mode not in ("L", "RGB"):  # pragma: no cover
        img = img.convert("RGB")
    return np.asarray(img)  # pragma: no cover


# ---------------------------------------------------------------------------
# PNG (real)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 → PNG bytes (filter 0)."""
    p = np.ascontiguousarray(pixels, dtype=np.uint8)
    if p.ndim == 2:
        color_type, channels = 0, 1
        p = p[:, :, None]
    elif p.ndim == 3 and p.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = p.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = p.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → (h, w) or (h, w, 3) uint8. Supports filters 0-2
    (None/Sub/Up) on 8-bit gray/RGB — covers everything this engine writes."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = channels = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack_from(">IIBB", payload)
            if depth != 8 or color_type not in (0, 2):
                raise UnsupportedFormatError("only 8-bit gray/RGB PNG supported")
            channels = 1 if color_type == 0 else 3
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, 1 + stride)
    filt, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros_like(rows)
    for y in range(h):
        if filt[y] == 0:
            out[y] = rows[y]
        elif filt[y] == 1:  # Sub
            acc = rows[y].copy()
            acc = acc.reshape(w, channels)
            np.cumsum(acc, axis=0, out=acc)
            out[y] = (acc & 0xFF).reshape(stride)
        elif filt[y] == 2:  # Up
            out[y] = (rows[y] + out[y - 1]) & 0xFF
        else:
            raise UnsupportedFormatError(f"PNG filter {filt[y]} not supported")
    img = out.astype(np.uint8)
    return img.reshape(h, w) if channels == 1 else img.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# FakeJpeg (deterministic lossy stand-in — see module docstring)
# ---------------------------------------------------------------------------

def _quant_step(quality: int) -> int:
    """Quality → uniform quantization step. q95→2, q85→4, q70→8.

    PSNR of uniform step-s quantization ≈ 20·log10(255·√12/s):
    s=4 → ≈46.9 dB, s=8 → ≈40.9 dB — both clear the 40 dB fidelity bar.
    """
    if quality >= 95:
        return 2
    if quality >= 85:
        return 4
    if quality >= 70:
        return 8
    return 16


def encode_fake_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    p = np.ascontiguousarray(pixels, dtype=np.uint8)
    if p.ndim == 2:
        p = p[:, :, None]
    h, w, c = p.shape
    step = _quant_step(quality)
    q = (p.astype(np.int32) + step // 2) // step
    q = np.clip(q, 0, 255 // step).astype(np.uint8)
    header = FJPG_MAGIC + struct.pack(">HHBB", w, h, c, step)
    return header + zlib.compress(q.tobytes(), 6)


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not a FakeJpeg payload")
    w, h, c, step = struct.unpack_from(">HHBB", data, 4)
    q = np.frombuffer(zlib.decompress(data[10:]), dtype=np.uint8)
    p = np.clip(q.astype(np.int32) * step, 0, 255).astype(np.uint8)
    p = p.reshape(h, w, c)
    return p.reshape(h, w) if c == 1 else p


# ---------------------------------------------------------------------------
# dispatch + metrics
# ---------------------------------------------------------------------------

def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode one image payload by declared format (magic-checked).

    ``jpeg`` dispatches on the payload's leading magic: the deterministic
    FakeJpeg container (what this sandbox's fixtures write) decodes with
    the built-in stand-in; a REAL JFIF payload (SOI marker) decodes via
    PIL/libjpeg when importable and hits the explicit stub gate here."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == FJPG_MAGIC:
            return decode_fake_jpeg(data)
        if data[:2] == JPEG_SOI:
            return decode_real_jpeg(data)
        return decode_fake_jpeg(data)  # raises its own clear ValueError
    raise UnsupportedFormatError(
        f"no decoder for fmt={fmt!r} in this environment (stub gate)"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------------------
# FakeVideo (deterministic container stand-in for real video formats)
# ---------------------------------------------------------------------------

FVID_MAGIC = b"FVID"


def encode_fake_video(
    frames: np.ndarray, fps: int = 30
) -> bytes:
    """Encode (n, h, w) gray or (n, h, w, 3) RGB uint8 frames → a FakeVideo
    container: magic + header + zlib-compressed raw frames. A deterministic
    stand-in for mp4/webm (no ffmpeg in this container) with the same
    pipeline-visible shape: one opaque binary blob per media row."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        f = f[:, :, :, None]
    n, h, w, c = f.shape
    header = FVID_MAGIC + struct.pack(">HHHBB", n, w, h, c, fps)
    return header + zlib.compress(f.tobytes(), 6)


def decode_fake_video(data: bytes) -> tuple[np.ndarray, int]:
    """FakeVideo bytes → ((n, h, w[, 3]) uint8 frames, fps)."""
    if data[:4] != FVID_MAGIC:
        raise ValueError("not a FakeVideo payload")
    n, w, h, c, fps = struct.unpack_from(">HHHBB", data, 4)
    raw = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    f = raw.reshape(n, h, w, c)
    return (f.reshape(n, h, w) if c == 1 else f), fps


def decode_video(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Decode one video payload by declared format (magic-checked). Real
    formats (mp4/webm/…) need ffmpeg — absent here → explicit stub gate."""
    if fmt == "fvid":
        return decode_fake_video(data)
    raise UnsupportedFormatError(
        f"no video decoder for fmt={fmt!r} in this environment (stub gate: "
        f"swap in an ffmpeg-backed decoder on a production image)"
    )


# ---------------------------------------------------------------------------
# WAV (real — RIFF/WAVE 16-bit PCM, pure struct+numpy like the PNG codec)
# ---------------------------------------------------------------------------

RIFF_SIG = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM → WAV bytes. ``samples`` is (n,) mono or
    (n, channels) interleaved-on-write. Spec-compliant RIFF/WAVE: plays in
    any standard audio tool; round-trip is lossless."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    block_align = channels * 2
    data = s.tobytes()  # int16 little-endian interleaved (C order)
    fmt_chunk = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_SIG + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n,) mono or (n, channels) int16 samples, sample_rate).

    Supports PCM 16-bit (what this engine writes and the overwhelmingly
    common interchange case); float/24-bit/compressed WAV variants raise the
    explicit ``UnsupportedFormatError`` stub gate."""
    if data[:4] != RIFF_SIG or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    channels = sample_rate = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise UnsupportedFormatError(
                    f"WAV variant (fmt={audio_fmt}, bits={bits}) not "
                    f"supported — only 16-bit PCM in this environment"
                )
        elif tag == b"data":
            pcm = payload
    if channels is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    s = np.frombuffer(pcm, dtype="<i2").astype(np.int16, copy=False)
    if channels > 1:
        s = s.reshape(-1, channels)
    return s, sample_rate


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Decode one audio payload by declared format. ``wav`` is a REAL codec
    (like ``png``); compressed formats (mp3/flac/ogg/…) need external codec
    libraries — absent here → explicit stub gate."""
    if fmt == "wav":
        return decode_wav(data)
    raise UnsupportedFormatError(
        f"no audio decoder for fmt={fmt!r} in this environment (stub gate: "
        f"swap in a libsndfile/ffmpeg-backed decoder on a production image)"
    )
