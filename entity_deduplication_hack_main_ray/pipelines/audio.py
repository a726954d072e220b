"""Audio column processing: decode / feature-extract / resample as
actor-pool ``map_batches`` stages — the audio leg of the multimodal family
(images/video: ``pipelines/multimodal.py``).

Audio rows are opaque ``binary`` columns with typed metadata (fmt), exactly
like images — ``wav`` decodes for real (RIFF 16-bit PCM,
``functions/codecs.py``), compressed formats hit the explicit
``UnsupportedFormatError`` stub gate. Stages follow the multimodal
conventions: stateful setup (window/FFT-bin "model" tensors) once per actor
in ``__init__``, small batches because rows are wide, ``ok=False``
null-tolerant sentinel rows for undecodable media, failed rows filtered at
the pipeline boundary so downstream stages never see empty payloads.

Feature values are emitted under the integer-e_n contract used engine-wide
(``energy_e6``, ``centroid_mhz``): one explicit rounding rule, so results
hash identically regardless of batch layout or worker float environment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import PipelineConfig, media_pool_size
from ..functions.codecs import (
    UnsupportedFormatError,
    decode_audio,
    encode_wav,
)


def _e6(x: float) -> int:
    return int(np.floor(x * 1e6 + 0.5))


def _mono_f64(samples: np.ndarray) -> np.ndarray:
    """int16 (n,) or (n, ch) → mono float64 in [-1, 1) (channel mean)."""
    s = samples.astype(np.float64) / 32768.0
    return s.mean(axis=1) if s.ndim == 2 else s


class AudioDecodeStats:
    """Actor-pool stage: decode each clip, emit duration/level features.

    (media_id, bytes, fmt) → (media_id, ok, sample_rate, channels,
    n_samples, duration_ms, rms_e6, peak). Undecodable formats yield
    ``ok=False`` rows rather than failing the batch."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ok, srs, chs, ns, durs, rms, peaks = [], [], [], [], [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                s, sr = decode_audio(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                ok.append(False)
                srs.append(0); chs.append(0); ns.append(0)
                durs.append(0); rms.append(0); peaks.append(0)
                continue
            mono = _mono_f64(s)
            n = len(mono)
            ok.append(True)
            srs.append(sr)
            chs.append(1 if s.ndim == 1 else s.shape[1])
            ns.append(n)
            durs.append(int(round(n * 1000 / sr)) if sr else 0)
            rms.append(_e6(float(np.sqrt(np.mean(mono * mono))) if n else 0.0))
            # abs in int32: np.abs(int16(-32768)) wraps back to -32768
            peaks.append(
                int(np.max(np.abs(s.astype(np.int32)))) if n else 0
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "sample_rate": pa.array(srs, pa.int32()),
                "channels": pa.array(chs, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "duration_ms": pa.array(durs, pa.int64()),
                "rms_e6": pa.array(rms, pa.int64()),
                "peak": pa.array(peaks, pa.int32()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: windowed frame features — the audio analog of
    ``VideoFrameSample`` (one input row → one output row per frame).

    Per frame of ``frame_len`` samples every ``hop``: energy (windowed mean
    square, ``energy_e6``) and spectral centroid (``centroid_mhz``,
    milli-Hz) via a real FFT. The Hann window is the per-actor "model",
    built once in ``__init__``; partial tail frames are dropped (clips
    shorter than one frame emit zero rows). All frames of a batch FFT as
    ONE stacked matrix — no per-frame Python."""

    def __init__(self, frame_len: int = 1024, hop: int = 512):
        self.frame_len = frame_len
        self.hop = hop
        # periodic Hann, the standard STFT analysis window
        self.window = 0.5 - 0.5 * np.cos(
            2 * np.pi * np.arange(frame_len) / frame_len
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        frames_per_clip: list[tuple[str, np.ndarray, int]] = []
        for mid, blob, fmt in zip(ids, blobs, fmts):
            try:
                s, sr = decode_audio(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                continue  # failed media carry no frames; audit via stats stage
            mono = _mono_f64(s)
            if len(mono) < self.frame_len:
                continue
            mat = np.lib.stride_tricks.sliding_window_view(
                mono, self.frame_len
            )[:: self.hop]
            frames_per_clip.append((mid, mat, sr))
        if not frames_per_clip:
            return pa.table(
                {
                    "media_id": pa.array([], pa.string()),
                    "frame_idx": pa.array([], pa.int32()),
                    "energy_e6": pa.array([], pa.int64()),
                    "centroid_mhz": pa.array([], pa.int64()),
                }
            )
        stacked = np.vstack([m for _, m, _ in frames_per_clip]) * self.window
        energy = (stacked * stacked).mean(axis=1)
        spec = np.abs(np.fft.rfft(stacked, axis=1))
        # per-clip frequency axes can differ (sample rates differ)
        bin_hz = np.concatenate(
            [
                np.full(m.shape[0], sr / self.frame_len)
                for _, m, sr in frames_per_clip
            ]
        )
        bins = np.arange(spec.shape[1])
        denom = spec.sum(axis=1)
        centroid_bins = np.divide(
            (spec * bins).sum(axis=1),
            denom,
            out=np.zeros_like(denom),
            where=denom > 0,
        )
        centroid_hz = centroid_bins * bin_hz
        out_ids = np.concatenate(
            [np.repeat(mid, m.shape[0]) for mid, m, _ in frames_per_clip]
        )
        out_idx = np.concatenate(
            [np.arange(m.shape[0], dtype=np.int32) for _, m, _ in frames_per_clip]
        )
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "energy_e6": pa.array(
                    np.floor(energy * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
                "centroid_mhz": pa.array(
                    np.floor(centroid_hz * 1e3 + 0.5).astype(np.int64),
                    pa.int64(),
                ),
            }
        )


class AudioResample:
    """Actor-pool stage: decode → linear-interpolation resample to
    ``target_sr`` → re-encode WAV — the audio analog of ``ImageResize``
    (output stays binary-typed so sinks/downstream stages treat it like
    source media)."""

    def __init__(self, target_sr: int = 8000):
        self.target_sr = target_sr

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        out_blobs, ok = [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                s, sr = decode_audio(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                out_blobs.append(b"")
                ok.append(False)
                continue
            mono = _mono_f64(s)
            if len(mono) == 0 or sr <= 0:  # valid-but-degenerate WAV:
                out_blobs.append(b"")      # ok=False, never crash the batch
                ok.append(False)
                continue
            n_out = max(1, int(round(len(mono) * self.target_sr / sr)))
            t_in = np.arange(len(mono)) / sr
            t_out = np.arange(n_out) / self.target_sr
            res = np.interp(t_out, t_in, mono)
            pcm = np.clip(np.round(res * 32768.0), -32768, 32767).astype(
                np.int16
            )
            out_blobs.append(encode_wav(pcm, self.target_sr))
            ok.append(True)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "fmt": pa.array(["wav"] * len(ids), pa.string()),
                "sample_rate": pa.array(
                    [self.target_sr] * len(ids), pa.int32()
                ),
                "bytes_out": pa.array(out_blobs, pa.binary()),
            }
        )


def audio_features_pipeline(
    audios: ray.data.Dataset,
    frame_len: int = 1024,
    hop: int = 512,
    cfg: PipelineConfig | None = None,
) -> ray.data.Dataset:
    """(media_id, bytes, fmt) clips → one row per analysis frame. Small
    batches (rows are wide) on an actor pool; undecodable or too-short
    clips contribute zero rows (audit them with ``AudioDecodeStats``)."""
    cfg = cfg or PipelineConfig()
    return audios.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"frame_len": frame_len, "hop": hop},
        batch_format="pyarrow",
        batch_size=max(8, cfg.image_batch_size // 8),
        concurrency=media_pool_size(),
    )


# ---------------------------------------------------------------------------
# deterministic driver-visible query (no audio table in the testdata: clips
# synthesize per-document, a pure row function — batch-layout independent)
# ---------------------------------------------------------------------------

_SYNTH_SR = 8000
_SYNTH_N = 4000  # 0.5 s per clip


def synth_audio_batch(t: pa.Table) -> pa.Table:
    """documents(doc_id) → (media_id, bytes, fmt) WAV clips: a two-tone
    mixture whose frequencies derive from doc_id alone. Vectorized across
    the batch (one (rows × samples) matrix)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    f1 = (200 + (ids % 20) * 50).astype(np.float64)  # 200..1150 Hz
    f2 = (1200 + (ids % 7) * 200).astype(np.float64)  # 1200..2400 Hz
    ts = np.arange(_SYNTH_N) / _SYNTH_SR
    wave = 0.5 * np.sin(2 * np.pi * f1[:, None] * ts) + 0.25 * np.sin(
        2 * np.pi * f2[:, None] * ts
    )
    pcm = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    return pa.table(
        {
            "media_id": pa.array([f"doc-{i}" for i in ids], pa.string()),
            "bytes": pa.array(
                [encode_wav(pcm[r], _SYNTH_SR) for r in range(len(ids))],
                pa.binary(),
            ),
            "fmt": pa.array(["wav"] * len(ids), pa.string()),
        }
    )


def audio_frame_features(
    sf_dir: str, frame_len: int = 1024, hop: int = 512
):
    """Driver query: synth one WAV clip per document → actor-pool frame
    features. Exercises encode → decode → window/FFT end-to-end; the pytest
    pins the physics (a clip's dominant-tone frequency bounds its centroid).
    Returns (media_id, frame_idx, energy_e6, centroid_mhz)."""
    from ..functions.frames import typed_empty

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    clips = docs.map_batches(synth_audio_batch, batch_format="pyarrow")
    out = audio_features_pipeline(clips, frame_len, hop).to_pandas()
    if out.empty:
        return typed_empty(
            media_id="object", frame_idx="int32",
            energy_e6="int64", centroid_mhz="int64",
        )
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
