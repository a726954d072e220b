"""Multimodal column processing: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Media are opaque ``binary`` columns with typed metadata (fmt, w, h) — the
input_hint's model. The Ray-side plumbing (schemas, small batch sizes for
wide rows, actor signatures, output layout) is real and tested; decoders for
formats whose libraries are absent in this container (libjpeg, ffmpeg…) are
STUBBED behind ``UnsupportedFormatError`` (NotImplementedError) — swap the
codec registry for real decoders on a production image.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..functions.codecs import (
    UnsupportedFormatError,
    decode_image,
    encode_png,
)
from ..functions.hashing import dct_matrix, resize_gray


class ImageDecodeStats:
    """Actor-pool stage: decode each image, emit shape/brightness features.

    Run with ``batch_size=cfg.image_batch_size`` (small — rows are wide) and
    ``concurrency=(1, N)``. Undecodable formats yield ``ok=False`` rows
    rather than failing the batch (null-tolerant, B5 semantics)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ok, hs, ws, chans, means = [], [], [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                ok.append(False)
                hs.append(0); ws.append(0); chans.append(0); means.append(0.0)
                continue
            ok.append(True)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            chans.append(1 if px.ndim == 2 else px.shape[2])
            means.append(float(px.mean()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "mean_brightness": pa.array(means, pa.float64()),
            }
        )


class ImageResize:
    """Actor-pool stage: decode → box-filter resize → re-encode PNG.

    Output rows stay binary-typed (``bytes_out``) so downstream stages and
    sinks treat resized media exactly like source media."""

    def __init__(self, out_size: int = 32):
        self.out_size = out_size

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        out_blobs, ok = [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                out_blobs.append(b"")
                ok.append(False)
                continue
            small = np.clip(
                resize_gray(px, self.out_size), 0, 255
            ).astype(np.uint8)
            out_blobs.append(encode_png(small))
            ok.append(True)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "fmt": pa.array(["png"] * len(ids), pa.string()),
                "bytes_out": pa.array(out_blobs, pa.binary()),
            }
        )


class ImageEmbed:
    """Actor-pool stage: tiny deterministic image "embedding" — the DCT
    low-frequency block as a float vector (a stand-in for a real vision
    model; the actor shape — weights loaded once in __init__, batched
    inference in __call__ — is exactly what a model-backed stage uses)."""

    def __init__(self, dim: int = 64):
        self.dct = dct_matrix(32)  # the "model", loaded once per actor
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        embs, ok = [], []
        side = int(np.sqrt(self.dim))
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                embs.append([0.0] * self.dim)
                ok.append(False)
                continue
            g = resize_gray(px, 32)
            d = (self.dct @ g @ self.dct.T)[:side, :side].ravel()
            n = np.linalg.norm(d)
            embs.append((d / n if n > 0 else d).astype(np.float32).tolist())
            ok.append(True)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
            }
        )


class VideoFrameSample:
    """STUB actor stage for video frame sampling: the batch plumbing
    (binary in, list-of-binary frames out, frame indices by fps) is real;
    the codec call raises ``UnsupportedFormatError`` — no ffmpeg in this
    container."""

    def __init__(self, every_n_frames: int = 30):
        self.every_n = every_n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        raise UnsupportedFormatError(
            "video decoding requires ffmpeg, absent in this environment; "
            "the stage contract is (media_id, bytes, fmt) -> "
            "(media_id, frame_idx, frame_png)"
        )


def image_stats_pipeline(
    corpus_path: str, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    cfg = cfg or PipelineConfig()
    ds = ray.data.read_parquet(
        corpus_path, columns=["image_id", "bytes", "fmt"]
    )
    return ds.map_batches(
        ImageDecodeStats,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size,
        concurrency=(1, 4),
    )
