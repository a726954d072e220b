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

from ..config import PipelineConfig, media_pool_size
from ..functions.codecs import (
    UnsupportedFormatError,
    decode_image,
    decode_video,
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
    """Actor-pool stage: video frame sampling. The batch plumbing — binary
    container in, one row per sampled frame out (media_id, frame_idx,
    frame_png), stride in frames — is REAL and tested against the
    deterministic ``fvid`` FakeVideo container (see ``functions/codecs.py``);
    real formats (mp4/webm) hit the ``UnsupportedFormatError`` stub gate
    because this container has no ffmpeg — swap ``decode_video``'s registry
    on a production image, the stage is unchanged.

    Output frames are re-encoded PNG so downstream image stages (decode /
    resize / embed / pHash) consume them exactly like source images.
    """

    def __init__(self, every_n_frames: int = 30):
        self.every_n = every_n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        o_id, o_idx, o_png, o_ok = [], [], [], []
        for mid, blob, fmt in zip(ids, blobs, fmts):
            try:
                frames, _fps = decode_video(blob, fmt)
            except (UnsupportedFormatError, ValueError):
                o_id.append(mid)
                o_idx.append(-1)
                o_png.append(b"")
                o_ok.append(False)  # null-tolerant: bad media flows, B5
                continue
            for idx in range(0, len(frames), self.every_n):
                o_id.append(mid)
                o_idx.append(idx)
                o_png.append(encode_png(frames[idx]))
                o_ok.append(True)
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "frame_png": pa.array(o_png, pa.binary()),
                "ok": pa.array(o_ok, pa.bool_()),
            }
        )


def video_frame_pipeline(
    videos: ray.data.Dataset,
    every_n_frames: int = 30,
    cfg: PipelineConfig | None = None,
    keep_failed: bool = False,
) -> ray.data.Dataset:
    """(media_id, bytes, fmt) videos → one row per sampled frame. Small
    batches (rows are wide) on an actor pool; frames re-encoded PNG.

    Undecodable media become ``ok=False`` sentinel rows (frame_idx=-1,
    empty ``frame_png``) INSIDE the stage; by default they are filtered
    here so downstream image stages never see an empty payload — pass
    ``keep_failed=True`` to audit decode failures instead."""
    cfg = cfg or PipelineConfig()
    frames = videos.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"every_n_frames": every_n_frames},
        batch_format="pyarrow",
        batch_size=max(8, cfg.image_batch_size // 8),
        concurrency=media_pool_size(),
    )
    if keep_failed:
        return frames
    return frames.map_batches(
        lambda t: t.filter(t["ok"].combine_chunks()
                           if isinstance(t["ok"], pa.ChunkedArray)
                           else t["ok"]),
        batch_format="pyarrow",
    )


_SYNTH_FRAMES = 8
_SYNTH_SIDE = 16


def synth_video_batch(t: pa.Table) -> pa.Table:
    """documents(doc_id) → (media_id, bytes, fmt) FakeVideo clips: 8 gray
    16×16 frames whose brightness ramps at a per-doc rate (pure function of
    doc_id — batch-layout independent). Vectorized: one (rows × frames ×
    h × w) tensor per batch."""
    from ..functions.codecs import encode_fake_video

    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    base = (ids % 97).astype(np.uint8)  # per-doc base brightness
    step = (1 + ids % 5).astype(np.int64)  # per-doc ramp rate
    f = np.arange(_SYNTH_FRAMES, dtype=np.int64)
    ramp = np.clip(
        base[:, None] + step[:, None] * f[None, :], 0, 255
    ).astype(np.uint8)
    yy = np.arange(_SYNTH_SIDE, dtype=np.int64)
    # frame pixels: ramp + small row gradient (so frames aren't constant)
    frames = np.clip(
        ramp[:, :, None, None] + yy[None, None, :, None], 0, 255
    ).astype(np.uint8)
    frames = np.broadcast_to(
        frames, (len(ids), _SYNTH_FRAMES, _SYNTH_SIDE, _SYNTH_SIDE)
    )
    return pa.table(
        {
            "media_id": pa.array([f"vid-{i}" for i in ids], pa.string()),
            "bytes": pa.array(
                [encode_fake_video(frames[r], fps=4) for r in range(len(ids))],
                pa.binary(),
            ),
            "fmt": pa.array(["fvid"] * len(ids), pa.string()),
        }
    )


def video_frame_stats(sf_dir: str, every_n_frames: int = 2):
    """Driver query: synth one FakeVideo clip per document → actor-pool
    frame sampling (PNG re-encode) → per-frame decode stats. Exercises the
    full video chain (encode_fake_video → VideoFrameSample → decode_png)
    under Ray; the pytest pins the per-doc brightness ramp. Returns
    (media_id, frame_idx, mean_e6)."""
    from ..functions.codecs import decode_png
    from ..functions.frames import typed_empty

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    clips = docs.map_batches(synth_video_batch, batch_format="pyarrow")
    frames = video_frame_pipeline(clips, every_n_frames=every_n_frames)

    def frame_mean(t: pa.Table) -> pa.Table:
        means = [
            int(np.floor(decode_png(b).mean() * 1e6 + 0.5))
            for b in t["frame_png"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "frame_idx": t["frame_idx"],
                "mean_e6": pa.array(means, pa.int64()),
            }
        )

    out = frames.map_batches(frame_mean, batch_format="pyarrow").to_pandas()
    if out.empty:
        return typed_empty(
            media_id="object", frame_idx="int32", mean_e6="int64"
        )
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


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
        concurrency=media_pool_size(),
    )
