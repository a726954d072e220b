"""Signature stage: the stateful actor pool (SURVEY.md §2.3 T1/T2).

``Signer`` is a callable class passed to
``map_batches(Signer, fn_constructor_kwargs=..., concurrency=N,
batch_format="pyarrow")`` — MinHash permutation coefficients, the DCT basis
matrix and compiled regexes are built ONCE per actor in ``__init__`` (the
role model-loading plays in the reference, ``Run_Sembedding.py:18``), and
each ``__call__`` handles one zero-copy Arrow batch.

Output schema (the ``signatures`` table, SURVEY.md §1.2):
``image_id:string, caption_norm:string, phash:int64, digest:int64,
n_fields:int32, keys:list<int64>`` — ``keys`` is the full candidate-key set
(MinHash bands + pHash/SimHash chunks + field blocks), ``digest`` folds the
whole MinHash signature (hot-bucket refinement key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import text as tx
from ..functions.codecs import decode_image, encode_fake_jpeg, psnr
from ..functions.hashing import (
    all_candidate_keys,
    block_keys,
    dct_matrix,
    minhash_from_stream,
    minhash_params,
    phash64,
    shingle_hash_stream,
    signature_digest,
    simhash_from_stream,
)

SIGNATURE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("caption_norm", pa.string()),
        ("phash", pa.int64()),
        ("digest", pa.int64()),
        ("n_fields", pa.int32()),
        ("keys", pa.list_(pa.int64())),
    ]
)


class Signer:
    """Per-batch signature computation; all per-actor state in __init__."""

    def __init__(self, cfg: PipelineConfig | None = None, **cfg_kwargs):
        self.cfg = cfg or PipelineConfig(**cfg_kwargs)
        c = self.cfg
        self.a, self.b = minhash_params(c.num_perm, c.seed)
        self.dct = dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.cfg
        captions = batch["caption"].to_pylist()
        norm = [tx.normalize_caption(s or "") for s in captions]
        fields = [tx.parse_fields(s) for s in norm]
        # shingle field VALUES only (see oracle.oracle_match) — labels are
        # template noise; free-text captions fall through unchanged
        sig_texts = (
            [" ".join(f.values()) for f in fields]
            if c.shingle_values_only
            else norm
        )
        stream, offsets = shingle_hash_stream(sig_texts, c.shingle_k, c.seed)
        sigs = minhash_from_stream(stream, offsets, self.a, self.b)
        digests = signature_digest(sigs).view(np.int64)
        simhash = simhash_from_stream(stream, offsets)

        if "bytes" in batch.column_names:
            # fidelity path: recompute pHash from decoded pixels (per-row
            # invariant — input_hint) rather than trusting the column
            phashes = self._decode_phashes(batch)
        else:
            phashes = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        blocks = block_keys(fields, c.block_fields, c.seed)
        bandk = all_candidate_keys(
            sigs,
            phashes.view(np.uint64),
            simhash,
            c.bands,
            c.rows,
            c.phash_bands,
            c.simhash_bands,
            c.seed,
        ).view(np.int64)

        n = len(norm)
        n_band = bandk.shape[1]
        n_block = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_band + n_block, out=offsets[1:])
        flat = np.empty(int(offsets[-1]), dtype=np.int64)
        for i in range(n):
            o = offsets[i]
            flat[o : o + n_band] = bandk[i]
            if n_block[i]:
                flat[o + n_band : o + n_band + n_block[i]] = np.array(
                    blocks[i], dtype=np.uint64
                ).view(np.int64)
        keys = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))

        return pa.table(
            {
                "image_id": batch["image_id"],
                "caption_norm": pa.array(norm, pa.string()),
                "phash": pa.array(phashes, pa.int64()),
                "digest": pa.array(digests, pa.int64()),
                "n_fields": pa.array(
                    [len(f) for f in fields], pa.int32()
                ),
                "keys": keys,
            },
            schema=SIGNATURE_SCHEMA,
        )

    def _decode_phashes(self, batch: pa.Table) -> np.ndarray:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = np.empty(len(blobs), dtype=np.int64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            out[i] = phash64(decode_image(blob, fmt), self.dct)
        return out


class MediaValidator:
    """Optional fidelity stage (per-row invariant, input_hint): decode each
    image, recompute pHash, and report PSNR vs a re-encode round-trip.

    Emits ``image_id, phash_match:bool, psnr_db:float`` — run as an actor
    pool over small batches (``cfg.image_batch_size``) because rows are wide.
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.dct = dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        stored = batch["phash"].to_pylist()
        match, psnrs = [], []
        for blob, fmt, ph in zip(blobs, fmts, stored):
            pixels = decode_image(blob, fmt)
            match.append(phash64(pixels, self.dct) == ph)
            if fmt == "jpeg":
                rt = decode_image(encode_fake_jpeg(pixels, 85), "jpeg")
                psnrs.append(psnr(pixels, rt))
            else:
                psnrs.append(float("inf"))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "phash_match": pa.array(match, pa.bool_()),
                "psnr_db": pa.array(psnrs, pa.float64()),
            }
        )
