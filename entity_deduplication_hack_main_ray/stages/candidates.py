"""Candidate generation: band-explode + the ONE wide shuffle (SURVEY.md §2.4 B1).

``explode_keys`` turns each signature row into one row per candidate key —
pure Arrow ``ListArray`` flatten + take, zero Python per-row work. Each
exploded row carries the verification payload (``caption_norm``, ``phash``,
``digest``) denormalized through the shuffle so NO join is needed afterwards
(SURVEY.md §2.4 B3).

The shuffle key is ``pkey = band_key mod P`` (coarse partitions), not the raw
band key: grouping by the raw key would create millions of tiny groups and
per-group Python overhead; grouping by ``pkey`` gives P balanced groups whose
kernel (``stages/verify.py``) re-groups by full band key vectorized. Hot
*buckets* (not partitions) are handled inside the kernel by the shared
signature-refinement policy (``oracle.candidate_pairs_from_buckets``) — the
explicit skew/salting design the north rule requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_keys(batch: pa.Table, num_partitions: int) -> pa.Table:
    """(signatures batch) → candidate rows: one row per (key, doc).

    Each exploded row also carries the doc's FULL key list (``keys``): the
    pair-emit kernel needs it for min-shared-key pair ownership — the rule
    that lets every pair be emitted exactly once across all partitions with
    no pair-dedup exchange afterwards (see ``oracle.owned_pair_mask``).
    """
    keys = batch["keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    flat = keys.flatten()
    parent = pc.list_parent_indices(keys)
    carry = ["image_id", "caption_norm", "phash", "digest", "keys"]
    # incremental mode: the old/new tag rides along so the pair-emit kernel
    # can drop both-old pairs (their connectivity is already in the old
    # cluster assignment — see pipelines/incremental.py)
    if "is_new" in batch.column_names:
        carry.append("is_new")
    taken = batch.select(carry).take(parent)
    band_key = flat
    flat_np = flat.to_numpy(zero_copy_only=False).view(np.uint64)
    pkey = pa.array(
        (flat_np % np.uint64(num_partitions)).astype(np.int64), pa.int64()
    )
    cols = {"pkey": pkey, "band_key": band_key}
    for c in carry:
        cols[c] = taken[c]
    return pa.table(cols)
