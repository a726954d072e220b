"""Pair generation + verification (SURVEY.md §2.4 B2, §2.6 F1-F6).

Single-shuffle design — every unique candidate pair is generated AND
verified exactly once, with no pair-dedup exchange:

1. ``emit_pairs`` — runs inside ``groupby("pkey").map_groups``, one call per
   coarse partition: re-groups rows by full ``band_key`` (numpy argsort),
   maps duplicate doc occurrences to one representative per ``image_id``,
   applies the SHARED candidate-pair policy
   (``oracle.candidate_pairs_from_buckets``: all-pairs for normal buckets,
   signature-digest refinement + star/chain for hot buckets — the explicit
   skew handling) WITH min-shared-key pair ownership
   (``oracle.owned_pair_mask``): a pair is kept only in the bucket whose key
   equals the minimum key shared by both docs, so across every bucket and
   every shuffle partition the pair survives exactly once. This is what
   deleted the round-1 pair-dedup sort exchange (measured ~17 s of the 190k
   pipeline) — the ownership decision is local because each exploded row
   carries its doc's full key list.
2. ``verify_batch`` — a task-pool ``map_batches`` function applying the
   SHARED kernel (``oracle.verify_pair``: exact/substring/near tiers,
   adaptive thresholds, acronym boost, pHash Hamming, α-fusion) once per
   pair, with a per-worker-process parse cache keyed by caption text.
   Measured against the round-1 design (actor pool + batch-vectorized
   histogram fast-reject): the plain per-pair kernel is ~1.6× faster per
   pair (the 128-bin histogram machinery cost more than the exact kernel it
   guarded) and the task pool reuses warm Ray workers instead of paying
   actor spawn + import per pipeline run (measured 3.1× on the verify
   stage at 16 CPUs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import text as tx
from ..oracle import (
    _KEY_PAD,
    candidate_pairs_from_buckets,
    verify_components,
    verify_pair,
)

PAIR_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("cap_a", pa.string()),
        ("cap_b", pa.string()),
        ("ph_a", pa.int64()),
        ("ph_b", pa.int64()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("score", pa.float32()),
        ("avg_field_sim", pa.float32()),
        ("tier", pa.string()),
        ("pass", pa.bool_()),
    ]
)

# α-independent per-pair components (the sweep harness's working set)
SWEEP_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("avg_field_sim", pa.float64()),
        ("img_sim", pa.float64()),
        ("n_common", pa.int32()),
        ("is_substring", pa.bool_()),
        ("is_exactish", pa.bool_()),
    ]
)


def verify_components_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Sweep-mode verify: emit every candidate pair's α-independent
    components (``oracle.verify_components``) instead of a pass decision —
    one pipeline run then serves every α of the sweep grid."""
    if batch.num_rows == 0:
        return SWEEP_SCHEMA.empty_table()
    id_a = batch["id_a"].to_pylist()
    id_b = batch["id_b"].to_pylist()
    cap_a = batch["cap_a"].to_pylist()
    cap_b = batch["cap_b"].to_pylist()
    ph_a = batch["ph_a"].to_pylist()
    ph_b = batch["ph_b"].to_pylist()
    rows = {k: [] for k in SWEEP_SCHEMA.names}
    for i in range(batch.num_rows):
        res = verify_components(
            cap_a[i], cap_b[i], ph_a[i], ph_b[i], cfg,
            _fields_cached(cap_a[i]), _fields_cached(cap_b[i]),
        )
        if res is None:
            continue
        avg, img, nc, is_sub, exactish = res
        rows["id_a"].append(id_a[i])
        rows["id_b"].append(id_b[i])
        rows["avg_field_sim"].append(avg)
        rows["img_sim"].append(img)
        rows["n_common"].append(nc)
        rows["is_substring"].append(is_sub)
        rows["is_exactish"].append(exactish)
    return pa.table(rows, schema=SWEEP_SCHEMA)


def _key_matrix(group: pa.Table) -> np.ndarray:
    """``keys`` list column → (n_rows, Kmax) uint64 matrix padded with
    ``_KEY_PAD`` (vectorized: one flatten + one masked scatter)."""
    kcol = group["keys"]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    values = kcol.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    lens = np.asarray(
        pa.compute.list_value_length(kcol), dtype=np.int64
    )
    kmax = int(lens.max()) if len(lens) else 0
    mat = np.full((len(lens), kmax), _KEY_PAD, dtype=np.uint64)
    mask = np.arange(kmax)[None, :] < lens[:, None]
    mat[mask] = values
    return mat


def emit_pairs(group: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """One coarse partition of exploded candidate rows in → GLOBALLY unique
    (min-shared-key-owned) pair rows out, payloads carried."""
    n = group.num_rows
    if n < 2:
        return PAIR_SCHEMA.empty_table()

    ids = group["image_id"].to_pylist()
    band = group["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)

    rep: dict[str, int] = {}
    for i, iid in enumerate(ids):
        rep.setdefault(iid, i)

    order = np.argsort(band, kind="stable")
    sorted_band = band[order]
    boundaries = np.nonzero(np.diff(sorted_band))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n]])
    digests = group["digest"].to_numpy(zero_copy_only=False)
    buckets: dict[int, list[int]] = {}
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        members = sorted({rep[ids[j]] for j in order[s:e]})
        if len(members) >= 2:
            buckets[int(sorted_band[s])] = members

    if not buckets:
        return PAIR_SCHEMA.empty_table()

    key_rows = _key_matrix(group)
    pairs, _stats = candidate_pairs_from_buckets(
        buckets, digests, cfg.max_bucket, cfg.max_refined, ids, key_rows
    )
    if not pairs:
        return PAIR_SCHEMA.empty_table()

    if "is_new" in group.column_names:
        # incremental mode: both-old pairs were verified in the base run —
        # their connectivity is already encoded in the old clusters; only
        # pairs touching a NEW doc need verification. The filter runs AFTER
        # ownership so the kept pair set is exactly "full-run pairs with
        # ≥ 1 new member".
        new_flag = group["is_new"].to_numpy(zero_copy_only=False)
        pairs = {
            (i, j) for (i, j) in pairs if new_flag[i] or new_flag[j]
        }
        if not pairs:
            return PAIR_SCHEMA.empty_table()

    # vectorized payload gather: canonicalize pair order by id with Arrow
    # string compare + if_else, then take() the payload columns — no
    # Python-per-pair loop (SURVEY.md "stay vectorized")
    parr = np.array(sorted(pairs), dtype=np.int64)
    pi = pa.array(parr[:, 0])
    pj = pa.array(parr[:, 1])
    id_col = group["image_id"].combine_chunks() if isinstance(
        group["image_id"], pa.ChunkedArray) else group["image_id"]
    ida = id_col.take(pi)
    idb = id_col.take(pj)
    swap = pa.compute.greater(ida, idb)
    first = pa.compute.if_else(swap, pj, pi)
    second = pa.compute.if_else(swap, pi, pj)
    cols = {}
    for name, src in (
        ("id_a", "image_id"), ("id_b", "image_id"),
        ("cap_a", "caption_norm"), ("cap_b", "caption_norm"),
        ("ph_a", "phash"), ("ph_b", "phash"),
    ):
        c = group[src]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols[name] = c.take(first if name.endswith("_a") else second)
    return pa.table(cols, schema=PAIR_SCHEMA)


# Per-worker-process parse cache, keyed by the caption TEXT (parse_fields is
# a pure function of the caption, so entries can never go stale across
# pipelines/configs sharing the worker — unlike an id-keyed cache).
_PARSE_CACHE: dict[str, dict[str, str]] = {}


def _fields_cached(caption: str) -> dict[str, str]:
    f = _PARSE_CACHE.get(caption)
    if f is None:
        if len(_PARSE_CACHE) > 1_000_000:  # bound worker memory
            _PARSE_CACHE.clear()
        f = _PARSE_CACHE[caption] = tx.parse_fields(caption)
    return f


def verify_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """map_batches task kernel: one shared-kernel verification per pair row.

    ``oracle.verify_pair`` starts with its own decision-lossless
    upper-bound prefilter (rejects ~87% of candidate pairs without running
    SequenceMatcher), so no extra batch-level machinery is needed here.
    """
    n_pairs = batch.num_rows
    if n_pairs == 0:
        return EDGE_SCHEMA.empty_table()
    id_a = batch["id_a"].to_pylist()
    id_b = batch["id_b"].to_pylist()
    cap_a = batch["cap_a"].to_pylist()
    cap_b = batch["cap_b"].to_pylist()
    ph_a = batch["ph_a"].to_pylist()
    ph_b = batch["ph_b"].to_pylist()
    fl = cfg.filter_literals

    o_a, o_b, scores, avgs, tiers, passes = [], [], [], [], [], []
    for i in range(n_pairs):
        res = verify_pair(
            cap_a[i], cap_b[i], ph_a[i], ph_b[i], cfg,
            _fields_cached(cap_a[i]), _fields_cached(cap_b[i]),
        )
        if res is None:
            continue
        score, avg, nc, tier, passed = res
        if not (passed or (fl and nc < 3)):
            continue
        o_a.append(id_a[i])
        o_b.append(id_b[i])
        scores.append(score)
        avgs.append(avg)
        tiers.append(tier)
        passes.append(passed)

    return pa.table(
        {
            "id_a": pa.array(o_a, pa.string()),
            "id_b": pa.array(o_b, pa.string()),
            "score": pa.array(scores, pa.float32()),
            "avg_field_sim": pa.array(avgs, pa.float32()),
            "tier": pa.array(tiers, pa.string()),
            "pass": pa.array(passes, pa.bool_()),
        },
        schema=EDGE_SCHEMA,
    )
