"""Pair generation + verification (SURVEY.md §2.4 B2, §2.6 F1-F6).

Two stages with a vectorized dedup between them so every unique pair is
verified EXACTLY once:

1. ``emit_pairs`` — runs inside ``groupby("pkey").map_groups``, one call per
   coarse partition: re-groups rows by full ``band_key`` (numpy argsort),
   maps duplicate doc occurrences to one representative per ``image_id``,
   applies the SHARED candidate-pair policy
   (``oracle.candidate_pairs_from_buckets``: all-pairs for normal buckets,
   signature-digest refinement + star/chain for hot buckets — the explicit
   skew handling), and emits *unverified* pair rows carrying both payloads.
2. pair dedup — ``groupby(id_a, id_b).aggregate(Min(...))``: duplicate rows
   are byte-identical, so Min reproduces the row; vectorized, no per-group
   Python (SURVEY.md §2.5 A5).
3. ``VerifyPairs`` — a ``map_batches`` stage applying the SHARED kernel
   (``oracle.verify_pair``: exact/substring/near tiers, adaptive thresholds,
   acronym boost, pHash Hamming, α-fusion) once per unique pair, with
   per-batch field-parse caching keyed by image_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import text as tx
from ..oracle import candidate_pairs_from_buckets, verify_pair

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


def emit_pairs(group: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """One coarse partition of exploded candidate rows in → unverified,
    within-partition-unique pair rows out."""
    n = group.num_rows
    if n < 2:
        return PAIR_SCHEMA.empty_table()

    ids = group["image_id"].to_pylist()
    band = group["band_key"].to_numpy(zero_copy_only=False)

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

    pairs, _stats = candidate_pairs_from_buckets(
        buckets, digests, cfg.max_bucket, cfg.max_refined, ids
    )
    if not pairs:
        return PAIR_SCHEMA.empty_table()

    captions = group["caption_norm"].to_pylist()
    phashes = group["phash"].to_pylist()
    id_a, id_b, cap_a, cap_b, ph_a, ph_b = [], [], [], [], [], []
    for i, j in pairs:
        if ids[i] > ids[j]:
            i, j = j, i
        id_a.append(ids[i])
        id_b.append(ids[j])
        cap_a.append(captions[i])
        cap_b.append(captions[j])
        ph_a.append(phashes[i])
        ph_b.append(phashes[j])
    return pa.table(
        {
            "id_a": pa.array(id_a, pa.string()),
            "id_b": pa.array(id_b, pa.string()),
            "cap_a": pa.array(cap_a, pa.string()),
            "cap_b": pa.array(cap_b, pa.string()),
            "ph_a": pa.array(ph_a, pa.int64()),
            "ph_b": pa.array(ph_b, pa.int64()),
        },
        schema=PAIR_SCHEMA,
    )


class VerifyPairs:
    """map_batches kernel: one verification per (unique) pair row."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        id_a = batch["id_a"].to_pylist()
        id_b = batch["id_b"].to_pylist()
        cap_a = batch["cap_a"].to_pylist()
        cap_b = batch["cap_b"].to_pylist()
        ph_a = batch["ph_a"].to_pylist()
        ph_b = batch["ph_b"].to_pylist()

        fields: dict[str, dict[str, str]] = {}

        def _fields(iid: str, cap: str) -> dict[str, str]:
            f = fields.get(iid)
            if f is None:
                f = fields[iid] = tx.parse_fields(cap)
            return f

        o_a, o_b, scores, avgs, tiers, passes = [], [], [], [], [], []
        for a, b, ca, cb, pa_, pb_ in zip(id_a, id_b, cap_a, cap_b, ph_a, ph_b):
            res = verify_pair(
                ca, cb, pa_, pb_, cfg, _fields(a, ca), _fields(b, cb)
            )
            if res is None:
                continue
            score, avg, n_common, tier, passed = res
            if not (passed or (cfg.filter_literals and n_common < 3)):
                continue
            o_a.append(a)
            o_b.append(b)
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
