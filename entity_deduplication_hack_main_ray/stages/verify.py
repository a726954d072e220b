"""Per-partition pair generation + verification kernel (SURVEY.md §2.4 B2,
§2.6 F1-F6).

Runs inside ``groupby("pkey").map_groups`` — one call per coarse partition.
Within the partition the kernel:

1. re-groups rows by full ``band_key`` (numpy argsort, vectorized),
2. maps duplicate doc occurrences to one representative row per ``image_id``,
3. applies the SHARED candidate-pair policy
   (``oracle.candidate_pairs_from_buckets``: all-pairs for normal buckets,
   signature-digest refinement + star/chain pairs for hot buckets — the
   explicit skew handling),
4. verifies each unique pair once per partition with the SHARED kernel
   (``oracle.verify_pair``: exact/substring/near tiers, adaptive thresholds,
   acronym boost, pHash Hamming, α-fusion), amortizing per-doc field parses.

A pair that shares keys in several partitions is verified once per partition
— deterministic duplicates that the downstream edge-dedup
(``groupby(id_a,id_b).first``, SURVEY.md §2.5 A5) removes; the verdict is a
pure function of the two rows, so duplicates are byte-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import text as tx
from ..oracle import candidate_pairs_from_buckets, verify_pair

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


def _empty_edges() -> pa.Table:
    return EDGE_SCHEMA.empty_table()


def emit_and_verify(group: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """map_groups kernel: one coarse partition of exploded candidate rows in,
    verified edge rows out."""
    n = group.num_rows
    if n < 2:
        return _empty_edges()

    ids = group["image_id"].to_pylist()
    band = group["band_key"].to_numpy(zero_copy_only=False)

    # one representative row per doc in this partition
    rep: dict[str, int] = {}
    for i, iid in enumerate(ids):
        rep.setdefault(iid, i)

    # bucket → representative member indices (dedup within bucket)
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
        return _empty_edges()

    pairs, _stats = candidate_pairs_from_buckets(
        buckets, digests, cfg.max_bucket, cfg.max_refined, ids
    )
    if not pairs:
        return _empty_edges()

    captions = group["caption_norm"].to_pylist()
    phashes = group["phash"].to_pylist()
    fields: dict[int, dict[str, str]] = {}

    def _fields(i: int) -> dict[str, str]:
        f = fields.get(i)
        if f is None:
            f = fields[i] = tx.parse_fields(captions[i])
        return f

    id_a, id_b, scores, avgs, tiers, passes = [], [], [], [], [], []
    for i, j in pairs:
        res = verify_pair(
            captions[i], captions[j], phashes[i], phashes[j], cfg,
            _fields(i), _fields(j),
        )
        if res is None:
            continue
        score, avg, n_common, tier, passed = res
        if not (passed or (cfg.filter_literals and n_common < 3)):
            continue
        a, b = sorted((ids[i], ids[j]))
        id_a.append(a)
        id_b.append(b)
        scores.append(score)
        avgs.append(avg)
        tiers.append(tier)
        passes.append(passed)

    return pa.table(
        {
            "id_a": pa.array(id_a, pa.string()),
            "id_b": pa.array(id_b, pa.string()),
            "score": pa.array(scores, pa.float32()),
            "avg_field_sim": pa.array(avgs, pa.float32()),
            "tier": pa.array(tiers, pa.string()),
            "pass": pa.array(passes, pa.bool_()),
        },
        schema=EDGE_SCHEMA,
    )
