"""Single-process oracle: the reference-semantics matcher.

Implements the full semantic chain — normalize → shingle → MinHash → LSH
bands → candidate pairs (identical hot-bucket refinement) → verification
(reference F1-F6 kernels) → union-find → clusters — as plain numpy/Python on
one machine. The Ray engine's acceptance criterion (BASELINE.md) is dup-pair
recall ≥ 0.99 against THIS matcher's cluster assignments at the same
``PipelineConfig``; because both share the seeded hash families and the
verification kernels in ``functions/``, the expected value is exactly 1.0.

This plays the role the reference's committed ``matches/*.json`` corpus plays
for the reference (SURVEY.md §5): an executable ground truth.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from .config import PipelineConfig
from .functions import text as tx
from .functions.hashing import (
    all_candidate_keys,
    block_keys,
    minhash_from_stream,
    minhash_params,
    shingle_hash_stream,
    signature_digest,
    simhash_from_stream,
)
from .state.unionfind import UnionFind


_KEY_PAD = np.uint64(0xFFFFFFFFFFFFFFFF)


def owned_pair_mask(
    arr_i: np.ndarray,
    arr_j: np.ndarray,
    arr_k: np.ndarray,
    key_rows: np.ndarray,
) -> np.ndarray:
    """Vectorized min-shared-key ownership test.

    ``key_rows`` is an (n_members, Kmax) uint64 matrix of each member's FULL
    candidate-key set padded with ``_KEY_PAD``; ``arr_k[p]`` is the (uint64)
    key of the bucket that generated pair ``p = (arr_i[p], arr_j[p])``. The
    pair is OWNED by the bucket whose key equals the minimum key shared by
    both members — so across all buckets (and all shuffle partitions) each
    pair survives exactly once, which is what lets the engine skip the
    pair-dedup exchange entirely. The pad can never win the min because the
    generating bucket key itself is always shared.
    """
    out = np.empty(len(arr_i), dtype=bool)
    CH = 8192  # bound the (chunk, K, K) broadcast to a few MB
    for s in range(0, len(arr_i), CH):
        Ka = key_rows[arr_i[s : s + CH]]  # (c, K)
        Kb = key_rows[arr_j[s : s + CH]]
        eq = Ka[:, :, None] == Kb[:, None, :]
        shared = np.where(eq, np.broadcast_to(Ka[:, :, None], eq.shape), _KEY_PAD)
        out[s : s + CH] = shared.min(axis=(1, 2)) == arr_k[s : s + CH]
    return out


def candidate_pairs_from_buckets(
    buckets: dict[int, list[int]],
    digests: np.ndarray,
    max_bucket: int,
    max_refined: int,
    sort_key: list[str],
    key_rows: np.ndarray | None = None,
) -> tuple[set[tuple[int, int]], dict[str, int]]:
    """Shared candidate-pair policy (oracle AND engine call this).

    ``sort_key[i]`` is the stable document id for member index ``i`` — ALL
    ordering decisions use it, never raw indices, so the emitted id-level
    pair set is independent of row order within a partition/bucket (the
    determinism requirement of SURVEY.md §7).

    Normal bucket (≤ max_bucket): all pairs.
    Hot bucket: refine by full-signature digest —
      * identical-digest members are near-certain duplicates → star pairs to
        the subgroup minimum-id member (O(n), connectivity-preserving);
      * one representative per subgroup; all-pairs among the first
        ``max_refined`` id-sorted representatives, the remainder chained to
        the last kept representative (connectivity preserved, quadratic cost
        bounded; drops are counted, not silent).

    When ``key_rows`` is given (an (n, Kmax) uint64 padded matrix of every
    member's full key set — bucket keys must then be uint64-valued ints),
    each generated pair is kept only in the bucket owning it per
    ``owned_pair_mask``: the pair set becomes globally duplicate-free, so
    the engine needs NO pair-dedup shuffle and verifies each pair exactly
    once. A pair whose owning bucket is hot and digest-refined away is
    dropped everywhere — the oracle applies the identical rule, so engine ≡
    oracle by construction (the e2e equality tests re-assert it).
    """
    stats = {"buckets": 0, "hot_buckets": 0, "capped_reps": 0}
    raw_i: list[int] = []
    raw_j: list[int] = []
    raw_k: list[int] = []

    def emit(bkey: int, i: int, j: int) -> None:
        raw_i.append(i)
        raw_j.append(j)
        raw_k.append(bkey)

    for bkey, members in buckets.items():
        if len(members) < 2:
            continue
        stats["buckets"] += 1
        ms = sorted(members, key=lambda m: sort_key[m])
        if len(ms) <= max_bucket:
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    emit(bkey, ms[i], ms[j])
            continue
        stats["hot_buckets"] += 1
        sub: dict[int, list[int]] = defaultdict(list)
        for m in ms:  # ms already id-sorted → subgroups id-sorted
            sub[int(digests[m])].append(m)
        reps = []
        for g in sub.values():
            reps.append(g[0])
            for other in g[1:]:
                emit(bkey, g[0], other)
        reps.sort(key=lambda m: sort_key[m])
        kept, rest = reps[:max_refined], reps[max_refined:]
        stats["capped_reps"] += len(rest)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                emit(bkey, kept[i], kept[j])
        anchor = kept[-1] if kept else None
        for r in rest:  # chain: keeps the bucket connected without N²
            if anchor is not None:
                emit(bkey, anchor, r)
            anchor = r

    if key_rows is None:
        pairs = set(zip(raw_i, raw_j))
        return pairs, stats
    if not raw_i:
        return set(), stats
    ai = np.array(raw_i, dtype=np.int64)
    aj = np.array(raw_j, dtype=np.int64)
    ak = np.array(raw_k, dtype=np.uint64)
    own = owned_pair_mask(ai, aj, ak, key_rows)
    pairs = set(zip(ai[own].tolist(), aj[own].tolist()))
    return pairs, stats


def verify_pair(
    cap_a: str,
    cap_b: str,
    ph_a: int,
    ph_b: int,
    cfg: PipelineConfig,
    fa: dict[str, str] | None = None,
    fb: dict[str, str] | None = None,
    ha: dict | None = None,
    hb: dict | None = None,
) -> tuple[float, float, int, str, bool] | None:
    """Reference-semantics pair verification (shared kernel).

    Returns (fused_score, avg_field_sim, n_common, tier, passed) — or ``None``
    when a decision-lossless prefilter (``ratio_upper_bound`` dominance)
    proves the pair can neither pass nor be kept, skipping the expensive
    Ratcliff–Obershelp pass entirely. Tiers follow reference F6
    (``output_utils.py:60-66``) with the engine's two extra structural tiers:
    ``exact`` (byte-equal caption AND equal pHash) and ``substring``
    (containment, per north_rule).
    """
    ham = ((ph_a ^ ph_b) & 0xFFFFFFFFFFFFFFFF).bit_count()
    img_sim = 1.0 - ham / 64.0
    if cap_a == cap_b and ham == 0:
        return 1.0, 1.0, 0, "exact", True
    if fa is None:
        fa = tx.parse_fields(cap_a)
    if fb is None:
        fb = tx.parse_fields(cap_b)
    if cap_a != cap_b:
        # fast reject: if even the similarity UPPER BOUND fails the adaptive
        # threshold and no structural tier (substring / low-evidence keep)
        # can rescue the pair, the outcome is provably "no edge"
        avg_ub, n_common_ub = tx.field_similarity_bound(
            fa, fb, cfg.acronym_boost, ha, hb
        )
        thr_ub = tx.adaptive_threshold(
            n_common_ub, cfg.adaptive_thresholds, cfg.adaptive_default
        )
        if (
            avg_ub < thr_ub
            and not (cfg.filter_literals and n_common_ub < 3)
            and not (img_sim >= 0.875 and tx.substring_contained(cap_a, cap_b))
        ):
            return None
    avg, n_common, all_exact = tx.field_similarity(fa, fb, cfg.acronym_boost)
    if cap_a == cap_b:
        avg, all_exact = 1.0, True
    is_sub = cap_a != cap_b and tx.substring_contained(cap_a, cap_b)
    score = cfg.alpha * avg + (1 - cfg.alpha) * img_sim
    thr = tx.adaptive_threshold(
        n_common, cfg.adaptive_thresholds, cfg.adaptive_default
    )
    passed = avg >= thr and score >= cfg.threshold
    if is_sub and not passed:
        # substring containment tier: structural evidence overrides the
        # field-similarity threshold when the image agrees closely
        passed = img_sim >= 0.875
    if all_exact and n_common > 0 and ham == 0:
        tier = "exact"
    elif is_sub and passed:
        tier = "substring"
    elif avg >= cfg.near_exact:
        tier = "near-exact"
    elif avg >= cfg.similar:
        tier = "similar"
    else:
        tier = "conflict"
    # reference F5 asymmetry: failing pairs are *kept in the output* only
    # when evidence is scarce (filter_literals=True keeps fails with
    # n_common < 3); they never join clusters
    return score, avg, n_common, tier, passed


def verify_components(
    cap_a: str,
    cap_b: str,
    ph_a: int,
    ph_b: int,
    cfg: PipelineConfig,
    fa: dict[str, str] | None = None,
    fb: dict[str, str] | None = None,
) -> tuple[float, float, int, bool, bool] | None:
    """α-INDEPENDENT verification components for the sweep harness
    (reference drivers grid α 0.0–0.95, ``Run_TransE.py:36-49``): returns
    (avg_field_sim, img_sim, n_common, is_substring, is_exactish) or None.

    The None-prefilter is the same decision-lossless bound as
    ``verify_pair`` and is itself α-independent (the binding pass gate
    ``avg ≥ adaptive_threshold`` does not involve α), so the non-None set
    is a superset of the pairs that can pass at ANY α — sweeping over it
    loses nothing. ``is_exactish`` marks the exact tier (byte-equal caption
    + pHash, or all-fields-exact + hamming 0) used by the FP-exclusion
    rule."""
    ham = ((ph_a ^ ph_b) & 0xFFFFFFFFFFFFFFFF).bit_count()
    img_sim = 1.0 - ham / 64.0
    if cap_a == cap_b and ham == 0:
        return 1.0, 1.0, 0, False, True
    if fa is None:
        fa = tx.parse_fields(cap_a)
    if fb is None:
        fb = tx.parse_fields(cap_b)
    if cap_a != cap_b:
        avg_ub, n_common_ub = tx.field_similarity_bound(
            fa, fb, cfg.acronym_boost
        )
        thr_ub = tx.adaptive_threshold(
            n_common_ub, cfg.adaptive_thresholds, cfg.adaptive_default
        )
        if (
            avg_ub < thr_ub
            and not (cfg.filter_literals and n_common_ub < 3)
            and not (img_sim >= 0.875 and tx.substring_contained(cap_a, cap_b))
        ):
            return None
    avg, n_common, all_exact = tx.field_similarity(fa, fb, cfg.acronym_boost)
    if cap_a == cap_b:
        avg, all_exact = 1.0, True
    is_sub = cap_a != cap_b and tx.substring_contained(cap_a, cap_b)
    exactish = bool(all_exact and n_common > 0 and ham == 0)
    return avg, img_sim, n_common, is_sub, exactish


def oracle_match(
    corpus: pa.Table, cfg: PipelineConfig
) -> tuple[pa.Table, pa.Table]:
    """Run the full chain single-process. Returns (edges, clusters) tables
    with the engine's output schemas (SURVEY.md §1.2)."""
    ids = corpus["image_id"].to_pylist()
    captions = [tx.normalize_caption(c) for c in corpus["caption"].to_pylist()]
    phashes = corpus["phash"].to_pylist()
    n = len(ids)

    fields = [tx.parse_fields(c) for c in captions]
    # shingle the field VALUES (reference compares per-predicate literals,
    # similarity_utils.py:58-104) — template labels otherwise put a Jaccard
    # floor under every distinct pair; free-text captions are unchanged
    # (parse_fields falls back to {"caption": text})
    sig_texts = (
        [" ".join(f.values()) for f in fields]
        if cfg.shingle_values_only
        else captions
    )
    stream, offsets = shingle_hash_stream(sig_texts, cfg.shingle_k, cfg.seed)
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    sigs = minhash_from_stream(stream, offsets, a, b)
    digests = signature_digest(sigs)
    simhash = simhash_from_stream(stream, offsets)
    ph = np.array([p % 2**64 for p in phashes], dtype=np.uint64)
    bk = all_candidate_keys(
        sigs, ph, simhash, cfg.bands, cfg.rows,
        cfg.phash_bands, cfg.simhash_bands, cfg.seed,
    )

    blocks = block_keys(fields, cfg.block_fields, cfg.seed)
    buckets: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        for bandkey in bk[i]:
            buckets[int(bandkey)].append(i)
        for bkey in blocks[i]:
            buckets[bkey].append(i)
    # full key matrix (pad = _KEY_PAD) → min-shared-key pair ownership, the
    # same rule the engine's emit stage applies per shuffle partition
    n_band = bk.shape[1]
    max_bl = max((len(b) for b in blocks), default=0)
    key_rows = np.full((n, n_band + max_bl), _KEY_PAD, dtype=np.uint64)
    key_rows[:, :n_band] = bk
    for i, bl in enumerate(blocks):
        if bl:
            key_rows[i, n_band : n_band + len(bl)] = np.array(bl, dtype=np.uint64)
    pairs, _ = candidate_pairs_from_buckets(
        buckets, digests, cfg.max_bucket, cfg.max_refined, ids, key_rows
    )

    # per-doc field parses (computed above for blocking) are amortized across
    # all of a doc's candidate pairs; histogram bounds measured slower than
    # the dict loop at caption-field string lengths, so hists stay off here
    edge_rows = []
    uf = UnionFind()
    for i, j in sorted(pairs):
        res = verify_pair(
            captions[i], captions[j], phashes[i], phashes[j], cfg,
            fields[i], fields[j],
        )
        if res is None:
            continue
        score, avg, n_common, tier, passed = res
        keep = passed or (cfg.filter_literals and n_common < 3)
        if keep:
            id_a, id_b = sorted((ids[i], ids[j]))
            edge_rows.append((id_a, id_b, score, avg, tier, passed))
        if passed:
            uf.union(ids[i], ids[j])

    for iid in ids:
        uf.find(iid)
    assign = uf.assignments()
    sizes: dict[str, int] = defaultdict(int)
    for cid in assign.values():
        sizes[cid] += 1

    edges = pa.table(
        {
            "id_a": pa.array([r[0] for r in edge_rows], pa.string()),
            "id_b": pa.array([r[1] for r in edge_rows], pa.string()),
            "score": pa.array([r[2] for r in edge_rows], pa.float32()),
            "avg_field_sim": pa.array([r[3] for r in edge_rows], pa.float32()),
            "tier": pa.array([r[4] for r in edge_rows], pa.string()),
            "pass": pa.array([r[5] for r in edge_rows], pa.bool_()),
        }
    )
    clusters = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "cluster_id": pa.array([assign[i] for i in ids], pa.string()),
            "cluster_size": pa.array(
                [sizes[assign[i]] for i in ids], pa.int32()
            ),
        }
    )
    return edges, clusters


def dup_pairs_from_clusters(clusters: pa.Table) -> set[tuple[str, str]]:
    """All unordered same-cluster pairs — the recall-metric unit
    (canonicalized like the reference eval, ``EvaluateVariations.ipynb cell 2``)."""
    groups: dict[str, list[str]] = defaultdict(list)
    for iid, cid, size in zip(
        clusters["image_id"].to_pylist(),
        clusters["cluster_id"].to_pylist(),
        clusters["cluster_size"].to_pylist(),
    ):
        if size > 1:
            groups[cid].append(iid)
    out: set[tuple[str, str]] = set()
    for members in groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out
