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
    """map_batches kernel: one verification per (unique) pair row.

    Hot-path design (this is THE per-pair cost at 10^12 scale): a fully
    VECTORIZED fast-reject computes, for every pair in the batch at once,
    an upper bound on the field-similarity mean (per-field byte-histogram
    intersection bounds ≥ SequenceMatcher ratio — difflib's quick_ratio
    invariant), a conservative acronym-boost allowance, the pHash Hamming
    image similarity, a caption-equality vector and a multiset NECESSARY
    condition for substring containment. A pair is dropped only when every
    escape hatch is provably closed, so the surviving ~few % go through the
    exact shared kernel (``oracle.verify_pair``) and the decision set is
    bit-identical to the oracle's.
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        thr = self.cfg.adaptive_thresholds
        self._thr_vec = np.array(
            [thr.get(i, self.cfg.adaptive_default) for i in range(64)]
        )
        # cross-batch per-doc feature cache (actor-pool state): a doc appears
        # in many pairs spread over many batches; its parse + histograms are
        # computed once per actor lifetime
        self._doc_cache: dict[str, tuple] = {}

    def _doc_features(self, iid: str, cap: str) -> tuple:
        feat = self._doc_cache.get(iid)
        if feat is not None:
            return feat
        fl = tx.parse_fields(cap)
        raw = cap.encode("utf-8", "surrogatepass")
        if len(raw) != len(cap):
            feat = (fl, None)  # non-ascii → histogram bounds unsafe
        else:
            arr = np.frombuffer(raw, dtype=np.uint8)
            caphist = np.bincount(arr & 0x7F, minlength=128).astype(np.int32)
            # ONE fused bincount for every field histogram: bucket index =
            # field_idx*128 + folded byte (per-field add.at loops measured
            # ~6x slower at caption-field sizes)
            keys = list(fl)
            bvals = [fl[k].encode() for k in keys]
            lens = np.fromiter((len(b) for b in bvals), dtype=np.int64,
                               count=len(bvals))
            allb = np.frombuffer(b"".join(bvals), dtype=np.uint8)
            fidx = np.repeat(
                np.arange(len(bvals), dtype=np.int64) * 128, lens
            )
            hists = np.bincount(
                fidx + (allb & 0x7F), minlength=len(bvals) * 128
            ).astype(np.uint16).reshape(len(bvals), 128)
            per_field = {}
            for j, k in enumerate(keys):
                v = fl[k]
                nsp = int(hists[j, 32])  # count of 0x20 space bytes
                per_field[k] = (hists[j], len(v), len(v.split()), len(v) - nsp)
            feat = (fl, (caphist, len(cap), per_field))
        self._doc_cache[iid] = feat
        if len(self._doc_cache) > 2_000_000:  # bound actor memory
            self._doc_cache.clear()
        return feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n_pairs = batch.num_rows
        if n_pairs == 0:
            return EDGE_SCHEMA.empty_table()
        id_a = batch["id_a"].to_pylist()
        id_b = batch["id_b"].to_pylist()
        cap_a = batch["cap_a"].to_pylist()
        cap_b = batch["cap_b"].to_pylist()
        ph_a = batch["ph_a"].to_numpy(zero_copy_only=False)
        ph_b = batch["ph_b"].to_numpy(zero_copy_only=False)

        # ---- per-unique-doc features (actor-cached across batches) --------
        idx: dict[str, int] = {}
        caps: list[str] = []
        feats: list[tuple] = []
        for iid, cap in zip(id_a + id_b, cap_a + cap_b):
            if iid not in idx:
                idx[iid] = len(caps)
                caps.append(cap)
                feats.append(self._doc_features(iid, cap))
        n_docs = len(caps)
        fields = [f[0] for f in feats]
        labels: dict[str, int] = {}
        for f in fields:
            for k in f:
                labels.setdefault(k, len(labels))
        F = len(labels)
        present = np.zeros((n_docs, F), dtype=bool)
        flen = np.zeros((n_docs, F), dtype=np.int32)
        wc = np.zeros((n_docs, F), dtype=np.int32)    # word count
        dl = np.full((n_docs, F), -1, dtype=np.int32)  # despaced length
        hist = np.zeros((n_docs, F, 128), dtype=np.uint16)
        caplen = np.zeros(n_docs, dtype=np.int32)
        caphist = np.zeros((n_docs, 128), dtype=np.int32)
        unsafe = np.zeros(n_docs, dtype=bool)  # non-ascii → bound invalid
        for d, (fl, packed) in enumerate(feats):
            if packed is None:
                unsafe[d] = True
                continue
            chist, clen, per_field = packed
            caphist[d] = chist
            caplen[d] = clen
            for k, (h, ln, w, dsp) in per_field.items():
                j = labels[k]
                present[d, j] = True
                flen[d, j] = ln
                wc[d, j] = w
                dl[d, j] = dsp
                hist[d, j] = h

        ia = np.fromiter((idx[i] for i in id_a), dtype=np.int64, count=n_pairs)
        ib = np.fromiter((idx[i] for i in id_b), dtype=np.int64, count=n_pairs)

        # ---- vectorized bounds over all pairs -----------------------------
        common = present[ia] & present[ib]                       # (p, F)
        n_common = common.sum(axis=1).astype(np.int64)
        inter = np.minimum(hist[ia], hist[ib]).sum(
            axis=2, dtype=np.int32
        )                                                        # (p, F)
        la, lb = flen[ia], flen[ib]
        denom = la + lb
        with np.errstate(divide="ignore", invalid="ignore"):
            ub = np.where(denom > 0, 2.0 * inter / denom, 1.0)
        # acronym boost is only reachable when one side's word count equals
        # the other side's despaced length (exact necessary condition of
        # reference F2); grant the boost allowance exactly there
        acro_possible = (wc[ia] == dl[ib]) | (wc[ib] == dl[ia])
        ub = np.maximum(ub, np.where(acro_possible, cfg.acronym_boost, 0.0))
        ub *= common
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_ub = np.where(n_common > 0, ub.sum(axis=1) / np.maximum(n_common, 1), 0.0)
        thr = self._thr_vec[np.clip(n_common, 0, 63)]

        ham = _popcount(np.bitwise_xor(ph_a.view(np.uint64), ph_b.view(np.uint64)))
        img_ok = (1.0 - ham / 64.0) >= 0.875
        cap_eq = np.fromiter(
            (cap_a[i] == cap_b[i] for i in range(n_pairs)), dtype=bool,
            count=n_pairs,
        )
        # substring NECESSARY condition: shorter multiset ⊆ longer multiset
        sub_possible = (
            np.minimum(caphist[ia], caphist[ib]).sum(axis=1)
            >= np.minimum(caplen[ia], caplen[ib])
        )

        reject = (
            (mean_ub < thr)
            & ~(cfg.filter_literals & (n_common < 3))
            & ~(img_ok & sub_possible)
            & ~cap_eq
            & ~unsafe[ia]
            & ~unsafe[ib]
        )
        survivors = np.nonzero(~reject)[0]

        # ---- exact kernel on survivors only -------------------------------
        o_a, o_b, scores, avgs, tiers, passes = [], [], [], [], [], []
        for i in survivors.tolist():
            res = verify_pair(
                cap_a[i], cap_b[i], int(ph_a[i]), int(ph_b[i]), cfg,
                fields[ia[i]], fields[ib[i]],
            )
            if res is None:
                continue
            score, avg, nc, tier, passed = res
            if not (passed or (cfg.filter_literals and nc < 3)):
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


def _popcount(v: np.ndarray) -> np.ndarray:
    b = v.view(np.uint8).reshape(*v.shape, 8)
    return np.unpackbits(b, axis=-1).sum(axis=-1).astype(np.int32)
