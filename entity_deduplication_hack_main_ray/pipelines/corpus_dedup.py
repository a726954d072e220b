"""sf-scaled image+caption corpus dedup — the flagship as a driver query.

The target input shape (BASELINE.json input_hint) is not part of the
TPC-H-ish testdata, so the corpus is synthesized deterministically (seeded,
cached under /tmp) at a size proportional to the scale factor, then the full
dedup pipeline runs over it.
"""

from __future__ import annotations

import os
import re

import pandas as pd

from ..config import PipelineConfig
from ..fixtures import write_corpus
from .dedup import dedup_pipeline

_CACHE_ROOT = "/tmp/edh_ray_corpus"

# in-process memo of (corpus_dir, config_hash) → (edges_df, clusters_df):
# the driver calls several corpus queries back to back; the pipeline result
# is deterministic, so compute it once per session
_RESULT_CACHE: dict[tuple[str, str], tuple[pd.DataFrame, pd.DataFrame]] = {}


def _run_cached(corpus_dir: str, cfg: PipelineConfig) -> tuple[pd.DataFrame, pd.DataFrame]:
    key = (corpus_dir, cfg.config_hash())
    hit = _RESULT_CACHE.get(key)
    if hit is None:
        edges, clusters = dedup_pipeline(corpus_dir, cfg)
        hit = (edges.to_pandas(), clusters.to_pandas())
        _RESULT_CACHE[key] = hit
    return hit


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def corpus_for_sf(sf_dir: str, seed: int = 42) -> tuple[str, str]:
    """(corpus_dir, golden_path) for the scale factor implied by sf_dir.
    sf0.001 → 200 base records, sf0.01 → 2_000, sf0.1 → 20_000."""
    sf = sf_from_dir(sf_dir)
    n_base = max(50, int(round(200_000 * sf)))
    out = os.path.join(_CACHE_ROOT, f"sf{sf}")
    os.makedirs(out, exist_ok=True)
    return write_corpus(out, n_base, seed=seed, rows_per_file=5000)


def image_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Flagship query: clusters table for the sf-scaled corpus."""
    corpus_dir, _ = corpus_for_sf(sf_dir)
    _, clusters = _run_cached(corpus_dir, PipelineConfig())
    return clusters.sort_values("image_id").reset_index(drop=True)


def image_dedup_edges(sf_dir: str) -> pd.DataFrame:
    """Verified duplicate edges for the sf-scaled corpus."""
    corpus_dir, _ = corpus_for_sf(sf_dir)
    edges, _ = _run_cached(corpus_dir, PipelineConfig())
    return edges.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def match_topk(sf_dir: str) -> pd.DataFrame:
    """Reference A1 (`similarity_utils.py:22-33`): per right-side entity,
    keep the top-k candidates by fused score (k = cfg.top_k), score-desc
    with id tiebreak — the match-mode output shape of the reference."""
    cfg = PipelineConfig()
    corpus_dir, _ = corpus_for_sf(sf_dir)
    edges, _ = _run_cached(corpus_dir, cfg)
    out = (
        edges.sort_values(["score", "id_a"], ascending=[False, True])
        .groupby("id_b", group_keys=False)
        .head(cfg.top_k)
    )
    return out.sort_values(["id_b", "id_a"]).reset_index(drop=True)


def eval_by_variation(sf_dir: str) -> pd.DataFrame:
    """Reference eval breakdown (`EvaluateVariations.ipynb cells 11-16`,
    A6/A7): the missed-match GRID — per (variation_type × entity_type),
    golden pairs found/missed by the engine."""
    from ..oracle import dup_pairs_from_clusters
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus_dir, golden_path = corpus_for_sf(sf_dir)
    _, clusters = _run_cached(corpus_dir, PipelineConfig())
    ctbl = pa.Table.from_pandas(
        clusters[["image_id", "cluster_id", "cluster_size"]]
    )
    pred = dup_pairs_from_clusters(ctbl)
    g = pq.read_table(golden_path).to_pandas()
    g["pair"] = [
        tuple(sorted((o, d)))
        for o, d in zip(g["original_id"], g["duplicate_id"])
    ]
    g["found"] = g["pair"].isin(pred)
    out = (
        g.groupby(["variation_type", "entity_type"])
        .agg(n_golden=("pair", "size"), n_found=("found", "sum"))
        .reset_index()
    )
    out["n_found"] = out["n_found"].astype("int64")
    return out.sort_values(
        ["variation_type", "entity_type"]
    ).reset_index(drop=True)


def eval_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-entity-type precision/recall (reference
    ``EvaluateVariations.ipynb cell 5``): recall against the typed golden,
    precision over PASSING edges attributed to a type by parsing the
    caption's ``Type`` field.

    Edge captions are fetched with the ``psnr_spot_check`` broadcast
    semi-join shape (only edge-incident rows leave the corpus read); the
    per-type aggregation itself is driver-scale (edges ≪ corpus)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..functions import text as tx
    from ..oracle import dup_pairs_from_clusters
    from ..sources.io import read_corpus

    corpus_dir, golden_path = corpus_for_sf(sf_dir)
    edges, clusters = _run_cached(corpus_dir, PipelineConfig())
    ctbl = pa.Table.from_pandas(
        clusters[["image_id", "cluster_id", "cluster_size"]]
    )
    pred = dup_pairs_from_clusters(ctbl)
    g = pq.read_table(golden_path).to_pandas()
    g["pair"] = [
        tuple(sorted((o, d)))
        for o, d in zip(g["original_id"], g["duplicate_id"])
    ]
    gold_by_type = {
        t: set(sub["pair"]) for t, sub in g.groupby("entity_type")
    }

    passing = edges[edges["pass"]]
    ids = sorted(set(passing["id_a"]) | set(passing["id_b"]))
    id_ref = ray.put(pa.array(ids, pa.string()))

    def semi_join(t: pa.Table) -> pa.Table:
        probe = ray.get(id_ref)
        return t.filter(pc.is_in(t["image_id"], value_set=probe))

    caps = (
        read_corpus(corpus_dir, ["image_id", "caption"])
        .map_batches(semi_join, batch_format="pyarrow")
        .to_pandas()
    )
    type_of = {
        iid: tx.parse_fields(tx.normalize_caption(c)).get("type", "unknown")
        for iid, c in zip(caps["image_id"], caps["caption"])
    }

    rows = []
    for etype in sorted(gold_by_type):
        gold = gold_by_type[etype]
        tp = len(pred & gold)
        pe = passing[[type_of.get(a) == etype.lower()
                      for a in passing["id_a"]]]
        pred_edges = {tuple(sorted((a, b)))
                      for a, b in zip(pe["id_a"], pe["id_b"])}
        tp_edges = len(pred_edges & gold)
        # same FP-exclusion rule as golden_eval: exact-tier non-golden
        # predicted pairs are not precision errors (reference quirk)
        exact_edges = {
            tuple(sorted((a, b)))
            for a, b, t in zip(pe["id_a"], pe["id_b"], pe["tier"])
            if t == "exact"
        }
        fp = len((pred_edges - gold) - exact_edges)
        rows.append(
            {
                "entity_type": etype,
                "n_golden": len(gold),
                "true_positives": tp,
                "recall_bp": int(round(10000 * tp / max(1, len(gold)))),
                "n_pred_edges": len(pred_edges),
                "tp_edges": tp_edges,
                "precision_bp": int(
                    round(10000 * tp_edges / max(1, tp_edges + fp))
                ),
            }
        )
    return pd.DataFrame(rows).sort_values("entity_type").reset_index(drop=True)


def golden_eval(sf_dir: str) -> pd.DataFrame:
    """Reference-style evaluation (B4/A6: pair-set P/R/F1 vs golden), one
    row, exact basis-point ints.

    Reproduces the reference FP-EXCLUSION quirk
    (``EvaluateVariations.ipynb cell 2`` lines :55-61): predicted pairs the
    matcher classified ``true_duplicate`` (our ``exact`` tier — byte-equal
    caption AND equal pHash) are EXCLUDED from the false-positive count
    when absent from golden — the reference treats them as trivially
    correct rather than penalizing precision. Precision/F1 are computed on
    the direct matched-pair set (passing edges), mirroring the reference's
    matched-set basis; ``recall_bp`` stays cluster-transitive (the engine's
    acceptance metric).
    """
    from ..oracle import dup_pairs_from_clusters
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus_dir, golden_path = corpus_for_sf(sf_dir)
    edges, clusters = _run_cached(corpus_dir, PipelineConfig())
    ctbl = pa.Table.from_pandas(
        clusters[["image_id", "cluster_id", "cluster_size"]]
    )
    pred = dup_pairs_from_clusters(ctbl)
    g = pq.read_table(golden_path)
    gold = {
        tuple(sorted((o, d)))
        for o, d in zip(
            g["original_id"].to_pylist(), g["duplicate_id"].to_pylist()
        )
    }
    tp = len(pred & gold)
    recall_bp = int(round(10000 * tp / max(1, len(gold))))

    passing = edges[edges["pass"]]
    pred_edges = {
        (a, b) for a, b in zip(passing["id_a"], passing["id_b"])
    }
    exact_edges = {
        (a, b)
        for a, b, t in zip(passing["id_a"], passing["id_b"], passing["tier"])
        if t == "exact"
    }
    tp_edges = len(pred_edges & gold)
    fp_all = pred_edges - gold
    fp_excluded = len(fp_all & exact_edges)  # the reference :55-61 rule
    fp = len(fp_all) - fp_excluded
    precision = tp_edges / max(1, tp_edges + fp)
    recall_edges = tp_edges / max(1, len(gold))
    f1 = (
        2 * precision * recall_edges / (precision + recall_edges)
        if precision + recall_edges
        else 0.0
    )
    return pd.DataFrame(
        {
            "n_golden": [len(gold)],
            "n_pred_pairs": [len(pred)],
            "true_positives": [tp],
            "recall_bp": [recall_bp],
            "n_pred_edges": [len(pred_edges)],
            "tp_edges": [tp_edges],
            "fp_excluded": [fp_excluded],
            "precision_bp": [int(round(10000 * precision))],
            "f1_bp": [int(round(10000 * f1))],
        }
    )


_SWEEP_CACHE: dict[tuple[str, str], pd.DataFrame] = {}

DEFAULT_ALPHAS = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


def alpha_sweep(
    sf_dir: str, alphas: tuple[float, ...] = DEFAULT_ALPHAS
) -> pd.DataFrame:
    """α-sweep harness (reference drivers grid α 0.0–0.95,
    ``Run_TransE.py:36-49``; the eval notebooks grid it): ONE engine run in
    sweep mode emits every candidate pair's α-independent components
    (avg_field_sim, img_sim, n_common, substring/exact flags), then the
    whole grid evaluates vectorized on the driver against the golden —
    edge-level precision/recall/F1 per α, with the reference FP-exclusion
    rule (exact-tier non-golden pairs are not precision errors).

    One pipeline execution for the entire grid instead of |alphas| runs:
    the pass rule's α enters only through ``score = α·text + (1-α)·image``,
    and the kept-pair superset is α-independent (see
    ``oracle.verify_components``)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..sources.io import read_corpus
    from .dedup import compute_edges, compute_signatures

    cfg = PipelineConfig()
    corpus_dir, golden_path = corpus_for_sf(sf_dir)
    key = (corpus_dir, cfg.config_hash())
    comps = _SWEEP_CACHE.get(key)
    if comps is None:
        sigs = compute_signatures(
            read_corpus(corpus_dir, ["image_id", "caption", "phash"]), cfg
        )
        comps = compute_edges(sigs, cfg, sweep=True).to_pandas()
        _SWEEP_CACHE[key] = comps

    g = pq.read_table(golden_path)
    gold = {
        tuple(sorted((o, d)))
        for o, d in zip(
            g["original_id"].to_pylist(), g["duplicate_id"].to_pylist()
        )
    }
    avg = comps["avg_field_sim"].to_numpy()
    img = comps["img_sim"].to_numpy()
    thr = (
        comps["n_common"]
        .map(cfg.adaptive_thresholds)
        .fillna(cfg.adaptive_default)
        .to_numpy()
    )
    is_sub = comps["is_substring"].to_numpy()
    exactish = comps["is_exactish"].to_numpy()
    pairs = list(zip(comps["id_a"], comps["id_b"]))

    rows = []
    for a in alphas:
        score = a * avg + (1 - a) * img
        passed = ((avg >= thr) & (score >= cfg.threshold)) | (
            is_sub & (img >= 0.875)
        )
        pred = {p for p, m in zip(pairs, passed) if m}
        exact_pred = {p for p, m, e in zip(pairs, passed, exactish) if m and e}
        tp = len(pred & gold)
        fp = len((pred - gold) - exact_pred)
        prec = tp / max(1, tp + fp)
        rec = tp / max(1, len(gold))
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        rows.append(
            {
                "alpha_bp": int(round(a * 10000)),
                "n_pred_edges": len(pred),
                "tp_edges": tp,
                "precision_bp": int(round(10000 * prec)),
                "recall_bp": int(round(10000 * rec)),
                "f1_bp": int(round(10000 * f1)),
            }
        )
    return pd.DataFrame(rows)


def psnr_spot_check_edges(sf_dir: str) -> pd.DataFrame:
    """B3 semi-join fidelity query: decode ONLY images on verified edges,
    recompute pHash and PSNR (edges ⋈ corpus via broadcast is_in probe —
    a spot check, not a full-corpus validation pass)."""
    import ray.data

    from .dedup import psnr_spot_check

    corpus_dir, _ = corpus_for_sf(sf_dir)
    edges_df, _ = _run_cached(corpus_dir, PipelineConfig())
    edges = ray.data.from_pandas(edges_df[["id_a", "id_b"]])
    out = psnr_spot_check(corpus_dir, edges).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)
