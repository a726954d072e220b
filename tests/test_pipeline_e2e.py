"""End-to-end engine-vs-oracle acceptance tests (BASELINE.md criteria)."""

import os

import pyarrow as pa
import pytest

from entity_deduplication_hack_main_ray.config import PipelineConfig
from entity_deduplication_hack_main_ray.oracle import (
    dup_pairs_from_clusters,
    oracle_match,
)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig()


def _clusters_table(ds) -> pa.Table:
    return pa.Table.from_pandas(
        ds.to_pandas()[["image_id", "cluster_id", "cluster_size"]]
    )


def test_e2e_recall_vs_oracle(ray_session, tiny_corpus, tiny_corpus_table, cfg):
    """THE acceptance gate: dup-pair recall ≥ 0.99 vs the oracle clusters at
    the same config (expected exactly 1.0 — deterministic shared kernels)."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    edges, clusters = dedup_pipeline(corpus_dir, cfg)
    engine_pairs = dup_pairs_from_clusters(_clusters_table(clusters))
    _, oracle_clusters = oracle_match(tiny_corpus_table, cfg)
    oracle_pairs = dup_pairs_from_clusters(oracle_clusters)
    assert oracle_pairs
    recall = len(engine_pairs & oracle_pairs) / len(oracle_pairs)
    precision = len(engine_pairs & oracle_pairs) / max(1, len(engine_pairs))
    assert recall >= 0.99
    assert precision >= 0.99  # shared kernels → should be exact


def test_e2e_golden_recall(ray_session, tiny_corpus, cfg):
    """Engine must also find the injected golden duplicates."""
    import pyarrow.parquet as pq

    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, golden_path = tiny_corpus
    _, clusters = dedup_pipeline(corpus_dir, cfg)
    pairs = dup_pairs_from_clusters(_clusters_table(clusters))
    g = pq.read_table(golden_path)
    gold = {
        tuple(sorted((o, d)))
        for o, d in zip(
            g["original_id"].to_pylist(), g["duplicate_id"].to_pylist()
        )
    }
    assert len(pairs & gold) / len(gold) >= 0.99


def test_e2e_with_bytes_fidelity_path(ray_session, tiny_corpus, cfg):
    """with_bytes=True re-decodes images in the Signer; results must agree
    with the trusted-phash fast path (phash column is generator-verified)."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    _, c_fast = dedup_pipeline(corpus_dir, cfg, with_bytes=False)
    _, c_slow = dedup_pipeline(corpus_dir, cfg, with_bytes=True)
    fast = dup_pairs_from_clusters(_clusters_table(c_fast))
    slow = dup_pairs_from_clusters(_clusters_table(c_slow))
    assert fast == slow


def test_media_validator(ray_session, tiny_corpus, cfg):
    import ray.data

    from entity_deduplication_hack_main_ray.stages.signer import MediaValidator

    corpus_dir, _ = tiny_corpus
    ds = ray.data.read_parquet(corpus_dir)
    out = ds.map_batches(
        MediaValidator,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    ).to_pandas()
    assert out["phash_match"].all()
    assert (out["psnr_db"] >= 40.0).all()


def test_engine_deterministic_across_runs(ray_session, tiny_corpus, cfg):
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    _, c1 = dedup_pipeline(corpus_dir, cfg)
    _, c2 = dedup_pipeline(corpus_dir, cfg)
    p1 = dup_pairs_from_clusters(_clusters_table(c1))
    p2 = dup_pairs_from_clusters(_clusters_table(c2))
    assert p1 == p2


def test_distributed_clustering_path(ray_session, tiny_corpus):
    """Force the distributed min-label propagation (driver_uf_max_edges=0)
    and assert identical assignments to the driver union-find."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    cfg_driver = PipelineConfig()
    cfg_dist = PipelineConfig(driver_uf_max_edges=0)
    _, cd = dedup_pipeline(corpus_dir, cfg_driver)
    _, cx = dedup_pipeline(corpus_dir, cfg_dist)
    td = _clusters_table(cd).sort_by("image_id")
    tx_ = _clusters_table(cx).sort_by("image_id")
    assert td.equals(tx_)


def test_non_numeric_ids_deterministic(ray_session, tiny_corpus_table, cfg, tmp_path):
    """Ids without numeric prefixes must flow through candidate emission and
    verification deterministically (round-1 used a PYTHONHASHSEED-randomized
    hash((a,b)) fallback for such ids; the ownership design has no id-format
    dependence — this test pins that)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    t = tiny_corpus_table
    weird = pa.array(
        [f"img-{s[::-1]}" for s in t["image_id"].to_pylist()], pa.string()
    )
    t2 = t.set_column(t.schema.get_field_index("image_id"), "image_id", weird)
    out = tmp_path / "weird_corpus"
    out.mkdir()
    pq.write_table(t2, str(out / "part-0.parquet"))
    e1, c1 = dedup_pipeline(str(out), cfg)
    e2, c2 = dedup_pipeline(str(out), cfg)
    df1 = e1.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    df2 = e2.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(df1) > 0
    assert df1.equals(df2)
    assert df1["id_a"].str.startswith("img-").all()


def test_golden_eval_precision_columns(ray_session):
    """golden_eval must report the reference FP-exclusion precision rule
    (EvaluateVariations.ipynb cell 2: predicted true_duplicate pairs are
    excluded from FP) with exact basis-point values on the tiny corpus."""
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import golden_eval

    row = golden_eval("/root/testdata/sf0.001").iloc[0]
    for col in ("precision_bp", "f1_bp", "fp_excluded", "tp_edges", "n_pred_edges"):
        assert col in row.index
    # exact deterministic values on the sf0.001 corpus (regression pins).
    # precision < 100% is INHERENT to the golden's shape: it lists only
    # (original → duplicate) pairs, so correct dup↔dup edges inside a
    # 3+-member cluster count as FP — the same characteristic the reference
    # eval has, which is why it carries the FP-exclusion quirk at all.
    assert row["recall_bp"] == 10000
    assert row["tp_edges"] == 200
    assert row["fp_excluded"] == 17
    assert row["precision_bp"] == 6452
    assert row["f1_bp"] == 7843


def test_psnr_spot_check_edges_join(ray_session, tiny_corpus, cfg):
    """B3 semi-join: only images on verified edges are decoded; all must
    pass the pHash + PSNR >= 40 dB fidelity bar (fixture invariant)."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import (
        dedup_pipeline,
        psnr_spot_check,
    )

    corpus_dir, _ = tiny_corpus
    edges, _ = dedup_pipeline(corpus_dir, cfg)
    out = psnr_spot_check(corpus_dir, edges, cfg).to_pandas()
    edge_df = edges.to_pandas()
    n_edge_ids = len(set(edge_df["id_a"]) | set(edge_df["id_b"]))
    assert len(out) == n_edge_ids  # decoded exactly the matched rows
    assert out["phash_match"].all()
    assert (out["psnr_db"] >= 40.0).all()


def test_distributed_clustering_raises_on_nonconvergence(ray_session):
    """Hitting max_rounds without a fixpoint must raise loudly — silently
    returning possibly-wrong assignments is the failure mode this guards."""
    import pyarrow as pa
    import pytest
    import ray.data

    from entity_deduplication_hack_main_ray.stages.cluster import (
        cluster_edges_distributed,
    )

    # a path graph a-b-c-d-e needs >1 round to converge to min-label
    edges = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(["a", "b", "c", "d"], pa.string()),
                "id_b": pa.array(["b", "c", "d", "e"], pa.string()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        cluster_edges_distributed(edges, max_rounds=1)
    # and with enough rounds the same graph converges to one component
    labels = cluster_edges_distributed(edges, max_rounds=10).to_pandas()
    assert set(labels["label"]) == {"a"}


def test_alpha_sweep_consistent_with_pipeline(ray_session):
    """One sweep run must reproduce the real pipeline's passing-edge count
    at alpha = cfg.alpha, and behave sanely across the grid."""
    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        _run_cached,
        alpha_sweep,
        corpus_for_sf,
    )

    sf = "/root/testdata/sf0.001"
    sweep = alpha_sweep(sf)
    cfg = PipelineConfig()
    row = sweep[sweep["alpha_bp"] == int(cfg.alpha * 10000)].iloc[0]
    corpus_dir, _ = corpus_for_sf(sf)
    edges, _ = _run_cached(corpus_dir, cfg)
    n_passing = int(edges["pass"].sum())
    assert row["n_pred_edges"] == n_passing
    assert len(sweep) == 11
    assert ((sweep["precision_bp"] >= 0) & (sweep["precision_bp"] <= 10000)).all()
    assert ((sweep["recall_bp"] >= 0) & (sweep["recall_bp"] <= 10000)).all()


def test_write_matches_json(ray_session, tmp_path):
    """The S3 human-inspection sink: JSON lines carrying both captions and
    parsed field maps for every edge."""
    import json
    import os

    import ray.data

    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        _run_cached,
        corpus_for_sf,
    )
    from entity_deduplication_hack_main_ray.sources.io import write_matches_json

    corpus_dir, _ = corpus_for_sf("/root/testdata/sf0.001")
    edges_df, _ = _run_cached(corpus_dir, PipelineConfig())
    edges = ray.data.from_pandas(edges_df.head(50))
    out = str(tmp_path / "matches_json")
    write_matches_json(edges, corpus_dir, out)
    rows = []
    for f in os.listdir(out):
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert len(rows) == 50
    r = rows[0]
    for k in ("id_a", "id_b", "score", "tier", "pass",
              "caption_a", "caption_b", "fields_a", "fields_b"):
        assert k in r
    fa = json.loads(r["fields_a"])
    assert isinstance(fa, dict) and len(fa) > 0


def test_flagship_invariant_across_partition_counts(ray_session):
    """Cluster output must be independent of the physical partition count
    (ownership + min-id clustering are partition-agnostic by construction):
    the same corpus at 16 vs 64 shuffle partitions is byte-identical."""
    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        corpus_for_sf,
    )
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = corpus_for_sf("/root/testdata/sf0.001")
    cfg = PipelineConfig()
    import pandas as pd

    outs = []
    for p in (16, 64):
        _, clusters = dedup_pipeline(corpus_dir, cfg, num_partitions=p)
        outs.append(
            clusters.to_pandas().sort_values("image_id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
