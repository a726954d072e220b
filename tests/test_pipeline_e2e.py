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
