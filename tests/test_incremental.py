"""Incremental dedup: base run + growth shard must equal the full-batch
run — the daily-ingestion equivalence contract."""

import os

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_incremental_equals_full_batch(ray_session, tmp_path):
    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        corpus_for_sf,
    )
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline
    from entity_deduplication_hack_main_ray.pipelines.incremental import (
        incremental_dedup_pipeline,
        split_corpus,
    )

    cfg = PipelineConfig()
    corpus_dir, _ = corpus_for_sf(SF)
    base_dir, grow_dir, _work = split_corpus(corpus_dir)
    ckpt = str(tmp_path / "base_ckpt")

    _, base_clusters = dedup_pipeline(base_dir, cfg, ckpt_dir=ckpt)
    base_clusters.count()

    edges_new, combined = incremental_dedup_pipeline(ckpt, grow_dir, cfg)
    inc = (
        combined.to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )

    # full-batch reference over base ∪ grow
    import shutil

    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    for d in (base_dir, grow_dir):
        for f in os.listdir(d):
            shutil.copy(os.path.join(d, f), os.path.join(full_dir, d[-4:] + f))
    _, full_clusters = dedup_pipeline(full_dir, cfg)
    full = (
        full_clusters.to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full)

    # new edges must all touch the growth shard
    import duckdb

    grow_ids = set(
        r[0]
        for r in duckdb.sql(
            f"SELECT image_id FROM read_parquet('{grow_dir}/*.parquet')"
        ).fetchall()
    )
    e = edges_new.to_pandas()
    assert len(e) > 0
    assert all(
        (a in grow_ids) or (b in grow_ids)
        for a, b in zip(e["id_a"], e["id_b"])
    )


def test_incremental_rejects_config_mismatch(ray_session, tmp_path):
    import dataclasses

    import pytest

    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        corpus_for_sf,
    )
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline
    from entity_deduplication_hack_main_ray.pipelines.incremental import (
        incremental_dedup_pipeline,
        split_corpus,
    )

    corpus_dir, _ = corpus_for_sf(SF)
    base_dir, grow_dir, _ = split_corpus(corpus_dir)
    ckpt = str(tmp_path / "ckpt")
    _, clusters = dedup_pipeline(base_dir, PipelineConfig(), ckpt_dir=ckpt)
    clusters.count()
    other = dataclasses.replace(PipelineConfig(), shingle_k=7)
    with pytest.raises(ValueError, match="different"):
        incremental_dedup_pipeline(ckpt, grow_dir, other)
