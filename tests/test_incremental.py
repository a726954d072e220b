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


def test_chained_increments_equal_full_batch(ray_session, tmp_path):
    """Two chained ingestion batches (each consuming the previous round's
    checkpoints) must equal one full-batch run over all three shards."""
    import pyarrow.parquet as pq

    from entity_deduplication_hack_main_ray.config import PipelineConfig
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        corpus_for_sf,
    )
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline
    from entity_deduplication_hack_main_ray.pipelines.incremental import (
        incremental_dedup_pipeline,
    )

    cfg = PipelineConfig()
    corpus_dir, _ = corpus_for_sf(SF)
    import pyarrow as pa

    t = pa.concat_tables(
        pq.read_table(os.path.join(corpus_dir, f))
        for f in sorted(os.listdir(corpus_dir))
        if f.endswith(".parquet")
    )
    n = t.num_rows
    shards = []
    for i, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        d = str(tmp_path / f"shard{i}")
        os.makedirs(d)
        pq.write_table(t.slice(lo, hi - lo), os.path.join(d, "part.parquet"))
        shards.append(d)

    ck0 = str(tmp_path / "ck0")
    _, c0 = dedup_pipeline(shards[0], cfg, ckpt_dir=ck0)
    c0.count()
    ck1 = str(tmp_path / "ck1")
    incremental_dedup_pipeline(ck0, shards[1], cfg, ckpt_dir=ck1)
    ck2 = str(tmp_path / "ck2")
    _, chained = incremental_dedup_pipeline(ck1, shards[2], cfg, ckpt_dir=ck2)
    inc = chained.to_pandas().sort_values("image_id").reset_index(drop=True)

    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    pq.write_table(t, os.path.join(full_dir, "part.parquet"))
    _, full_clusters = dedup_pipeline(full_dir, cfg)
    full = (
        full_clusters.to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full)
