"""Checkpoint/resume tests (BASELINE.md: kill after stage k, resume,
byte-equal clusters)."""

import json
import os
import shutil

import pyarrow as pa

from entity_deduplication_hack_main_ray.config import PipelineConfig
from entity_deduplication_hack_main_ray.state.checkpoint import (
    StageManifest,
    fingerprint_input,
    stage_is_complete,
)


def _clusters_table(ds) -> pa.Table:
    return pa.Table.from_pandas(
        ds.to_pandas()[["image_id", "cluster_id", "cluster_size"]]
    ).sort_by("image_id")


def test_checkpointed_run_and_resume(ray_session, tiny_corpus, tmp_path):
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    cfg = PipelineConfig()
    ckpt = str(tmp_path / "ckpt")

    _, c1 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt)
    t1 = _clusters_table(c1)
    for stage in ("signatures", "edges", "clusters"):
        m = json.load(open(os.path.join(ckpt, stage, "_manifest.json")))
        assert m["complete"] and m["rows"] > 0 and m["config_hash"] == cfg.config_hash()

    # simulate a crash AFTER the edges stage: clusters checkpoint destroyed
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    edges_manifest = os.path.join(ckpt, "edges", "_manifest.json")
    before = os.path.getmtime(edges_manifest)
    _, c2 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt)
    assert _clusters_table(c2).equals(t1)  # byte-equal resume
    assert os.path.getmtime(edges_manifest) == before  # edges NOT recomputed


def test_mid_stage_kill_leaves_no_torn_stage(ray_session, tiny_corpus, tmp_path):
    """A stage dir without a valid manifest (the atomic-rename contract's
    failure mode is only the .tmp dir) must be recomputed, not trusted."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    cfg = PipelineConfig()
    ckpt = str(tmp_path / "ckpt")
    _, c1 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt)
    t1 = _clusters_table(c1)

    # corrupt: stage dir present but manifest says incomplete
    mpath = os.path.join(ckpt, "edges", "_manifest.json")
    m = json.load(open(mpath))
    m["complete"] = False
    StageManifest(mpath).write(m)
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    _, c2 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt)
    assert _clusters_table(c2).equals(t1)
    assert json.load(open(mpath))["complete"] is True  # recomputed cleanly


def test_config_change_invalidates_checkpoints(ray_session, tiny_corpus, tmp_path):
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline

    corpus_dir, _ = tiny_corpus
    ckpt = str(tmp_path / "ckpt")
    cfg1 = PipelineConfig()
    dedup_pipeline(corpus_dir, cfg1, ckpt_dir=ckpt)
    fp = fingerprint_input(corpus_dir)
    assert stage_is_complete(ckpt, "signatures", cfg1.config_hash(), fp)
    cfg2 = PipelineConfig(shingle_k=4)
    assert not stage_is_complete(ckpt, "signatures", cfg2.config_hash(), fp)


def test_execution_knobs_do_not_invalidate():
    """Manifests stay valid across parallelism levels (SURVEY.md §4)."""
    a = PipelineConfig(signer_concurrency=2, batch_size=128)
    b = PipelineConfig(signer_concurrency=16, batch_size=8192)
    assert a.config_hash() == b.config_hash()
    assert PipelineConfig(seed=1).config_hash() != a.config_hash()


def test_checkpoint_over_file_uri(ray_session, tiny_corpus, tmp_path):
    """--ckpt/--out may be object-store URIs: the manifest/lineage layer is
    routed through pyarrow.fs (FileSystem.from_uri). A file:// URI exercises
    that generic code path end to end (resolve → write parts → manifest-last
    commit → resume skip) without needing a real bucket."""
    from entity_deduplication_hack_main_ray.pipelines.dedup import dedup_pipeline
    from entity_deduplication_hack_main_ray.state.checkpoint import (
        list_stage_manifests,
    )

    corpus_dir, _ = tiny_corpus
    cfg = PipelineConfig()
    ckpt_uri = "file://" + str(tmp_path / "ckpt_uri")

    _, c1 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt_uri)
    t1 = _clusters_table(c1)
    stages = list_stage_manifests(ckpt_uri)
    assert set(stages) >= {"signatures", "edges", "clusters"}
    assert all(m["complete"] and m["rows"] > 0 for m in stages.values())

    # resume through the URI path: nothing recomputed, byte-equal output
    edges_manifest = str(tmp_path / "ckpt_uri" / "edges" / "_manifest.json")
    before = os.path.getmtime(edges_manifest)
    _, c2 = dedup_pipeline(corpus_dir, cfg, ckpt_dir=ckpt_uri)
    assert _clusters_table(c2).equals(t1)
    assert os.path.getmtime(edges_manifest) == before


def test_fingerprint_input_over_uri_matches_local(tiny_corpus):
    corpus_dir, _ = tiny_corpus
    # same directory addressed both ways must not invalidate checkpoints
    assert fingerprint_input(corpus_dir) == fingerprint_input(
        "file://" + os.path.abspath(corpus_dir)
    )


def test_manifest_protocol_on_mock_filesystem(monkeypatch):
    """VERDICT r4 #6: the manifest-last commit protocol must work on a
    NON-LOCAL pyarrow filesystem. All metadata I/O is driven through
    pyarrow's in-memory _MockFileSystem behind a mock:// scheme — any
    regression of a checkpoint path to os.* / open() I/O fails here,
    because mock:// paths do not exist on local disk."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    from entity_deduplication_hack_main_ray.state import checkpoint as cp

    mockfs = pafs._MockFileSystem()
    real_resolve = cp.resolve_fs

    def resolve(path):
        if path.startswith("mock://"):
            return mockfs, path[len("mock://"):]
        return real_resolve(path)  # pragma: no cover - mock-only test

    monkeypatch.setattr(cp, "resolve_fs", resolve)

    ckpt = "mock://ckpt"
    stage_dir = cp.join_path(ckpt, "stage_a")
    _, sd = resolve(stage_dir)
    mockfs.create_dir(sd, recursive=True)

    # parts land FIRST (manifest-last): without a manifest the stage must
    # read as incomplete even though data files exist
    pq.write_table(
        pa.table({"x": [1, 2, 3]}), sd + "/part-0.parquet", filesystem=mockfs
    )
    assert not cp.stage_is_complete(ckpt, "stage_a", "cfg1", "fp1")

    # a TORN manifest (truncated JSON) must also read as incomplete
    with mockfs.open_output_stream(sd + "/_manifest.json") as f:
        f.write(b'{"config_hash": "cfg1", "complete": tr')
    assert cp.read_json(stage_dir + "/_manifest.json") is None
    assert not cp.stage_is_complete(ckpt, "stage_a", "cfg1", "fp1")

    # the committed manifest is ONE single-object write (atomic PUT class)
    rows = sum(f.num_rows for f in cp._parquet_metadata(stage_dir))
    cp.write_json(
        stage_dir + "/_manifest.json",
        {
            "stage": "stage_a",
            "config_hash": "cfg1",
            "input_fingerprint": "fp1",
            "rows": rows,
            "complete": True,
        },
    )
    assert cp.stage_is_complete(ckpt, "stage_a", "cfg1", "fp1")
    # wrong config or input fingerprint invalidates, same as local
    assert not cp.stage_is_complete(ckpt, "stage_a", "cfg2", "fp1")
    assert not cp.stage_is_complete(ckpt, "stage_a", "cfg1", "fp2")

    # lineage listing sees exactly the committed stage, via the mock fs
    manifests = cp.list_stage_manifests(ckpt)
    assert list(manifests) == ["stage_a"]
    assert manifests["stage_a"]["rows"] == 3
    assert json.dumps(manifests["stage_a"], sort_keys=True)  # JSON-clean

    # fingerprint_input works over the mock fs and tracks content changes
    fp_before = cp.fingerprint_input(stage_dir)
    pq.write_table(
        pa.table({"x": [9]}), sd + "/part-1.parquet", filesystem=mockfs
    )
    assert cp.fingerprint_input(stage_dir) != fp_before
