"""Job entrypoint (`python -m entity_deduplication_hack_main_ray.job`):
the `ray job submit` surface, driven in local mode — in-process (shares the
session Ray) and resuming from its own checkpoints."""

import json
import os

import pandas as pd

from entity_deduplication_hack_main_ray.job import build_parser, run_job


def _args(corpus_dir, out, **kw):
    argv = ["--corpus", corpus_dir, "--out", out]
    for k, v in kw.items():
        flag = "--" + k.replace("_", "-")
        if v is True:
            argv.append(flag)
        else:
            argv += [flag, str(v)]
    return build_parser().parse_args(argv)


def test_job_end_to_end(ray_session, tiny_corpus, tmp_path):
    corpus_dir, _ = tiny_corpus
    out = str(tmp_path / "run1")
    manifest = run_job(_args(corpus_dir, out, matches_json=True))
    # manifest written and self-consistent
    disk = json.load(open(os.path.join(out, "metrics.json")))
    assert disk == manifest
    assert manifest["rows"] > 0 and manifest["verified_edges"] > 0
    # partitioned parquet outputs load and cover the corpus
    clusters = pd.read_parquet(manifest["outputs"]["clusters"])
    assert len(clusters) == manifest["rows"]
    assert set(clusters.columns) == {"image_id", "cluster_id", "cluster_size"}
    edges = pd.read_parquet(manifest["outputs"]["edges"])
    assert len(edges) == manifest["verified_edges"]
    # human-inspection JSON exists and is enriched
    mj_files = [
        os.path.join(manifest["matches_json"], f)
        for f in os.listdir(manifest["matches_json"])
    ]
    assert mj_files
    row = json.loads(open(mj_files[0]).readline())
    assert {"id_a", "id_b", "caption_a", "fields_a"} <= set(row)


def test_job_resume_from_checkpoint(ray_session, tiny_corpus, tmp_path):
    corpus_dir, _ = tiny_corpus
    ckpt = str(tmp_path / "ckpt")
    m1 = run_job(_args(corpus_dir, str(tmp_path / "a"), ckpt=ckpt))
    assert m1["resumable"]
    # second submission of the identical command: resumes from finished
    # stage checkpoints and reproduces the result exactly
    m2 = run_job(_args(corpus_dir, str(tmp_path / "b"), ckpt=ckpt))
    a = pd.read_parquet(m1["outputs"]["clusters"]).sort_values("image_id")
    b = pd.read_parquet(m2["outputs"]["clusters"]).sort_values("image_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert m2["rows"] == m1["rows"]
