"""Cluster job entrypoint for the flagship dedup pipeline (north_rule:
"run via ray job submit on a fixed-size multi-node Ray cluster").

On a real cluster:

    ray job submit --working-dir . -- \\
        python -m entity_deduplication_hack_main_ray.job \\
        --corpus s3://bucket/corpus --out s3://bucket/run1 \\
        --ckpt s3://bucket/run1/ckpt

The same invocation runs unchanged single-node (``RAY_ADDRESS=local``) —
which is how the test suite drives it. Design notes for the multi-node
case, all inherited from the library (nothing cluster-specific lives here):

* ``ray.init(address=...)`` only when no session exists — under
  ``ray job submit`` the job driver attaches to the running cluster and
  this guard is a no-op, per the driver-contract rule that library code
  never owns a Ray session.
* every wide stage is checkpointed per-partition Parquet (``--ckpt``), so
  a preempted job resumes by re-submitting the identical command; finished
  stages are skipped by manifest fingerprint.
* outputs are partitioned Parquet directories (edges/, clusters/) plus a
  small ``metrics.json`` manifest (rows, wall seconds, rows/s per stage) —
  the per-partition lineage + metrics the north_rule requires.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m entity_deduplication_hack_main_ray.job",
        description="Near-duplicate detection + clustering over an "
        "image+caption corpus (Lance or Parquet).",
    )
    p.add_argument("--corpus", required=True, help="corpus dir (Lance/Parquet)")
    p.add_argument("--out", required=True, help="output dir for edges/clusters")
    p.add_argument("--ckpt", default=None, help="checkpoint dir (resumable)")
    p.add_argument(
        "--with-bytes", action="store_true",
        help="re-decode every image (fidelity path) instead of trusting "
        "the corpus phash column",
    )
    p.add_argument(
        "--partitions", type=int, default=64,
        help="candidate-shuffle partition count (scale with cluster size)",
    )
    p.add_argument(
        "--config", default=None,
        help="JSON object of PipelineConfig field overrides",
    )
    p.add_argument(
        "--matches-json", action="store_true",
        help="also write the verified matches as enriched JSON lines "
        "(both captions + parsed field maps) for human inspection",
    )
    p.add_argument(
        "--grow-from", default=None, metavar="BASE_CKPT",
        help="incremental ingestion: treat --corpus as a NEW shard and "
        "grow the deduped corpus whose base run checkpointed to "
        "BASE_CKPT (old pairs never re-verified); with --ckpt the growth "
        "is chainable (next day's --grow-from points here)",
    )
    return p


def run_job(args: argparse.Namespace) -> dict:
    """Execute the flagship pipeline; returns the metrics manifest dict."""
    import ray

    if not ray.is_initialized():  # no-op under `ray job submit` / tests
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from .config import PipelineConfig
    from .pipelines.dedup import dedup_pipeline
    from .sources.io import write_matches_json

    overrides = json.loads(args.config) if args.config else {}
    cfg = PipelineConfig(**overrides)

    t0 = time.monotonic()
    if args.grow_from:
        if args.with_bytes:
            raise SystemExit(
                "--with-bytes is not supported with --grow-from: the "
                "incremental path trusts the corpus phash column (the "
                "base run's signatures are reused unverified). Run the "
                "growth shard as a base job with --with-bytes first if "
                "fidelity re-decoding is required."
            )
        from .pipelines.incremental import incremental_dedup_pipeline

        edges, clusters = incremental_dedup_pipeline(
            args.grow_from,
            args.corpus,
            cfg,
            num_partitions=args.partitions,
            ckpt_dir=args.ckpt,
        )
    else:
        edges, clusters = dedup_pipeline(
            args.corpus,
            cfg,
            ckpt_dir=args.ckpt,
            with_bytes=args.with_bytes,
            num_partitions=args.partitions,
        )
    from .state.checkpoint import join_path, list_stage_manifests, resolve_fs, write_json

    edges_path = join_path(args.out, "edges")
    clusters_path = join_path(args.out, "clusters")
    # pin both before write: edges is already materialized (or parquet-
    # checkpointed) by dedup_pipeline, but clusters is lazy on the
    # no-ckpt path — without this the count() below would re-execute the
    # whole corpus-wide assignment DAG a second time
    clusters = clusters.materialize()
    edges.write_parquet(edges_path)
    t_edges = time.monotonic()
    clusters.write_parquet(clusters_path)
    t_done = time.monotonic()

    n_edges = edges.count()
    n_rows = clusters.count()
    manifest = {
        "corpus": args.corpus,
        "config_hash": cfg.config_hash(),
        "partitions": args.partitions,
        "rows": n_rows,
        "verified_edges": n_edges,
        "wall_s": round(t_done - t0, 3),
        "edges_wall_s": round(t_edges - t0, 3),
        "rows_per_s": round(n_rows / max(t_done - t0, 1e-9), 1),
        "outputs": {"edges": edges_path, "clusters": clusters_path},
        "resumable": args.ckpt is not None,
        "mode": "grow" if args.grow_from else "base",
    }
    if args.ckpt:
        # per-stage lineage from the checkpoint manifests (rows, wall,
        # throughput) — the north_rule's per-partition metrics surfaced in
        # one place; routed through pyarrow.fs so --ckpt may be s3://...
        manifest["stages"] = {
            stage: {
                k: sm.get(k)
                for k in ("rows", "wall_sec", "rows_per_sec", "complete")
            }
            for stage, sm in list_stage_manifests(args.ckpt).items()
        }
    if args.matches_json:
        import pyarrow.compute as pc

        mj_dir = join_path(args.out, "matches_json")
        passing = edges.map_batches(
            lambda t: t.filter(pc.equal(t["pass"], True)),
            batch_format="pyarrow",
        )
        write_matches_json(passing, args.corpus, mj_dir)
        manifest["matches_json"] = mj_dir
    # pyarrow.fs single-object write: works for local dirs AND object-store
    # --out URIs (write_parquet above already created the output prefix)
    fs, out_p = resolve_fs(args.out)
    fs.create_dir(out_p, recursive=True)
    write_json(join_path(args.out, "metrics.json"), manifest)
    return manifest


def main(argv: list[str] | None = None) -> int:
    manifest = run_job(build_parser().parse_args(argv))
    print(json.dumps(manifest, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
