"""Sources and sinks (SURVEY.md §2.1 S1-S6).

The corpus lives in Lance tables per the target spec (`BASELINE.json`
input_hint); this container has no ``lance`` package, so ``read_corpus``
prefers ``ray.data.read_lance`` when importable and transparently falls back
to block-partitioned Parquet — same schema, same streaming behavior. The
reference's whole-graph in-memory parse (``Run_Sembedding.py:9-16``) has no
analog here: reads are lazy, column-pruned and block-partitioned.
"""

from __future__ import annotations

import os

import ray.data


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the image+caption corpus (S1).

    ``columns`` pruning matters: the ``bytes`` column dominates row width at
    image scale — pipelines that trust the precomputed ``phash`` column must
    NOT read it (pass e.g. ``["image_id", "caption", "phash"]``).

    The read is split into at least ~2 blocks per cluster CPU
    (``override_num_blocks``): downstream signature/explode stages are
    TASK-pool maps that FUSE with the read, so a corpus stored as a FEW
    large files would otherwise pin the whole fused chain to a few tasks
    and idle the cluster (measured 5× on the 38k-row bench corpus, which
    is 2 parquet files). Ray treats the override as an exact target, so it
    is applied ONLY when it would INCREASE parallelism: a corpus already
    stored as ≥ 2×CPU files (the 100 TB shape) keeps Ray's native
    per-file/row-group splitting — overriding there would COALESCE many
    files into a few giant read tasks (a memory + straggler hazard).
    """
    blocks = None
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
        if cpus:
            n_files = 1
            if os.path.isdir(path):
                n_files = sum(
                    1 for f in os.listdir(path) if not f.startswith((".", "_"))
                )
            if n_files < cpus * 2:
                blocks = cpus * 2
    except Exception:
        blocks = None
    if os.path.isdir(path) and any(
        f.endswith(".lance") for f in os.listdir(path)
    ) or path.endswith(".lance"):
        try:
            return ray.data.read_lance(path, columns=columns)
        except ImportError:
            pass  # no lance in this environment → parquet fallback below
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=blocks)


def read_golden(path: str) -> ray.data.Dataset:
    """Golden-pairs fixture reader (S6 analog of the reference golden CSV)."""
    if path.endswith(".csv"):
        return ray.data.read_csv(path)
    return ray.data.read_parquet(path)


def write_partitioned(
    ds: ray.data.Dataset, out_dir: str, min_rows_per_file: int = 100_000
) -> None:
    """Parquet sink (S3/S4 analog): a directory of part files, never one
    giant file — the resumability unit (SURVEY.md §4)."""
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
