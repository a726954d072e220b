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


def write_matches_json(
    edges: ray.data.Dataset, corpus_path: str, out_dir: str
) -> None:
    """Human-inspection match sink (S3's promised ``write_json``; reference
    ``output_utils.py:5-77`` emits enriched per-match JSON carrying both
    entities' predicates): each edge row is enriched with both captions and
    their parsed field maps, then written as JSON lines.

    Scale shape: the edge-id set (small — verified pairs only) broadcasts
    once; the corpus read is pruned to (image_id, caption) and semi-joined
    with the Arrow ``is_in`` probe, so only edge-incident captions move; the
    caption map broadcasts back for the enrich ``map_batches``; the write
    streams (a directory of JSON part files, resumable like the Parquet
    sinks)."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..functions import text as tx

    ids: set[str] = set()
    for b in edges.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids.update(b["id_a"].to_pylist())
        ids.update(b["id_b"].to_pylist())
    probe_ref = ray.put(pa.array(sorted(ids), pa.string()))

    def semi_join(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["image_id"], value_set=ray.get(probe_ref))
        )

    caps = (
        read_corpus(corpus_path, ["image_id", "caption"])
        .map_batches(semi_join, batch_format="pyarrow")
        .to_pandas()
    )
    cmap_ref = ray.put(dict(zip(caps["image_id"], caps["caption"])))

    def enrich(t: pa.Table) -> pa.Table:
        cmap = ray.get(cmap_ref)
        cols = {name: t[name] for name in t.schema.names}
        cap_a, cap_b, f_a, f_b = [], [], [], []
        for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
            ca, cb = cmap.get(a, ""), cmap.get(b, "")
            cap_a.append(ca)
            cap_b.append(cb)
            f_a.append(json.dumps(tx.parse_fields(tx.normalize_caption(ca))))
            f_b.append(json.dumps(tx.parse_fields(tx.normalize_caption(cb))))
        cols["caption_a"] = pa.array(cap_a, pa.string())
        cols["caption_b"] = pa.array(cap_b, pa.string())
        cols["fields_a"] = pa.array(f_a, pa.string())
        cols["fields_b"] = pa.array(f_b, pa.string())
        return pa.table(cols)

    edges.map_batches(enrich, batch_format="pyarrow").write_json(out_dir)


def write_partitioned(
    ds: ray.data.Dataset, out_dir: str, min_rows_per_file: int = 100_000
) -> None:
    """Parquet sink (S3/S4 analog): a directory of part files, never one
    giant file — the resumability unit (SURVEY.md §4)."""
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
