"""The flagship pipeline: near-duplicate detection + clustering over the
image+caption corpus (BASELINE.json north_star).

Physical plan (all Ray Data, streaming):

    read_corpus (column-pruned)
      → map_batches(Signer, concurrency=K)          # stateful actor pool
      → map_batches(explode_keys)                   # zero-copy Arrow explode
      → groupby(pkey).map_groups(emit_and_verify)   # THE shuffle + verify
      → groupby(id_a,id_b).first                    # edge dedup (A5)
      → union-find (driver or distributed)          # clusters
      → corpus ∪ assignments                        # broadcast lookup (B5)

Per-stage checkpoints (signatures / edges / clusters) via
``state.checkpoint.run_stage`` when ``ckpt_dir`` is given; resume skips
completed stages (manifest-gated).

Semantics are bit-identical to ``oracle.oracle_match`` at the same
``PipelineConfig`` — asserted by the recall≥0.99 pytest (expected 1.0).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import PipelineConfig
from ..sources.io import read_corpus
from ..stages.candidates import explode_keys
from ..stages.cluster import cluster_assignments
from ..stages.signer import Signer
from ..stages.verify import VerifyPairs, emit_pairs
from ..state.checkpoint import fingerprint_input, run_stage


def _cluster_cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def compute_signatures(
    corpus: ray.data.Dataset, cfg: PipelineConfig, with_bytes: bool = False
) -> ray.data.Dataset:
    """Signature stage: actor pool, zero-copy Arrow batches."""
    return corpus.map_batches(
        Signer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size if with_bytes else cfg.batch_size,
        # autoscaling pool sized to the cluster: start quarter-provisioned so
        # the pool is productive immediately (ramping from 1 actor wastes a
        # large slice of short runs), cap at all CPUs, and always leave the
        # read stage at least one free CPU on small clusters
        concurrency=(max(1, _cluster_cpus() // 4), _cluster_cpus()),
    )


def compute_edges(
    signatures: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Candidate explode → partitioned bucket verify → deduped edges."""
    candidates = signatures.map_batches(
        lambda t: explode_keys(t, num_partitions),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    # Ray's sort-based groupby inherits the upstream block count as its
    # partition count; explode emits few fat blocks, which would serialize
    # the shuffle+verify stages — split first so the wide stages fan out.
    # The fan-out is the PARTITION count (fixed, cluster-size independent:
    # same physical plan at every parallelism level), not a CPU multiple.
    shuffle_parallelism = num_partitions
    candidates = candidates.repartition(shuffle_parallelism)
    pairs = candidates.groupby("pkey").map_groups(
        lambda g: emit_pairs(g, cfg), batch_format="pyarrow"
    )

    # A5: exact dedup of pairs before verification — duplicate rows (same
    # pair reached via several key families/partitions) are byte-identical,
    # so keeping any one per (id_a, id_b) is deterministic. Hash-partition
    # on the pair key (cheap numeric image_id prefix), then ONE vectorized
    # drop_duplicates per partition — no per-group Python (a bare
    # groupby(pair).aggregate measured 30x slower at 10^5 groups).
    def add_pair_pkey(t: pa.Table) -> pa.Table:
        # Knuth multiplicative mix of both id prefixes — duplicate pairs
        # have CONSECUTIVE numeric ids, so any linear key (31a+b mod P)
        # collapses them onto ~2 partitions (measured 4x straggler)
        pk = [
            ((int(a[:8], 10) * 2654435761) ^ (int(b[:8], 10) * 2246822519))
            % num_partitions
            if a[:8].isdigit() and b[:8].isdigit()
            else hash((a, b)) % num_partitions
            for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())
        ]
        return t.append_column("pair_pkey", pa.array(pk, pa.int64()))

    import pandas as pd

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        # sort by id_a: downstream verify batches then see contiguous id_a
        # runs, so the actor-level doc-feature cache hits instead of
        # rebuilding features for randomly scattered docs
        return (
            df.drop_duplicates(["id_a", "id_b"])
            .sort_values(["id_a", "id_b"])
            .drop(columns=["pair_pkey"])
        )

    unique_pairs = (
        pairs.map_batches(add_pair_pkey, batch_format="pyarrow")
        .repartition(shuffle_parallelism)
        .groupby("pair_pkey")
        .map_groups(dedup_partition, batch_format="pandas")
    )
    # actor pool sized to the cluster: the actor holds a cross-batch per-doc
    # feature cache (a doc's parse + histograms are computed once per actor,
    # not once per batch it appears in)
    return unique_pairs.map_batches(
        VerifyPairs,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(max(1, _cluster_cpus() // 4), _cluster_cpus()),
    )


def assignments_to_clusters(
    corpus_ids: ray.data.Dataset,
    assign: dict[str, str] | ray.data.Dataset,
) -> ray.data.Dataset:
    """corpus ids + component assignments → clusters table
    (image_id, cluster_id, cluster_size); singletons cluster with themselves.

    The assignment map covers only nodes incident to a verified edge —
    a small fraction of the corpus — so it is broadcast once via ``ray.put``
    and looked up per batch (B5 broadcast pattern), not shuffled.
    """
    if isinstance(assign, ray.data.Dataset):
        rows = assign.take_all()  # distributed path result; see docstring
        assign = {r["node"]: r["label"] for r in rows}
    sizes: dict[str, int] = {}
    for cid in assign.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    ref = ray.put((assign, sizes))

    def apply(batch: pa.Table) -> pa.Table:
        amap, smap = ray.get(ref)
        ids = batch["image_id"].to_pylist()
        cids = [amap.get(i, i) for i in ids]
        csz = [smap.get(c, 1) for c in cids]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_id": pa.array(cids, pa.string()),
                "cluster_size": pa.array(csz, pa.int32()),
            }
        )

    return corpus_ids.map_batches(apply, batch_format="pyarrow")


def dedup_pipeline(
    corpus_path: str,
    cfg: PipelineConfig | None = None,
    ckpt_dir: str | None = None,
    with_bytes: bool = False,
    num_partitions: int = 64,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """End-to-end: returns (edges, clusters) datasets.

    ``with_bytes=False`` prunes the wide ``bytes`` column at the read and
    trusts the corpus ``phash`` column (the production fast path);
    ``with_bytes=True`` re-decodes every image in the Signer (fidelity path).
    """
    cfg = cfg or PipelineConfig()
    chash = cfg.config_hash()
    fprint = fingerprint_input(corpus_path)
    cols = None if with_bytes else ["image_id", "caption", "phash"]

    signatures = run_stage(
        ckpt_dir,
        "signatures",
        chash,
        fprint,
        lambda: compute_signatures(read_corpus(corpus_path, cols), cfg, with_bytes),
    )
    edges = run_stage(
        ckpt_dir,
        "edges",
        chash,
        fprint,
        lambda: compute_edges(signatures, cfg, num_partitions),
    )
    if ckpt_dir is None:
        # edges is the small verified-pair set; pin it so the count / the
        # union-find scan / downstream consumption don't re-execute the whole
        # upstream DAG (with a ckpt_dir the parquet checkpoint plays this role)
        edges = edges.materialize()
    passing = edges.map_batches(
        lambda t: t.filter(pc.equal(t["pass"], True)), batch_format="pyarrow"
    )
    assign = cluster_assignments(passing, cfg)
    corpus_ids = read_corpus(corpus_path, ["image_id"])
    clusters = run_stage(
        ckpt_dir,
        "clusters",
        chash,
        fprint,
        lambda: assignments_to_clusters(corpus_ids, assign),
    )
    return edges, clusters
