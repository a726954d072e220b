"""The flagship pipeline: near-duplicate detection + clustering over the
image+caption corpus (BASELINE.json north_star).

Physical plan (all Ray Data, streaming, ONE wide shuffle):

    read_corpus (column-pruned)
      → map_batches(sign)                            # task pool, fuses w/ read
      → map_batches(explode_keys)                    # zero-copy Arrow explode
      → groupby(pkey).map_groups(emit_pairs)         # THE shuffle; min-shared-
                                                     #   key ownership → pairs
                                                     #   globally unique
      → map_batches(verify_batch)                    # task pool, fuses w/ emit
      → union-find (driver or distributed)           # clusters
      → corpus ∪ assignments                         # broadcast lookup (B5)

Design notes (measured on the 190k-row scaling corpus, 16 CPUs):

* Round 1 had a second sort exchange deduplicating pairs (the same pair
  reaches several band buckets). Min-shared-key ownership (see
  ``oracle.owned_pair_mask``) makes each pair survive in exactly one bucket
  — the dedup exchange (~17 s) is gone and verify still sees each pair
  once.
* Signature + verify stages are TASK pools with lazy per-worker-process
  state, not actor pools: their state (seeded hash coefficients, parse
  caches) builds in microseconds, so the actor pool bought nothing and cost
  actor spawn + package import per pipeline run plus an autoscaling ramp
  (measured: signatures 8.7 s actor vs 6.1 s task; verify 13.9 s actor
  machinery vs 4.5 s task kernel). Task pools also let Ray fuse the stage
  with its upstream operator — no extra serialization hop. Actor pools
  remain the right call for genuinely expensive state (see
  ``pipelines/multimodal.py``'s decoders).

Per-stage checkpoints (signatures / edges / clusters) via
``state.checkpoint.run_stage`` when ``ckpt_dir`` is given; resume skips
completed stages (manifest-gated).

Semantics are bit-identical to ``oracle.oracle_match`` at the same
``PipelineConfig`` — asserted by the recall≥0.99 pytest (expected 1.0).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import PipelineConfig, media_pool_size
from ..sources.io import read_corpus
from ..stages.candidates import explode_keys
from ..stages.cluster import cluster_assignments
from ..stages.signer import Signer
from ..stages.verify import emit_pairs, verify_batch
from ..state.checkpoint import fingerprint_input, run_stage

# Per-worker-process Signer cache (task-pool state): hash coefficients and
# the DCT basis build once per worker per config, then serve every batch.
_SIGNERS: dict[str, Signer] = {}


def _signer_for(cfg: PipelineConfig, chash: str) -> Signer:
    s = _SIGNERS.get(chash)
    if s is None:
        s = _SIGNERS[chash] = Signer(cfg)
    return s


def compute_signatures(
    corpus: ray.data.Dataset, cfg: PipelineConfig, with_bytes: bool = False
) -> ray.data.Dataset:
    """Signature stage: task-pool map_batches (fuses with the read), lazy
    per-worker state."""
    chash = cfg.config_hash()
    # batch_size=None → one batch per upstream block. A row-count batch_size
    # makes Ray BUNDLE blocks to reach it, collapsing the 2×CPU read split
    # back to ~corpus_rows/batch_size tasks (measured 9 tasks on 32 CPUs at
    # sf0.1). The bytes path keeps a row cap: image batches are memory-bound.
    return corpus.map_batches(
        lambda t: _signer_for(cfg, chash)(t),
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size if with_bytes else None,
    )


def compute_edges(
    signatures: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int = 64,
    sweep: bool = False,
) -> ray.data.Dataset:
    """Candidate explode → ONE partitioned shuffle → owned unique pairs →
    task-pool verify. No pair-dedup exchange (ownership guarantees global
    pair uniqueness). ``sweep=True`` swaps the verify kernel for the
    α-independent components emitter (``verify_components_batch``) — one
    run then serves the whole α grid."""
    # Ray's sort-based groupby derives its reduce fan-out from the upstream
    # block count; explode would emit few fat blocks on small corpora, which
    # would serialize the shuffle. Instead of paying a separate repartition
    # exchange (round 1's design, ~2 s + an extra barrier), the explode task
    # YIELDS its output pre-split into pkey sub-ranges — deterministic block
    # fan-out with zero extra data movement. The sub-range count is fixed
    # (cluster-size independent: same physical plan at every parallelism
    # level).
    fan = 8

    def explode_fan(batch: pa.Table):
        t = explode_keys(batch, num_partitions)
        pk = t["pkey"]
        step = max(1, num_partitions // fan)
        for lo in range(0, num_partitions, step):
            sel = t.filter(
                pc.and_(
                    pc.greater_equal(pk, pa.scalar(lo, pa.int64())),
                    pc.less(pk, pa.scalar(lo + step, pa.int64())),
                )
            )
            if sel.num_rows:
                yield sel

    candidates = signatures.map_batches(
        explode_fan,
        batch_format="pyarrow",
        batch_size=None,  # per-block batches; see compute_signatures note
    )
    pairs = candidates.groupby("pkey").map_groups(
        lambda g: emit_pairs(g, cfg), batch_format="pyarrow"
    )
    if sweep:
        from ..stages.verify import verify_components_batch

        return pairs.map_batches(
            lambda t: verify_components_batch(t, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    return pairs.map_batches(
        lambda t: verify_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def assignments_to_clusters(
    corpus_ids: ray.data.Dataset,
    assign: dict[str, str] | ray.data.Dataset,
) -> ray.data.Dataset:
    """corpus ids + component assignments → clusters table
    (image_id, cluster_id, cluster_size); singletons cluster with themselves.

    dict assignment (driver union-find result): the map covers only nodes
    incident to a verified edge — a small fraction of the corpus — so it is
    broadcast once via ``ray.put`` and looked up per batch (B5 broadcast
    pattern) with vectorized pandas map (C-speed hash gather), not shuffled.

    Dataset assignment (distributed label propagation): the labels stay a
    Dataset END-TO-END — applied via two coarse-partition exchanges
    (co-group corpus ids with labels on id, then attach sizes by grouping
    on cluster_id), never collected to the driver. This is the path that
    exists precisely because the assignment may not fit driver memory.
    """
    if isinstance(assign, ray.data.Dataset):
        return _apply_assignments_distributed(corpus_ids, assign)
    sizes: dict[str, int] = {}
    for cid in assign.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    ref = ray.put((assign, sizes))

    def apply(batch: pa.Table) -> pa.Table:
        amap, smap = ray.get(ref)
        ids = batch["image_id"].to_pandas()
        cids = ids.map(amap).fillna(ids)
        csz = cids.map(smap).fillna(1).astype("int32")
        return pa.table(
            {
                "image_id": pa.Array.from_pandas(ids, type=pa.string()),
                "cluster_id": pa.Array.from_pandas(cids, type=pa.string()),
                "cluster_size": pa.Array.from_pandas(csz, type=pa.int32()),
            }
        )

    return corpus_ids.map_batches(apply, batch_format="pyarrow")


def _apply_assignments_distributed(
    corpus_ids: ray.data.Dataset, labels: ray.data.Dataset
) -> ray.data.Dataset:
    """corpus ⋈ labels without driver materialization: exchange 1 co-groups
    corpus ids and label rows by hash(id) and resolves each id's cluster
    (label if present, else itself); exchange 2 groups by hash(cluster_id),
    where each partition holds every member of its clusters, so sizes attach
    in the same kernel."""
    from ..stages.cluster import _pkey

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pandas()
        return pa.table(
            {
                "pkey": pa.array(_pkey(ids)),
                "id": t["image_id"],
                "label": pa.nulls(t.num_rows, pa.string()),
            }
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        ids = t["node"].to_pandas()
        return pa.table(
            {
                "pkey": pa.array(_pkey(ids)),
                "id": t["node"],
                "label": t["label"],
            }
        )

    merged = corpus_ids.map_batches(tag_corpus, batch_format="pyarrow").union(
        labels.map_batches(tag_labels, batch_format="pyarrow")
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["label"].notna()].set_index("id")["label"]
        ids = g[g["label"].isna()]["id"]
        cid = ids.map(lab).fillna(ids)
        from ..stages.cluster import _pkey as pk
        return pd.DataFrame(
            {
                "pkey2": pk(cid),
                "image_id": ids.reset_index(drop=True),
                "cluster_id": cid.reset_index(drop=True),
            }
        )

    def attach_sizes(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("cluster_id", sort=False)["image_id"].transform("size")
        return pd.DataFrame(
            {
                "image_id": g["image_id"],
                "cluster_id": g["cluster_id"],
                "cluster_size": sizes.astype("int32"),
            }
        )

    return (
        merged.groupby("pkey")
        .map_groups(resolve, batch_format="pandas")
        .groupby("pkey2")
        .map_groups(attach_sizes, batch_format="pandas")
    )


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
    ``with_bytes=True`` re-decodes every image in the signature stage
    (fidelity path).
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


def psnr_spot_check(
    corpus_path: str,
    edges: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
) -> ray.data.Dataset:
    """Bytes-level fidelity spot check for verified edges (SURVEY.md §2.4
    B3: the ``edges ⋈ corpus`` semi-join): decode ONLY the images that
    appear in a verified pair and validate pHash + PSNR.

    The edge-id set is the small side — broadcast once via ``ray.put`` and
    probed per batch with the Arrow ``is_in`` kernel — so the corpus-side
    ``bytes`` column is decoded for matched rows only (a spot check, not a
    full-corpus validation pass). Returns
    ``(image_id, phash_match:bool, psnr_db:float)``.
    """
    import pyarrow.compute as _pc

    from ..stages.signer import MediaValidator

    cfg = cfg or PipelineConfig()
    ids: set[str] = set()
    for b in edges.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids.update(b["id_a"].to_pylist())
        ids.update(b["id_b"].to_pylist())
    id_ref = ray.put(pa.array(sorted(ids), pa.string()))

    def semi_join(t: pa.Table) -> pa.Table:
        probe = ray.get(id_ref)
        return t.filter(_pc.is_in(t["image_id"], value_set=probe))

    corpus = read_corpus(corpus_path, ["image_id", "bytes", "fmt", "phash"])
    matched = corpus.map_batches(semi_join, batch_format="pyarrow")
    return matched.map_batches(
        MediaValidator,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size,
        concurrency=media_pool_size(),
    )
