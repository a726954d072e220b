"""Incremental dedup: grow an already-deduped corpus with a NEW shard
without reprocessing old×old pairs — the daily-ingestion shape of a 100 TB
corpus (the reference reruns everything from scratch; SURVEY.md §4 names
resume/grow as the engine's obligation).

Plan:

    old signatures  ← the base run's ``signatures`` checkpoint (parquet)
    new signatures  ← compute_signatures over ONLY the new shard
    tag is_new 0/1 → union → the SAME explode → ONE groupby(pkey) →
    emit_pairs drops both-old pairs AFTER ownership   # old×old verified
                                                      # edges already live
                                                      # in the old clusters
    verify (new + cross pairs only)
    union-find seeded with the old cluster assignment (each old row
    contributes the edge ``cluster_id → image_id``) ∪ new passing edges
    → clusters over ALL ids (old ∪ new)

Equivalence contract (pytest-pinned): the incremental result equals the
full-batch run over old ∪ new EXACTLY whenever bucket hotness
classification is unchanged by the growth — i.e. no bucket crosses
``max_bucket`` because of the new shard. When a bucket does cross, the
full run's digest refinement may generate a slightly different old×old
pair set than the base run did (the standard incremental-LSH caveat);
connectivity from the base run is preserved either way, so incremental
recall never drops below the base run's.

Why this is the 100 TB path: per ingestion batch the exchange volume is
O(old signatures + new shard), not O(old corpus) — signatures are ~200 B
per doc vs multi-KB payloads, the old corpus' bytes/captions are never
re-read, and old×old pairs (the quadratic bulk of a mostly-old corpus)
are never re-verified.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import PipelineConfig
from ..sources.io import read_corpus
from ..stages.cluster import cluster_assignments
from .dedup import assignments_to_clusters, compute_edges, compute_signatures


def _tag(ds: ray.data.Dataset, flag: int) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: t.append_column(
            "is_new", pa.array([bool(flag)] * t.num_rows, pa.bool_())
        ),
        batch_format="pyarrow",
    )


def incremental_dedup_pipeline(
    old_ckpt_dir: str,
    new_corpus_path: str,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 64,
    ckpt_dir: str | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Returns (new_edges, clusters_over_all_ids).

    ``old_ckpt_dir`` must hold a completed base run (``dedup_pipeline(...,
    ckpt_dir=...)``): its ``signatures`` and ``clusters`` stages are the
    only state consumed — the old corpus itself is never re-read.

    ``ckpt_dir`` (optional) makes the growth CHAINABLE: the run writes its
    own ``signatures`` stage (old ∪ new, untagged — the same schema a base
    run writes) and ``clusters`` stage there, so the NEXT ingestion batch
    points its ``old_ckpt_dir`` at this run's ``ckpt_dir`` — the daily
    ingestion loop, each day touching only its own shard.
    """
    from ..state.checkpoint import join_path, read_json

    cfg = cfg or PipelineConfig()
    sig_dir = join_path(old_ckpt_dir, "signatures")
    clu_dir = join_path(old_ckpt_dir, "clusters")
    # pyarrow.fs-routed manifest read: old_ckpt_dir may be local or s3://
    m = read_json(join_path(sig_dir, "_manifest.json"))
    if m is None or read_json(join_path(clu_dir, "_manifest.json")) is None:
        raise FileNotFoundError(
            f"incremental_dedup_pipeline needs a completed base run under "
            f"{old_ckpt_dir} (signatures/ and clusters/ stages)"
        )
    if m.get("config_hash") != cfg.config_hash() or not m.get("complete"):
        raise ValueError(
            "base-run signatures were produced under a different "
            "PipelineConfig (or are incomplete) — incremental growth "
            "requires identical semantic knobs"
        )
    old_sigs = ray.data.read_parquet(sig_dir)
    old_clusters = ray.data.read_parquet(clu_dir)

    cols = ["image_id", "caption", "phash"]
    new_sigs = compute_signatures(read_corpus(new_corpus_path, cols), cfg)
    sigs = _tag(old_sigs, 0).union(_tag(new_sigs, 1))

    # is_new rides through explode; emit_pairs drops both-old pairs
    edges_new = compute_edges(sigs, cfg, num_partitions).materialize()

    passing = edges_new.map_batches(
        lambda t: t.filter(pc.equal(t["pass"], True)), batch_format="pyarrow"
    ).select_columns(["id_a", "id_b"])

    # seed edges: every old non-singleton row is an edge cluster_id→image_id
    # (cluster_id = the component's min id, so id order is already canonical)
    def seed(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(t["cluster_size"], pa.scalar(1, pa.int32())),
            pc.not_equal(t["image_id"], t["cluster_id"]),
        )
        f = t.filter(keep)
        return pa.table({"id_a": f["cluster_id"], "id_b": f["image_id"]})

    seed_edges = old_clusters.map_batches(seed, batch_format="pyarrow")
    assign = cluster_assignments(seed_edges.union(passing), cfg)

    all_ids = old_clusters.select_columns(["image_id"]).union(
        read_corpus(new_corpus_path, ["image_id"])
    )
    if ckpt_dir is None:
        clusters = assignments_to_clusters(all_ids, assign)
        return edges_new, clusters

    # chainable mode: persist this increment's combined signatures and
    # clusters with the SAME stage layout a base run writes, so the next
    # batch consumes this directory as its old_ckpt_dir
    from ..state.checkpoint import fingerprint_input, run_stage

    fprint = m["input_fingerprint"] + ":" + fingerprint_input(new_corpus_path)
    combined_sigs = old_sigs.union(new_sigs)
    run_stage(
        ckpt_dir, "signatures", cfg.config_hash(), fprint,
        lambda: combined_sigs,
    )
    clusters = run_stage(
        ckpt_dir, "clusters", cfg.config_hash(), fprint,
        lambda: assignments_to_clusters(all_ids, assign),
    )
    return edges_new, clusters


def split_corpus(corpus_dir: str, frac: float = 0.6) -> tuple[str, str, str]:
    """Split a corpus dir into base (first ``frac`` of rows) and growth
    shards under /tmp (fixture plumbing for the incremental query/tests —
    the driver-side concat is test-scale only). Cached per corpus dir.
    Returns (base_dir, grow_dir, work_dir)."""
    import pyarrow.parquet as pq

    parts = sorted(
        f for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    work = os.path.join(
        "/tmp/edh_ray_incremental",
        os.path.basename(os.path.dirname(corpus_dir.rstrip("/")))
        + f"_{len(parts)}",
    )
    base_dir = os.path.join(work, "base")
    grow_dir = os.path.join(work, "grow")
    if not os.path.exists(os.path.join(work, "_split_done")):
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(base_dir)
        os.makedirs(grow_dir)
        t = pa.concat_tables(
            [pq.read_table(os.path.join(corpus_dir, f)) for f in parts]
        )
        cut = max(1, int(t.num_rows * frac))
        pq.write_table(
            t.slice(0, cut), os.path.join(base_dir, "part-0.parquet")
        )
        pq.write_table(
            t.slice(cut), os.path.join(grow_dir, "part-0.parquet")
        )
        open(os.path.join(work, "_split_done"), "w").write("ok")
    return base_dir, grow_dir, work


def incremental_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Driver query: split the sf corpus into a 60% base shard and a 40%
    growth shard, run the base pipeline with checkpoints, then ingest the
    growth shard incrementally. Returns the combined clusters table (the
    equivalence pytest asserts it equals the full-batch run)."""
    from .corpus_dedup import corpus_for_sf
    from .dedup import dedup_pipeline

    cfg = PipelineConfig()
    corpus_dir, _ = corpus_for_sf(sf_dir)
    base_dir, grow_dir, work = split_corpus(corpus_dir)
    ckpt_dir = os.path.join(work, "ckpt")

    edges, clusters = dedup_pipeline(base_dir, cfg, ckpt_dir=ckpt_dir)
    clusters.count()  # drive the base run to completion (writes checkpoints)
    _, combined = incremental_dedup_pipeline(ckpt_dir, grow_dir, cfg)
    out = combined.to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Corpus version diff — the dataset-versioning primitive underneath
# incremental ingestion: given two corpus versions, classify every doc_id
# as added / removed / changed / unchanged by CONTENT (128-bit
# fingerprints), so an ingestion run can process exactly the delta. The
# driver-facing query derives version 2 from the corpus deterministically
# (the record_linkage in-query-derivation pattern): drop doc_id % 10 == 0,
# append " v2" to the text of doc_id % 7 == 3, add a copy of
# doc_id % 13 == 1 under doc_id + (max doc_id + 1) — an id namespace
# provably disjoint from the corpus at any scale.


def corpus_diff(sf_dir: str, num_partitions: int = 32) -> pd.DataFrame:
    """Return ``(doc_id, status)`` for every doc_id present in either
    version, status in {added, removed, changed, unchanged}.

    Scale shape: ONE read produces BOTH sides' rows (version 2 is a
    per-row deterministic derivation; with a real second corpus this is
    two pruned reads), text is fingerprinted in the mapper, and only
    40-byte ``(pkey, doc_id, side, h1, h2)`` rows ride the single
    ``groupby(doc_id % P)`` exchange — the diff kernel is one lexsort +
    boundary scan per partition. Text never shuffles; output streams.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions import text as tx
    from ..functions.frames import ensure_cols

    P = num_partitions
    # Collision-free id namespace for the derived "added" docs: offset =
    # global max doc_id + 1 (ONE tiny aggregate over the pruned id
    # column; the oracle's MAX() CTE is the same scan). A fixed offset
    # like 1e6 would collide with real ids at scale and silently corrupt
    # the per-doc group cardinality the diff kernel relies on.
    from ray.data.aggregate import Max

    mx = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).aggregate(Max("doc_id"))
    if mx is None or mx.get("max(doc_id)") is None:
        return ensure_cols(pd.DataFrame(), doc_id="int64", status="object")
    offset = int(mx["max(doc_id)"]) + 1

    def rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = t["text"]
        h1o, h2o = tx.content_fingerprint128(txt.to_pylist())
        # version 2: drop %10==0, modify %7==3, add %13==1 under id+offset
        keep = ids % 10 != 0
        modk = (ids % 7 == 3)[keep]  # modified rows, in kept order
        # new-side fingerprints: copy the old ones, re-hash ONLY the
        # modified texts (~1/7 of the corpus) — not every kept document
        h1m, h2m = h1o[keep].copy(), h2o[keep].copy()
        kept_txt = txt.filter(pa.array(keep))
        if modk.any():
            mtxt = pc.binary_join_element_wise(
                kept_txt.filter(pa.array(modk)),
                pa.array(["v2"] * int(modk.sum())),
                " ",
            )
            h1mm, h2mm = tx.content_fingerprint128(mtxt.to_pylist())
            pos = np.flatnonzero(modk)
            h1m[pos] = h1mm
            h2m[pos] = h2mm
        add = ids % 13 == 1
        side = np.concatenate(
            [
                np.zeros(len(ids), np.int64),          # old
                np.ones(int(keep.sum()), np.int64),    # new (kept/modified)
                np.ones(int(add.sum()), np.int64),     # new (added)
            ]
        )
        all_ids = np.concatenate(
            [ids, ids[keep], ids[add] + offset]
        )
        h1 = np.concatenate([h1o, h1m, h1o[add]])
        h2 = np.concatenate([h2o, h2m, h2o[add]])
        return pa.table(
            {
                "pkey": pa.array(
                    (all_ids.view(np.uint64) % np.uint64(P)).astype(np.int64)
                ),
                "doc_id": pa.array(all_ids),
                "side": pa.array(side),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
            }
        )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d = g["doc_id"].to_numpy()
        s = g["side"].to_numpy()
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        o = np.lexsort((s, d))
        d, s, h1, h2 = d[o], s[o], h1[o], h2[o]
        new_doc = np.ones(len(d), dtype=bool)
        new_doc[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new_doc)
        counts = np.diff(np.append(starts, len(d)))
        uid = d[starts]
        status = np.empty(len(starts), dtype=object)
        both = counts == 2
        solo = ~both
        solo_new = solo & (s[starts] == 1)
        status[solo & ~solo_new] = "removed"
        status[solo_new] = "added"
        # both present (old sorted first): changed iff fingerprints differ
        i_old = starts[both]
        same = (h1[i_old] == h1[i_old + 1]) & (h2[i_old] == h2[i_old + 1])
        b_idx = np.flatnonzero(both)
        status[b_idx[same]] = "unchanged"
        status[b_idx[~same]] = "changed"
        return pd.DataFrame({"doc_id": uid, "status": status})

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(diff, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", status="object")
    return out.sort_values("doc_id").reset_index(drop=True)
