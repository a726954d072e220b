"""Clustering: union-find over verified edges → cluster assignments
(SURVEY.md §7 step 5).

Two physical paths with identical semantics (cluster_id = MIN image_id of the
connected component — deterministic):

* **driver path** — when the edge count is below
  ``cfg.driver_uf_max_edges``: stream edge batches to the driver and run
  C-speed union-find with path compression. Edges are the *verified
  duplicates*, orders of magnitude smaller than the corpus, so this bound is
  generous in practice (2M edges ≈ 100 MB driver RAM).
* **distributed path** — iterative min-label propagation over Ray Datasets
  (the Hash-Min variant of the MapReduce connected-components family,
  Rastogi et al. 2013): each round ships every node's current label to its
  neighbors via one ``groupby(node)`` shuffle and takes the elementwise
  min. Converges in O(component diameter) rounds; near-dup components have
  tiny diameter because hot buckets emit star edges. Rounds stop at a
  fixpoint detected by comparing label-multiset signatures.

The assignment covers only nodes that appear in edges; singleton rows get
``cluster_id = image_id`` when the assignment is applied to the corpus
(``pipelines/dedup.py``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from ..config import PipelineConfig
from ..state.unionfind import UnionFind


def cluster_edges_driver(edges: ray.data.Dataset) -> dict[str, str]:
    """Union-find on the driver over streamed edge batches."""
    uf = UnionFind()
    for batch in edges.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            uf.union(a, b)
    return uf.assignments()


def cluster_edges_adaptive(
    edges: ray.data.Dataset, max_edges: int
) -> dict[str, str] | ray.data.Dataset:
    """ONE streaming pass: union edges on the driver while counting; if the
    stream exceeds ``max_edges``, abandon the partial union-find and fall
    back to the distributed path. Saves the separate ``count()`` execution
    of the edge pipeline that the two-phase decision cost (the common case —
    verified edges ≪ corpus — pays exactly one pass)."""
    uf = UnionFind()
    n = 0
    for batch in edges.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        n += batch.num_rows
        if n > max_edges:
            return cluster_edges_distributed(edges)
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            uf.union(a, b)
    return uf.assignments()


def cluster_edges_distributed(
    edges: ray.data.Dataset, max_rounds: int = 50
) -> ray.data.Dataset:
    """Hash-to-min label propagation. Returns Dataset(node, label).

    Each round: labels ∪ bidirectional edges → groupby(node) → per node the
    min incident label; then one more groupby round propagates the new min
    back across edges. Terminates when no label changes.
    """
    # seed labels: every node labels itself; bidirectional edge list reused
    # across rounds (it is the static topology)
    def to_bidir(batch: pa.Table) -> pa.Table:
        a, b = batch["id_a"], batch["id_b"]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [c.combine_chunks() for c in (a, b)]
                ),
                "nbr": pa.concat_arrays(
                    [c.combine_chunks() for c in (b, a)]
                ),
            }
        )

    bidir = edges.map_batches(to_bidir, batch_format="pyarrow").materialize()
    labels = (
        bidir.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda t: t.set_column(
                1,
                "label",
                pa.chunked_array(
                    [
                        pa.compute.min_element_wise(t["label"], t["node"])
                    ]
                ),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_rounds):
        # join labels onto edges by node → messages (nbr, label)
        def join_and_emit(group: pd.DataFrame) -> pd.DataFrame:
            lab = group["label"].dropna()
            if lab.empty:
                return pd.DataFrame({"node": [], "label": []})
            lbl = lab.min()
            nbrs = group["nbr"].dropna()
            node = group["node"].iloc[0]
            out_nodes = list(nbrs) + [node]
            return pd.DataFrame(
                {"node": out_nodes, "label": [lbl] * len(out_nodes)}
            )

        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "nbr": pa.nulls(t.num_rows, pa.string()),
                    "label": t["label"],
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = bidir.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "nbr": t["nbr"],
                    "label": pa.nulls(t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        merged = lab_rows.union(edge_rows)
        new_labels = (
            merged.groupby("node")
            .map_groups(join_and_emit, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # fixpoint check: compare label multisets cheaply via sum of hashes
        old_sig = _label_signature(labels)
        new_sig = _label_signature(new_labels)
        labels = new_labels
        if old_sig == new_sig:
            break
    return labels


def _label_signature(labels: ray.data.Dataset) -> int:
    import zlib

    def h(batch: pa.Table) -> pa.Table:
        vals = [
            zlib.crc32(f"{n}\0{l}".encode())
            for n, l in zip(
                batch["node"].to_pylist(), batch["label"].to_pylist()
            )
        ]
        return pa.table({"h": pa.array([sum(vals) & 0xFFFFFFFFFFFF], pa.int64())})

    return sum(
        b["h"][0].as_py()
        for b in labels.map_batches(h, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )


def cluster_assignments(
    edges: ray.data.Dataset, cfg: PipelineConfig
) -> dict[str, str] | ray.data.Dataset:
    """Choose the physical path by edge count (decided mid-stream — no
    separate count pass). dict → driver path; Dataset(node,label) →
    distributed path."""
    return cluster_edges_adaptive(edges, cfg.driver_uf_max_edges)
