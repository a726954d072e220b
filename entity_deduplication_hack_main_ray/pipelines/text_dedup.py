"""Deduplication pipelines over the ``documents`` table — the text-side
members of the engine's dedup family (exact, MinHash+LSH, SimHash, n-gram
Jaccard). The image+caption flagship lives in ``pipelines/dedup.py``; these
reuse the same hashing kernels over plain text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..functions.hashing import (
    band_keys,
    hamming64,
    minhash_from_stream,
    minhash_params,
    shingle_hash_stream,
    shingle_hashes,
    signature_digest,
    simhash_from_stream,
)
from ..state.unionfind import UnionFind


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup (hash-partition + per-group first, A5): one row per
    distinct text with the minimum doc_id as representative.

    The groupby key is the text itself (Ray hash-partitions it); at 100TB a
    64-bit content hash column would be grouped instead with a tiny
    collision-check — semantics identical for the test corpus.
    """

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(1)

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .groupby("text")
        .map_groups(keep_min, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]


class DocSigner:
    """Actor-pool signature stage for plain documents (MinHash + SimHash +
    band keys), sharing the corpus Signer's kernels and seeding."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.a, self.b = minhash_params(cfg.num_perm, cfg.seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        c = self.cfg
        texts = t["text"].to_pylist()
        stream, offsets = shingle_hash_stream(
            [s.lower() for s in texts], c.shingle_k, c.seed
        )
        sigs = minhash_from_stream(stream, offsets, self.a, self.b)
        simhash = simhash_from_stream(stream, offsets)
        bk = band_keys(sigs, c.bands, c.rows, c.seed).view(np.int64)
        list_offsets = pa.array(
            np.arange(0, (len(texts) + 1) * c.bands, c.bands, dtype=np.int32)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "digest": pa.array(
                    signature_digest(sigs).view(np.int64), pa.int64()
                ),
                "simhash": pa.array(simhash.view(np.int64), pa.int64()),
                "keys": pa.ListArray.from_arrays(
                    list_offsets, pa.array(bk.ravel(), pa.int64())
                ),
            }
        )


def minhash_lsh_dedup(sf_dir: str, cfg: PipelineConfig | None = None) -> pd.DataFrame:
    """MinHash+LSH near-dedup (shingle→minhash→band→bucket-groupby):
    returns (doc_id, cluster_id) with cluster_id = min doc_id of the
    connected component over same-bucket identical-digest pairs.

    Candidate pairs here use digest equality (full-signature match) as the
    pass rule — the documents table has no verification payload column; the
    full verified pipeline is the corpus flagship.
    """
    cfg = cfg or PipelineConfig()
    signed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        DocSigner,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    P = 64  # coarse shuffle partitions (see stages/candidates.py rationale)

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = t["keys"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        parent = pc.list_parent_indices(keys)
        sel = t.select(["doc_id", "digest"]).take(parent)
        flat = keys.flatten()
        pkey = flat.to_numpy(zero_copy_only=False).view(np.uint64) % np.uint64(P)
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64)),
                "band_key": flat,
                "doc_id": sel["doc_id"],
                "digest": sel["digest"],
            }
        )

    def partition_pairs(g: pa.Table) -> pa.Table:
        """All buckets of one coarse partition, regrouped vectorized: emit
        (min_doc → other) star pairs within same-(bucket, digest) groups."""
        band = g["band_key"].to_numpy(zero_copy_only=False)
        dig = g["digest"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dig, band))
        b_s, d_s, i_s = band[order], dig[order], ids[order]
        new_grp = np.concatenate(
            [[True], (np.diff(b_s) != 0) | (np.diff(d_s) != 0)]
        )
        grp_id = np.cumsum(new_grp) - 1
        firsts = i_s[new_grp][grp_id]  # min doc_id of each group, broadcast
        mask = (firsts != i_s)
        a_out, b_out = firsts[mask], i_s[mask]
        keep = a_out != b_out
        return pa.table(
            {
                "id_a": pa.array(a_out[keep], pa.int64()),
                "id_b": pa.array(b_out[keep], pa.int64()),
            }
        )

    edges = (
        signed.map_batches(explode, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    uf = UnionFind()
    for a, b in zip(edges["id_a"], edges["id_b"]):
        uf.union(str(int(a)), str(int(b)))
    assign = {int(k): int(v) for k, v in uf.assignments().items()}
    ids = _docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"]
    out = pd.DataFrame(
        {
            "doc_id": ids,
            "cluster_id": [assign.get(int(i), int(i)) for i in ids],
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def simhash_signatures_table(sf_dir: str, cfg: PipelineConfig | None = None) -> pd.DataFrame:
    """Per-doc 64-bit SimHash (near-dup signature family #2)."""
    cfg = cfg or PipelineConfig()
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            DocSigner,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .select_columns(["doc_id", "simhash"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, cfg: PipelineConfig | None = None
) -> pd.DataFrame:
    """n-gram Jaccard near-dup pairs: LSH candidates → exact shingle-set
    Jaccard verification ≥ threshold. Returns (id_a, id_b, jaccard).

    The exact Jaccard is computed only for LSH candidates (never all pairs);
    shingle sets for the candidate docs are recomputed per partition — at
    100TB they would be carried through the shuffle like the corpus captions.
    """
    cfg = cfg or PipelineConfig()
    docs = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))

    signed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        DocSigner,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    P = 64

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = t["keys"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        parent = pc.list_parent_indices(keys)
        sel = t.select(["doc_id"]).take(parent)
        flat = keys.flatten()
        pkey = flat.to_numpy(zero_copy_only=False).view(np.uint64) % np.uint64(P)
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64)),
                "band_key": flat,
                "doc_id": sel["doc_id"],
            }
        )

    def partition_pairs(g: pa.Table) -> pa.Table:
        band = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, band))
        b_s, i_s = band[order], ids[order]
        bounds = np.nonzero(np.diff(b_s))[0] + 1
        a_out, b_out = [], []
        for s, e in zip(
            np.concatenate([[0], bounds]), np.concatenate([bounds, [len(b_s)]])
        ):
            mem = np.unique(i_s[s:e])
            if len(mem) < 2 or len(mem) > 256:
                continue
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    a_out.append(int(mem[i]))
                    b_out.append(int(mem[j]))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
            }
        )

    cand = (
        signed.map_batches(explode, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    rows = []
    shingle_cache: dict[int, set] = {}

    def sh(doc_id: int) -> set:
        s = shingle_cache.get(doc_id)
        if s is None:
            s = shingle_cache[doc_id] = set(
                shingle_hashes(texts[doc_id].lower(), cfg.shingle_k, cfg.seed)
                .tolist()
            )
        return s

    for a, b in zip(cand["id_a"], cand["id_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            rows.append((int(a), int(b), j))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_near_pairs(
    sf_dir: str, max_hamming: int = 3, cfg: PipelineConfig | None = None
) -> pd.DataFrame:
    """SimHash near-dup pairs: bucket by 16-bit SimHash chunks, verify by
    full Hamming distance ≤ max_hamming."""
    cfg = cfg or PipelineConfig()
    sims = simhash_signatures_table(sf_dir, cfg)
    ids = sims["doc_id"].to_numpy()
    sh = sims["simhash"].to_numpy().view(np.uint64)
    # 4 chunk bands — pairs at hamming ≤ 3 share ≥ 1 chunk (pigeonhole)
    rows = set()
    for band in range(4):
        chunk = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        sc = chunk[order]
        bounds = np.nonzero(np.diff(sc))[0] + 1
        for s, e in zip(
            np.concatenate([[0], bounds]), np.concatenate([bounds, [len(sc)]])
        ):
            if e - s < 2 or e - s > 512:
                continue
            members = order[s:e]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    mi, mj = members[i], members[j]
                    if int(hamming64(sh[mi : mi + 1], sh[mj : mj + 1])[0]) <= max_hamming:
                        a, b = sorted((int(ids[mi]), int(ids[mj])))
                        rows.add((a, b))
    out = pd.DataFrame(sorted(rows), columns=["id_a", "id_b"])
    return out
