"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the baseline: the query matrix is broadcast once
via ``ray.put`` and every batch does one numpy matmul — no shuffle, linear
scan, embarrassingly parallel. The LSH-bucketed variant is the scale path:
random-hyperplane signs bucket the corpus so each query probes only its
bucket (documented approximation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _emb(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _stack(col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def brute_force_cosine_topk(
    sf_dir: str, n_queries: int = 3, k: int = 5
) -> pd.DataFrame:
    """Exact cosine top-k: queries = the ``n_queries`` lowest vec_ids.

    Returns (query_id, vec_id, cos_sim) — self-matches excluded; cos_sim
    rounded to 6 dp so the DuckDB oracle (float64 on the same lists)
    hash-compares exactly.
    """
    ds = _emb(sf_dir)
    qrows = ds.sort("vec_id").limit(n_queries).to_pandas()
    Q = _stack(qrows["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qrows["vec_id"].to_numpy()
    ref = ray.put((qids, Qn))

    def score(t: pa.Table) -> pa.Table:
        qids_, Qn_ = ray.get(ref)
        V = _stack(t["embedding"].to_pylist())
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Qn_.T  # (batch, nq)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        nq = len(qids_)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids_, len(vid)), pa.int64()),
                "vec_id": pa.array(np.tile(vid, nq), pa.int64()),
                "cos_sim": pa.array(sims.T.ravel(), pa.float64()),
            }
        )

    def topk_per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["vec_id"] != g["query_id"]]
        return g.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        ).head(k)

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk_per_query, batch_format="pandas")
        .to_pandas()
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def lsh_bucketed_topk(
    sf_dir: str,
    n_queries: int = 3,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets; each query scans
    only vectors sharing its sign-bucket (plus the query rows themselves).
    The scale path for 10^9+ vectors — per-bucket scan instead of full scan.
    Returns (query_id, vec_id, cos_sim) with the same schema as brute force.
    """
    ds = _emb(sf_dir)
    qrows = ds.sort("vec_id").limit(n_queries).to_pandas()
    Q = _stack(qrows["embedding"])
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (Q @ planes > 0).astype(np.uint8)
    qbucket = np.packbits(qsig, axis=1, bitorder="little")[:, 0]
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qrows["vec_id"].to_numpy()
    ref = ray.put((qids, Qn, planes, qbucket))

    def score(t: pa.Table) -> pa.Table:
        qids_, Qn_, planes_, qbucket_ = ray.get(ref)
        V = _stack(t["embedding"].to_pylist())
        sig = (V @ planes_ > 0).astype(np.uint8)
        bucket = np.packbits(sig, axis=1, bitorder="little")[:, 0]
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        q_out, v_out, s_out = [], [], []
        for qi, qb in enumerate(qbucket_):
            mask = bucket == qb
            if not mask.any():
                continue
            sims = Vn[mask] @ Qn_[qi]
            q_out.extend([qids_[qi]] * int(mask.sum()))
            v_out.extend(vid[mask].tolist())
            s_out.extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(q_out, pa.int64()),
                "vec_id": pa.array(v_out, pa.int64()),
                "cos_sim": pa.array(s_out, pa.float64()),
            }
        )

    def topk_per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["vec_id"] != g["query_id"]]
        return g.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        ).head(k)

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk_per_query, batch_format="pandas")
        .to_pandas()
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def embedding_near_dup_pairs(
    sf_dir: str, threshold: float = 0.98, n_planes: int = 12, seed: int = 42
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets →
    within-bucket exact cosine ≥ threshold. Returns (id_a, id_b, cos_sim)."""
    ds = _emb(sf_dir)
    rows = ds.to_pandas()
    V = _stack(rows["embedding"])
    ids = rows["vec_id"].to_numpy()
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((V.shape[1], n_planes))
    bucket = np.packbits((V @ planes > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0].astype(np.int64)
    # note: driver-side at fixture scale; the Ray path buckets via
    # map_batches + groupby(bucket) identically (see lsh_bucketed_topk)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = []
    for b in np.unique(bucket):
        idx = np.nonzero(bucket == b)[0]
        if len(idx) < 2:
            continue
        sims = Vn[idx] @ Vn[idx].T
        ii, jj = np.nonzero(np.triu(sims >= threshold, 1))
        for i, j in zip(ii, jj):
            a, c = sorted((int(ids[idx[i]]), int(ids[idx[j]])))
            out.append((a, c, round(float(sims[i, j]), 6)))
    return (
        pd.DataFrame(out, columns=["id_a", "id_b", "cos_sim"])
        .drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
