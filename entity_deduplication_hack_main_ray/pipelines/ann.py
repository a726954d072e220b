"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the baseline: the query matrix is broadcast once
via ``ray.put`` and every batch does one numpy matmul plus a PER-BATCH partial
top-k, so only ``n_queries * k`` rows leave each batch — no shuffle at all,
the driver merges a few hundred candidate rows. The LSH-bucketed variant is
the scale path: random-hyperplane signs bucket the corpus so each query
probes only its bucket. ``embedding_near_dup_pairs`` is fully distributed:
bucket assignment in ``map_batches``, within-bucket exact cosine in
``groupby(bucket).map_groups`` (each vector lives in exactly one bucket, so
the pair set needs no dedup exchange).

Scores are emitted as integer ``cos_sim_e6 = floor(cos * 1e6 + 0.5)`` — the
one rounding rule shared with the DuckDB oracle SQL — so value hashes cannot
diverge on float rounding mode (round-half-even vs half-away) or summation
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.frames import ensure_cols, typed_empty


def _emb(sf_dir: str) -> ray.data.Dataset:
    # label column pruned at the read: every ANN query needs only id+vector
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _stack(col) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix, zero-copy when the
    list is rectangular (single flat buffer + constant stride)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        offsets = (
            None
            if isinstance(col, pa.FixedSizeListArray)
            else np.diff(col.offsets.to_numpy())
        )
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if offsets is None:
            return flat.reshape(len(col), -1).astype(np.float64, copy=False)
        if len(offsets) and (offsets == offsets[0]).all():
            return flat.reshape(len(col), int(offsets[0])).astype(
                np.float64, copy=False
            )
        col = col.to_pylist()
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _e6(x: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5) — the rounding rule mirrored by the oracle SQL
    (``CAST(FLOOR(... * 1000000 + 0.5) AS BIGINT)``)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


def _lowest_vec_rows(ds: ray.data.Dataset, n: int) -> pd.DataFrame:
    """The ``n`` lowest vec_ids WITHOUT a global sort: per-batch partial
    min-n, tiny driver merge (the deterministic query-set convention)."""

    def batch_min(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        if len(vid) > n:
            keep = np.argsort(vid, kind="stable")[:n]
            return t.take(pa.array(keep))
        return t

    parts = ensure_cols(
        ds.map_batches(batch_min, batch_format="pyarrow").to_pandas(),
        vec_id="int64", embedding="object",
    )
    return (
        parts.sort_values("vec_id").head(n).reset_index(drop=True)
    )


def _det_sample_rows(ds: ray.data.Dataset, n: int) -> pd.DataFrame:
    """Deterministic layout-independent sample of ``n`` rows: the rows with
    the smallest ``splitmix64(vec_id)`` — pseudo-random (hash order is
    uncorrelated with id order) but a PURE FUNCTION of the ids.
    ``Dataset.limit(n).to_pandas()`` row order varies with block arrival
    order across executions (measured), which would make a k-means trained
    on it — and every cluster_id downstream — run-dependent. Same per-batch
    partial bottom-n + tiny driver merge shape as ``_lowest_vec_rows``."""
    from ..functions.hashing import splitmix64

    def batch_bottom(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(vid.astype(np.uint64))
        if len(vid) > n:
            keep = np.argsort(h, kind="stable")[:n]
            t, h = t.take(pa.array(keep)), h[keep]
        return t.append_column("_h", pa.array(h, pa.uint64()))

    # streaming driver merge: a running bottom-n, so driver memory is
    # O(n + batch) no matter how many blocks the corpus has (global
    # bottom-n by (_h, vec_id) is merge-order-insensitive)
    best: pd.DataFrame | None = None
    for b in ds.map_batches(batch_bottom, batch_format="pyarrow").iter_batches(
        batch_size=max(n, 8192), batch_format="pandas"
    ):
        cand = b if best is None else pd.concat([best, b], ignore_index=True)
        best = cand.sort_values(["_h", "vec_id"]).head(n)
    if best is None:
        return pd.DataFrame()
    return best.drop(columns="_h").reset_index(drop=True)


def brute_force_cosine_topk(
    sf_dir: str, n_queries: int = 3, k: int = 5
) -> pd.DataFrame:
    """Exact cosine top-k: queries = the ``n_queries`` lowest vec_ids.

    Returns (query_id, vec_id, cos_sim_e6) — self-matches excluded. Ranking
    uses (cos_sim_e6 DESC, vec_id ASC) in BOTH the per-batch partial top-k
    and the driver merge, identically to the oracle SQL's ROW_NUMBER order,
    so engine and oracle select and hash the same rows.
    """
    ds = _emb(sf_dir)
    qrows = _lowest_vec_rows(ds, n_queries)
    if qrows.empty:
        return typed_empty(query_id="int64", vec_id="int64", cos_sim_e6="int64")
    Q = _stack(qrows["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qrows["vec_id"].to_numpy()
    ref = ray.put((qids, Qn))

    def score_topk(t: pa.Table) -> pa.Table:
        qids_, Qn_ = ray.get(ref)
        V = _stack(t["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims_e6 = _e6(Vn @ Qn_.T)  # (batch, nq)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        q_out, v_out, s_out = [], [], []
        for qi, qid in enumerate(qids_):
            col = sims_e6[:, qi]
            mask = vid != qid  # exclude self-match
            v_m, s_m = vid[mask], col[mask]
            order = np.lexsort((v_m, -s_m))[:k]
            q_out.append(np.full(len(order), qid, dtype=np.int64))
            v_out.append(v_m[order])
            s_out.append(s_m[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(q_out), pa.int64()),
                "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
            }
        )

    cand = ensure_cols(
        ds.map_batches(score_topk, batch_format="pyarrow").to_pandas(),
        query_id="int64", vec_id="int64", cos_sim_e6="int64",
    )
    out = (
        cand.sort_values(
            ["query_id", "cos_sim_e6", "vec_id"],
            ascending=[True, False, True],
        )
        .groupby("query_id", sort=True)
        .head(k)
    )
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def lsh_bucketed_topk(
    sf_dir: str,
    n_queries: int = 3,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets; each query scans
    only vectors sharing its sign-bucket. The scale path for 10^9+ vectors —
    per-bucket scan instead of full scan, same per-batch partial top-k and
    (query_id, vec_id, cos_sim_e6) schema as brute force.
    """
    ds = _emb(sf_dir)
    qrows = _lowest_vec_rows(ds, n_queries)
    if qrows.empty:
        return typed_empty(query_id="int64", vec_id="int64", cos_sim_e6="int64")
    Q = _stack(qrows["embedding"])
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (Q @ planes > 0).astype(np.uint8)
    qbucket = np.packbits(qsig, axis=1, bitorder="little")[:, 0]
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qrows["vec_id"].to_numpy()
    ref = ray.put((qids, Qn, planes, qbucket))

    def score_topk(t: pa.Table) -> pa.Table:
        qids_, Qn_, planes_, qbucket_ = ray.get(ref)
        V = _stack(t["embedding"])
        sig = (V @ planes_ > 0).astype(np.uint8)
        bucket = np.packbits(sig, axis=1, bitorder="little")[:, 0]
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        q_out, v_out, s_out = [], [], []
        for qi, qb in enumerate(qbucket_):
            mask = (bucket == qb) & (vid != qids_[qi])
            if not mask.any():
                continue
            sims_e6 = _e6(Vn[mask] @ Qn_[qi])
            v_m = vid[mask]
            order = np.lexsort((v_m, -sims_e6))[:k]
            q_out.append(np.full(len(order), qids_[qi], dtype=np.int64))
            v_out.append(v_m[order])
            s_out.append(sims_e6[order])
        if not q_out:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(q_out), pa.int64()),
                "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
            }
        )

    cand = ensure_cols(
        ds.map_batches(score_topk, batch_format="pyarrow").to_pandas(),
        query_id="int64", vec_id="int64", cos_sim_e6="int64",
    )
    out = (
        cand.sort_values(
            ["query_id", "cos_sim_e6", "vec_id"],
            ascending=[True, False, True],
        )
        .groupby("query_id", sort=True)
        .head(k)
    )
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def near_dup_pairs_dataset(
    ds: ray.data.Dataset,
    threshold: float = 0.98,
    n_planes: int = 12,
    seed: int = 42,
    center: bool = False,
    max_bucket: int | None = None,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs over any (vec_id int64,
    embedding list<float>) Dataset, fully distributed: hyperplane LSH
    bucket per vector in ``map_batches`` → ONE ``groupby(bucket)`` shuffle
    (embeddings carried as payload) → within-bucket exact cosine ≥
    threshold via a tiled matmul. Each vector lives in exactly one bucket, so
    every pair is generated exactly once — no dedup exchange.

    Returns (id_a, id_b, cos_sim_e6). Partitioning assumption: bucket sizes
    stay ≪ corpus (12 planes → 4096 buckets). ``max_bucket`` is the
    explicit skew policy for corpora that violate it: a bucket over the
    cap RECURSIVELY sub-splits on level-seeded extra hyperplanes (pairs
    then enumerate within sub-buckets only — bounded O(max_bucket·n)
    instead of O(n²)); a subgroup no level's planes can split (identical
    sign patterns, e.g. duplicated vectors) that still exceeds the cap
    falls back to STAR pairs against its min-id row — lossless for
    duplicate groups (every member matches the root at cos ≈ 1); members
    below threshold against the root lose their mutual pairs, and the
    skipped pair count is logged. Default ``None`` keeps exact
    within-bucket all-pairs.

    ``center=True`` subtracts a driver-sample mean before the hyperplane
    signs (bucket assignment ONLY — the verified cosine stays on the raw
    vectors): cone-concentrated embedding families (e.g. DCT image
    embeddings, where every vector shares a dominant low-frequency
    component) otherwise collapse into a handful of buckets and the
    within-bucket matmul degenerates toward all-pairs.
    """
    if center:
        # center needs TWO full passes over ds (deterministic mean sample +
        # the bucketing pass below); pin the blocks once so an expensive
        # upstream (e.g. the image decode→DCT-embed actor pool) is not
        # re-executed per pass — same "consumed twice at most" convention
        # as text_dedup's exact_dedup. Spills to disk past object-store
        # capacity rather than recomputing the upstream.
        ds = ds.materialize()
    head = ds.take(1)
    if not head:  # empty input: nothing to bucket
        return typed_empty(id_a="int64", id_b="int64", cos_sim_e6="int64")
    dim = len(head[0]["embedding"])
    mean_ref = None
    if center:
        # deterministic sample (pure function of the ids, not of block
        # arrival order): above the sample size a limit()-based subset
        # would make the mean — and every bucket downstream — run-dependent
        sample = _stack(_det_sample_rows(ds, 2048)["embedding"])
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        mean_ref = ray.put(sn.mean(axis=0))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    ref = ray.put(planes)

    def add_bucket(t: pa.Table) -> pa.Table:
        planes_ = ray.get(ref)
        V = _stack(t["embedding"])
        if mean_ref is not None:
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            V = Vn - ray.get(mean_ref)
        sig = (V @ planes_ > 0).astype(np.uint8)
        packed = np.packbits(
            np.pad(sig, ((0, 0), (0, (-sig.shape[1]) % 8))),
            axis=1, bitorder="little",
        )
        cols = packed[:, :2]  # ≤ 16 bucket bits; works for ANY n_planes
        bucket = cols.astype(np.int64) @ (
            256 ** np.arange(cols.shape[1], dtype=np.int64)
        )
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    thr_e6 = int(np.floor(threshold * 1e6 + 0.5))
    _MAX_SPLIT_DEPTH = 16

    def _emit_all_pairs(Vn, ids, rows, a_out, b_out, s_out):
        """Exact cos ≥ thr pairs within ``rows`` (tiled; min-id first)."""
        sub = Vn[rows]
        sid = ids[rows]
        tile = 2048  # bound the (m×m) similarity block to tile×m
        for s in range(0, len(rows), tile):
            sims_e6 = _e6(sub[s : s + tile] @ sub.T)
            ii, jj = np.nonzero(sims_e6 >= thr_e6)
            keep = (ii + s) < jj  # strict upper triangle in local indices
            ii, jj = ii[keep], jj[keep]
            ga, gb = sid[ii + s], sid[jj]
            lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
            a_out.append(lo)
            b_out.append(hi)
            s_out.append(sims_e6[ii, jj])

    def bucket_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cos_sim_e6": pa.array([], pa.int64()),
                }
            )
        V = _stack(g["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        a_out, b_out, s_out = [], [], []
        n_star_groups = 0
        n_pairs_skipped = 0
        stack = [(np.arange(n), 0)]
        while stack:
            rows, level = stack.pop()
            m = len(rows)
            if m < 2:
                continue
            if max_bucket is None or m <= max_bucket:
                _emit_all_pairs(Vn, ids, rows, a_out, b_out, s_out)
                continue
            if level < _MAX_SPLIT_DEPTH:
                # level-seeded extra hyperplanes: same planes for every
                # bucket/batch at a given level → deterministic layout.
                # Split in the SAME geometry as the top-level bucketing
                # (centered when center=True — un-centered planes cannot
                # split a cone-concentrated family).
                sub_rng = np.random.default_rng((seed, 1 + level))
                extra = sub_rng.standard_normal((Vn.shape[1], 4))
                S = Vn[rows]
                if mean_ref is not None:
                    S = S - ray.get(mean_ref)
                code = (S @ extra > 0) @ (1 << np.arange(4))
                parts = [rows[code == c] for c in np.unique(code)]
                if len(parts) > 1:
                    stack.extend((p, level + 1) for p in parts)
                else:
                    # this level's planes failed — RETRY with the next
                    # level's (different) planes before giving up
                    stack.append((rows, level + 1))
                continue
            # unsplittable after every level (identical sign patterns,
            # i.e. duplicated/indistinguishable vectors): star pairs to
            # the min-id row; enumerate nothing quadratic
            n_star_groups += 1
            root = rows[np.argmin(ids[rows])]
            others = rows[rows != root]
            sims_e6 = _e6(Vn[others] @ Vn[root])
            keep = sims_e6 >= thr_e6
            ga, gb = ids[others][keep], np.full(int(keep.sum()), ids[root])
            lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
            a_out.append(lo)
            b_out.append(hi)
            s_out.append(sims_e6[keep])
            # honest accounting: only keep.sum() edges were EMITTED; every
            # other within-group pair went unenumerated
            n_pairs_skipped += m * (m - 1) // 2 - int(keep.sum())
        if n_star_groups:
            import logging

            logging.getLogger(__name__).warning(
                "near_dup_pairs: %d unsplittable hot group(s) over "
                "max_bucket=%s fell back to STAR edges — %d within-group "
                "pairs not enumerated (connectivity preserved only where "
                "members match the min-id root at >= threshold)",
                n_star_groups, max_bucket, n_pairs_skipped,
            )
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cos_sim_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.int64()),
                "id_b": pa.array(np.concatenate(b_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos_sim_e6": pd.Series(dtype="int64"),
            }
        )
    return (
        out.sort_values(["id_a", "id_b"])
        .reset_index(drop=True)[["id_a", "id_b", "cos_sim_e6"]]
    )


_PLANT_OFFSET = 1_000_000_000


def _plant_near_dups(t: pa.Table) -> pa.Table:
    """Deterministic near-dup planting: every vec_id ≡ 0 (mod 10) gains a
    perturbed copy (id + 10^9, embedding + 0.05·roll(embedding), stored
    float32 like the source column). Pure function of the input rows — no
    RNG, batch-layout independent."""
    V = _stack(t["embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False)
    sel = (vid % 10) == 0
    ids_out = vid.astype(np.int64)
    emb32 = V.astype(np.float32)
    if sel.any():
        planted = (V[sel] + 0.05 * np.roll(V[sel], 1, axis=1)).astype(
            np.float32
        )
        ids_out = np.concatenate([ids_out, vid[sel] + _PLANT_OFFSET])
        emb32 = np.concatenate([emb32, planted])
    dim = emb32.shape[1]
    emb_col = pa.FixedSizeListArray.from_arrays(
        pa.array(emb32.ravel(), pa.float32()), dim
    )
    return pa.table(
        {"vec_id": pa.array(ids_out, pa.int64()), "embedding": emb_col}
    )


def embedding_near_dup_pairs_exact(
    sf_dir: str,
    threshold: float = 0.98,
    plant_near_dups: bool = True,
) -> pd.DataFrame:
    """EXACT all-pairs cosine near-dup pairs — the SQL-verifiable reference
    for the approximate LSH variant (``embedding_near_dup_pairs``), same
    planting, same (id_a, id_b, cos_sim_e6) contract.

    Physical shape: the full (normalized) embedding matrix is pulled to the
    driver ONCE and broadcast via ``ray.put``; each batch does one tiled
    matmul against it and emits only ``id_batch < id_ref`` survivors — no
    shuffle. Exact all-pairs is inherently O(n²) with a resident reference
    matrix, so this is the SMALL-TABLE baseline (embeddings tables up to
    ~10⁶ rows × 128 dims ≈ 1 GB broadcast); the LSH/IVF family is the
    10⁹-vector scale path. The DuckDB oracle replicates the planting
    arithmetic bit-for-bit (float64 ops + float32 round-trip)."""
    ds = _emb(sf_dir)
    if plant_near_dups:
        ds = ds.map_batches(_plant_near_dups, batch_format="pyarrow")
    ref_rows = ds.to_pandas()  # the documented one-time small-table pull
    if ref_rows.empty:
        return typed_empty(id_a="int64", id_b="int64", cos_sim_e6="int64")
    ref_ids = ref_rows["vec_id"].to_numpy().astype(np.int64)
    R = _stack(ref_rows["embedding"])
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    ref = ray.put((ref_ids, Rn))
    thr_e6 = int(np.floor(threshold * 1e6 + 0.5))

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cos_sim_e6": pa.array([], pa.int64()),
                }
            )
        ids_r, Rn_ = ray.get(ref)
        V = _stack(t["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_out, b_out, s_out = [], [], []
        tile = 2048
        for s in range(0, len(vid), tile):
            sims_e6 = _e6(Vn[s : s + tile] @ Rn_.T)
            ii, jj = np.nonzero(sims_e6 >= thr_e6)
            keep = vid[ii + s] < ids_r[jj]  # strict order ⇒ exactly once
            ii, jj = ii[keep], jj[keep]
            a_out.append(vid[ii + s])
            b_out.append(ids_r[jj])
            s_out.append(sims_e6[ii, jj])
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.int64()),
                "id_b": pa.array(np.concatenate(b_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    out = ensure_cols(out, id_a="int64", id_b="int64", cos_sim_e6="int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_near_dup_pairs(
    sf_dir: str,
    threshold: float = 0.98,
    n_planes: int = 12,
    seed: int = 42,
    plant_near_dups: bool = True,
) -> pd.DataFrame:
    """Near-dup pairs over the embeddings table.

    The driver testdata embeddings contain NO near-duplicates (max pairwise
    cosine ≈ 0.51 at sf0.01 — measured), so with the raw table this query
    proves nothing at any sane threshold (the round-2 vacuity finding). By
    default it therefore PLANTS deterministic near-dup copies derived from
    the input (``_plant_near_dups``) so the operator's full path — bucket
    assignment, payload shuffle, tiled verification — runs against a
    non-empty, pytest-pinned result. ``plant_near_dups=False`` runs the raw
    table."""
    ds = _emb(sf_dir)
    if plant_near_dups:
        ds = ds.map_batches(_plant_near_dups, batch_format="pyarrow")
    return near_dup_pairs_dataset(ds, threshold, n_planes, seed)


def text_embed_near_dup_pairs(
    sf_dir: str,
    threshold: float = 0.95,
    dim: int = 128,
    k: int = 3,
    n_planes: int = 12,
    seed: int = 42,
) -> pd.DataFrame:
    """Documents → hashed-ngram caption embeddings → near-dup pairs: the
    dense-matcher path of the reference (``Run_Sembedding.py:18`` — learned
    sentence embeddings + cosine) re-expressed with the public feature-
    hashing embedder (``hashing.hashed_ngram_embed``). The embed stage is a
    task-pool ``map_batches`` fused with the read; downstream is the shared
    one-shuffle near-dup machinery."""
    from ..functions.hashing import hashed_ngram_embed

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def embed_batch(t: pa.Table) -> pa.Table:
        E = hashed_ngram_embed(t["text"].to_pylist(), dim, k, seed)
        return pa.table(
            {
                "vec_id": pc.cast(t["doc_id"], pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.ravel(), pa.float64()), dim
                ),
            }
        )

    ds = docs.map_batches(embed_batch, batch_format="pyarrow")
    return near_dup_pairs_dataset(ds, threshold, n_planes, seed)


def caption_embed_near_dup_pairs(
    sf_dir: str,
    threshold: float = 0.98,
    dim: int = 128,
    k: int = 3,
    n_planes: int = 12,
    seed: int = 42,
) -> pd.DataFrame:
    """The dense matcher over the image+caption CORPUS (the reference's
    actual input shape): captions embed via feature hashing, then the shared
    near-dup machinery. Exact/re-encode duplicate captions are byte-equal →
    cosine 1.0 and always co-bucketed, so golden exact-pairs are a
    guaranteed subset (the pytest pins this).

    vec_id is the corpus row index (``int(image_id[:8])`` — image ids are
    ``{i:08d}-uuid5``)."""
    from ..functions.hashing import hashed_ngram_embed
    from ..sources.io import read_corpus
    from .corpus_dedup import corpus_for_sf

    corpus_dir, _ = corpus_for_sf(sf_dir)
    corpus = read_corpus(corpus_dir, ["image_id", "caption"])

    def embed_batch(t: pa.Table) -> pa.Table:
        ids = [int(s[:8]) for s in t["image_id"].to_pylist()]
        E = hashed_ngram_embed(t["caption"].to_pylist(), dim, k, seed)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.ravel(), pa.float64()), dim
                ),
            }
        )

    ds = corpus.map_batches(embed_batch, batch_format="pyarrow")
    return near_dup_pairs_dataset(ds, threshold, n_planes, seed)


def image_embed_near_dup_pairs(
    sf_dir: str,
    threshold: float = 0.9999,
    n_planes: int = 12,
    seed: int = 42,
) -> pd.DataFrame:
    """Image near-duplicates via the MULTIMODAL embed stage: corpus bytes →
    ``ImageEmbed`` actor pool (DCT low-frequency embedding, the model-shaped
    stage) → shared near-dup machinery with CENTERED bucketing.

    The DCT family is cone-concentrated (every synthetic image shares the
    gradient base, pairwise cosine floor ≈ 0.99 — measured), hence the
    tight default threshold (golden exact/reencode image pairs sit
    ≥ 0.999997) and ``center=True`` so buckets spread instead of
    collapsing. vec_id = corpus row index (``int(image_id[:8])``)."""
    from .corpus_dedup import corpus_for_sf
    from .multimodal import ImageEmbed
    from ..config import PipelineConfig, media_pool_size
    from ..sources.io import read_corpus

    cfg = PipelineConfig()
    corpus_dir, _ = corpus_for_sf(sf_dir)
    corpus = read_corpus(corpus_dir, ["image_id", "bytes", "fmt"])
    embedded = corpus.map_batches(
        ImageEmbed,
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size,
        concurrency=media_pool_size(),
    )

    def to_vec(t: pa.Table) -> pa.Table:
        t = t.filter(t["ok"])
        ids = [int(s[:8]) for s in t["image_id"].to_pylist()]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": t["embedding"],
            }
        )

    ds = embedded.map_batches(to_vec, batch_format="pyarrow")
    return near_dup_pairs_dataset(ds, threshold, n_planes, seed, center=True)


def _kmeans_lite(
    X: np.ndarray, k: int, seed: int, iters: int = 8
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample: seeds from a
    seeded RNG choice, Lloyd iterations on cosine (normalized dot), empty
    clusters re-seeded deterministically. Returns (k, dim) L2-normalized
    centroids. The sample is small (driver-scale); the full corpus never
    leaves the cluster."""
    rng = np.random.default_rng(seed)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    idx = rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)
    C = Xn[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
            else:  # re-seed empty centroid deterministically
                C[j] = Xn[int(rng.integers(0, len(Xn)))]
    return C


def ivf_topk(
    sf_dir: str,
    n_queries: int = 3,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k — the classic scale path for
    10^9+ vectors: a small driver-side sample trains spherical k-means
    centroids (broadcast once), every batch assigns its vectors to their
    nearest centroid, and each query scans only vectors whose centroid is
    among its ``n_probe`` closest centroids (multiprobe). Same per-batch
    partial top-k + (query_id, vec_id, cos_sim_e6) contract as the other
    variants; ``n_probe == n_centroids`` degenerates to exact brute force
    (the property the semantic test pins).
    """
    ds = _emb(sf_dir)
    sample = _det_sample_rows(ds, sample_size)
    if sample.empty:
        return typed_empty(query_id="int64", vec_id="int64", cos_sim_e6="int64")
    X = _stack(sample["embedding"])
    C = _kmeans_lite(X, n_centroids, seed)

    qrows = _lowest_vec_rows(ds, n_queries)
    Q = _stack(qrows["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qrows["vec_id"].to_numpy()
    n_probe = min(n_probe, len(C))
    # per query: the n_probe nearest centroids
    qprobe = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((qids, Qn, C, qprobe))

    def score_topk(t: pa.Table) -> pa.Table:
        qids_, Qn_, C_, qprobe_ = ray.get(ref)
        V = _stack(t["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cent = np.argmax(Vn @ C_.T, axis=1)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        q_out, v_out, s_out = [], [], []
        for qi, qid in enumerate(qids_):
            mask = np.isin(cent, qprobe_[qi]) & (vid != qid)
            if not mask.any():
                continue
            sims_e6 = _e6(Vn[mask] @ Qn_[qi])
            v_m = vid[mask]
            order = np.lexsort((v_m, -sims_e6))[:k]
            q_out.append(np.full(len(order), qid, dtype=np.int64))
            v_out.append(v_m[order])
            s_out.append(sims_e6[order])
        if not q_out:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(q_out), pa.int64()),
                "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
            }
        )

    cand = ensure_cols(
        ds.map_batches(score_topk, batch_format="pyarrow").to_pandas(),
        query_id="int64", vec_id="int64", cos_sim_e6="int64",
    )
    out = (
        cand.sort_values(
            ["query_id", "cos_sim_e6", "vec_id"],
            ascending=[True, False, True],
        )
        .groupby("query_id", sort=True)
        .head(k)
    )
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


_NO_LOWER_E6 = -2_000_000  # sentinel: member has no lower-id cluster peer


def semdedup_prune(
    sf_dir: str,
    n_centroids: int = 64,
    threshold: float = 0.98,
    sample_size: int = 4096,
    seed: int = 42,
    plant_near_dups: bool = True,
    chunk: int = 2048,
) -> pd.DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
    k-means-cluster the embedding space, then prune within each cluster —
    a member is dropped when its cosine to ANY lower-id cluster peer
    reaches ``threshold`` (the deterministic keep-the-min-id variant of
    the paper's within-cluster dedup; min-id replaces the paper's
    arbitrary-order tie handling so the result is a pure function of the
    input). Returns one row per vector:
    (vec_id, cluster_id, max_lower_cos_e6, keep).

    This is the corpus-curation sibling of ``embedding_near_dup_pairs``:
    instead of reporting pairs it decides survivors, and instead of LSH
    buckets it uses the trained-centroid partition — the shape that scales
    SemDeDup to 10^9+ vectors because the O(m²) cosine work is confined to
    clusters (pick ``n_centroids`` so corpus/n_centroids keeps m² tractable;
    the paper runs ~11k clusters over LAION). Physical plan: driver-sample
    k-means (``_kmeans_lite``, broadcast once) → per-batch centroid
    assignment (one matmul) → ONE ``groupby(cluster_id)`` shuffle →
    per-cluster chunked lower-triangular max-cosine (live memory bounded by
    ``chunk × m`` per kernel call, never m²).

    The raw testdata embeddings have no near-dups (max pairwise cos ≈ 0.51
    — the round-2 vacuity finding), so by default the same deterministic
    planting as the pair queries (``_plant_near_dups``) provides known
    semantic duplicates the pruner must drop; ``plant_near_dups=False``
    runs the raw table.
    """
    ds = _emb(sf_dir)
    if plant_near_dups:
        ds = ds.map_batches(_plant_near_dups, batch_format="pyarrow")
    sample = _det_sample_rows(ds, sample_size)
    if sample.empty:
        return typed_empty(
            vec_id="int64", cluster_id="int64", max_lower_cos_e6="int64",
            keep="int64",
        )
    C = _kmeans_lite(_stack(sample["embedding"]), n_centroids, seed)
    cref = ray.put(C)
    thr_e6 = int(np.floor(threshold * 1e6 + 0.5))

    def assign(t: pa.Table) -> pa.Table:
        V = _stack(t["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cid = np.argmax(Vn @ ray.get(cref).T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster_id": pa.array(cid),
                "embedding": t["embedding"],
            }
        )

    def prune_cluster(g: pa.Table) -> pa.Table:
        vid = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vid, kind="stable")
        vid = vid[order]
        V = _stack(g["embedding"])[order]
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        m = len(vid)
        max_lower = np.full(m, _NO_LOWER_E6, dtype=np.int64)
        # chunked lower-triangular max: rows s..e vs ALL members, masked to
        # strictly-lower ids — memory is chunk × m, compute the SemDeDup m²/2
        for s in range(0, m, chunk):
            e = min(s + chunk, m)
            sims_e6 = _e6(Vn[s:e] @ Vn.T)
            lower = np.arange(m)[None, :] < np.arange(s, e)[:, None]
            sims_e6[~lower] = _NO_LOWER_E6
            max_lower[s:e] = sims_e6.max(axis=1)
        keep = (max_lower < thr_e6).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "cluster_id": g["cluster_id"].take(pa.array(order)),
                "max_lower_cos_e6": pa.array(max_lower),
                "keep": pa.array(keep),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(prune_cluster, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(
        out, vec_id="int64", cluster_id="int64", max_lower_cos_e6="int64",
        keep="int64",
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def knn_graph(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Exact cosine k-nearest-neighbor graph over the embeddings table —
    the curation primitive under diversity sampling, graph-based dedup and
    SemDeDup variants: one row per (vector, neighbor) edge,
    (vec_id, nbr_id, cos_sim_e6, nbr_rank) with nbr_rank 1..k ordered by
    (cos DESC, nbr_id ASC), self-edges excluded.

    Physical shape: the normalized reference matrix is pulled once and
    broadcast via ``ray.put`` (the ``embedding_near_dup_pairs_exact``
    small-table pattern); each batch computes its rows' top-k against the
    full reference in one tiled matmul — each row's edge list is COMPLETE
    within its batch, so there is no shuffle and no driver merge beyond
    concatenation of n·k result rows. Exact all-pairs is the small-table
    baseline; at 10^9 vectors the LSH/IVF bucketed variants above are the
    scale path for the same contract.
    """
    ds = _emb(sf_dir)
    ref_rows = ds.to_pandas()  # documented one-time small-table pull
    if ref_rows.empty:
        return typed_empty(
            vec_id="int64", nbr_id="int64", cos_sim_e6="int64", nbr_rank="int64"
        )
    order = np.argsort(ref_rows["vec_id"].to_numpy().astype(np.int64))
    ref_ids = ref_rows["vec_id"].to_numpy().astype(np.int64)[order]
    R = _stack(ref_rows["embedding"])[order]  # id-SORTED: column index = id rank
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    ref = ray.put((ref_ids, Rn))

    def edges(t: pa.Table) -> pa.Table:
        ids_r, Rn_ = ray.get(ref)
        V = _stack(t["embedding"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, len(ids_r) - 1)
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
                "cos_sim_e6": pa.array([], pa.int64()),
                "nbr_rank": pa.array([], pa.int64()),
            }
        )
        if kk <= 0 or not len(vid):
            return empty
        # vectorized per-row top-k with deterministic ties: one composite
        # int64 key per cell — cos_sim_e6 in the high bits, REVERSED id
        # rank in the low 32 (ids_r is id-sorted, so larger low bits =
        # smaller nbr_id; cos steps are multiples of 2^32, so the tie
        # term can never cross cos levels). No per-row Python loop.
        rev = np.arange(len(ids_r) - 1, -1, -1, dtype=np.int64)[None, :]
        v_out, n_out, s_out, r_out = [], [], [], []
        tile = 2048
        for s in range(0, len(vid), tile):
            vt = vid[s : s + tile]
            sims_e6 = _e6(Vn[s : s + tile] @ Rn_.T)  # (m, n_ref)
            key = sims_e6 * (np.int64(1) << 32) + rev
            # self-exclusion: sink each row's own column (if present)
            pos = np.searchsorted(ids_r, vt)
            posc = np.minimum(pos, len(ids_r) - 1)
            is_self = ids_r[posc] == vt
            # sentinel BELOW any real cos level (cos_e6 ≥ -1e6) — NOT
            # int64 min, whose negation wraps back to itself and would
            # make the self cell the largest of -key
            key[np.nonzero(is_self)[0], posc[is_self]] = (
                np.int64(-2_000_001) << 32
            )
            top = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            tk = np.take_along_axis(key, top, axis=1)
            cols = np.take_along_axis(
                top, np.argsort(-tk, axis=1, kind="stable"), axis=1
            )  # (m, kk), rank order
            v_out.append(np.repeat(vt, kk))
            n_out.append(ids_r[cols].ravel())
            s_out.append(np.take_along_axis(sims_e6, cols, axis=1).ravel())
            r_out.append(np.tile(np.arange(1, kk + 1, dtype=np.int64), len(vt)))
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                "nbr_id": pa.array(np.concatenate(n_out), pa.int64()),
                "cos_sim_e6": pa.array(np.concatenate(s_out), pa.int64()),
                "nbr_rank": pa.array(np.concatenate(r_out), pa.int64()),
            }
        )

    out = ensure_cols(
        ds.map_batches(edges, batch_format="pyarrow").to_pandas(),
        vec_id="int64", nbr_id="int64", cos_sim_e6="int64", nbr_rank="int64",
    )
    return out.sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding spike-outlier flagging — the OOD/garbage-vector pruning pass an
# embedding pipeline runs before indexing. This corpus's vectors are unit-
# normalized (every L2 norm is exactly 1.0 — measured, which makes a norm
# fence vacuous here), so the degeneracy signal is the SPIKE score: the
# maximum absolute component. A healthy unit vector spreads mass across
# dimensions; a dead/one-hot-ish encoder output concentrates it. Exact
# Tukey IQR fence on exact distributed quantiles; pure-integer outlier
# rule shared with the DuckDB oracle.


def embedding_spike_outliers(sf_dir: str) -> pd.DataFrame:
    """Flag vectors whose spike score — ``max_i |v_i|``, exact in float64
    since no summation is involved — falls outside the Tukey fence
    ``[q1 - 1.5*IQR, q3 + 1.5*IQR]`` of the corpus distribution. Returns
    ``(vec_id, spike_e6, is_outlier)`` with
    ``spike_e6 = floor(max|v_i| * 1e6 + 0.5)`` and the fence evaluated in
    PURE INTEGERS — ``2*s < 2*q1 - 3*iqr  or  2*s > 2*q3 + 3*iqr`` — so
    the oracle cannot diverge on float rounding. Non-vacuous on this
    corpus: 12 flagged at sf0.001, 7 at sf0.01.

    Scale shape: one pruned read → 16-byte (vec_id, spike_e6) rows
    materialized once; exact q1/q3 via the histogram-selection plan
    (O(buckets) exchanges); fence constants captured in the closure; one
    streaming flag pass. No shuffle anywhere.
    """

    def spikes(t: pa.Table) -> pa.Table:
        m = _stack(t["embedding"])
        sp = np.abs(m).max(axis=1) if m.shape[0] else np.empty(0)
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "spike_e6": pa.array(
                    np.floor(sp * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    from .relational import exact_quantiles_int64

    rows = _emb(sf_dir).map_batches(spikes, batch_format="pyarrow").materialize()
    q = exact_quantiles_int64(rows, "spike_e6", (0.25, 0.75))
    if q is None:
        return typed_empty(vec_id="int64", spike_e6="int64", is_outlier="int64")
    q1, q3 = q
    iqr = q3 - q1

    def flag(t: pa.Table) -> pa.Table:
        v = t["spike_e6"].to_numpy(zero_copy_only=False)
        out = (2 * v < 2 * q1 - 3 * iqr) | (2 * v > 2 * q3 + 3 * iqr)
        return t.append_column(
            "is_outlier", pa.array(out.astype(np.int64))
        )

    out = rows.map_batches(flag, batch_format="pyarrow").to_pandas()
    out = ensure_cols(out, vec_id="int64", spike_e6="int64", is_outlier="int64")
    return out.sort_values("vec_id").reset_index(drop=True)
