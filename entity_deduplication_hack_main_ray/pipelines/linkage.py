"""Record linkage between two record sets (SURVEY.md §2.3 T6 analog).

The reference links the records of two graphs per entity type with
``dedupe.RecordLink`` — active-learning blocking + a learned classifier,
then ``join(threshold=0.5)`` (Run_dedupe_models.ipynb cells 7-8). This
engine keeps the *shape* of that operator — block on a shared key, compare
every cross-side pair within a block field-by-field, fuse the field
similarities into one score, keep each right record's best left candidate
above a threshold — but replaces the non-deterministic active-learning
classifier with a fixed-weight Fellegi-Sunter-style linear scorer
(deterministic, config-driven, SQL-checkable). That substitution is
by design: the learned classifier is the one reference component whose
output depends on interactive labeling, so a faithful port cannot be
verified against a fixed oracle.

Ray-Data plan (one scan, one shuffle):

    read_parquet(customer, 5 cols)                     # pruned scan
      → map_batches(emit both sides, vectorized)       # left + derived right
      → groupby(block_key).map_groups(link_block)      # THE shuffle (B1)
          · dense per-block cross-side Levenshtein DP (vectorized over all
            pairs at once — the B2 "all-pairs within block" analog)
          · fixed-weight score fusion (A2 analog)
          · per-right top-1 + threshold (A1 analog, RecordLink join(0.5))

The right side is derived deterministically from the left inside the
query (the ``embedding_near_dup_pairs_exact`` planting pattern) so the
DuckDB oracle can replicate it bit-for-bit: ``custkey % 5 == 0`` rows
become near-duplicates (last name char dropped, balance +7 cents) that
must link back to their originals; ``custkey % 7 == 3`` rows become
garbled decoys (reversed name, balance +50.00) that must fall below the
threshold and link to nothing.

Scale notes: the block key here is ``c_nationkey`` (the reference's
"type blocking", graphToText_utils.py:77-81 — only blocks present on BOTH
sides produce pairs, which group-wise pairing gives for free). Real
corpora need a finer composite key (e.g. nation × name-prefix × phonetic
code) so per-block cross products stay bounded — the block key is a
config knob, and the per-block kernel is O(|L_b|·|R_b|·len²) with
O(|L_b|·|R_b|) memory, so the key must keep |L_b|·|R_b| ≲ 10^7. Blocks
are independent: the groupby shuffle hash-partitions them across the
cluster and each kernel is one vectorized numpy job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.frames import ensure_cols

_NEAR_OFFSET = 1_000_000_000
_GARBLED_OFFSET = 2_000_000_000

# Fellegi-Sunter-style fixed agreement weights (sum to 1.0): name edit
# similarity dominates, exact segment agreement and balance proximity
# break ties. Deterministic stand-in for RecordLink's learned weights.
_W_NAME = 0.6
_W_SEG = 0.25
_W_BAL = 0.15
_BAL_TOL_CENTS = 10

# bound on |L|·|R_chunk| pairs materialized per Levenshtein DP call, so one
# oversized block degrades to more iterations instead of an OOM (the
# text_dedup._PAIR_CHUNK pattern). Per-right top-1 is independent across
# right records, so chunking the right side is semantics-free.
_LINK_PAIR_CHUNK = 1 << 22


def levenshtein_matrix(left: list[str], right: list[str]) -> np.ndarray:
    """Edit-distance matrix between every left/right string pair.

    Vectorized Wagner-Fischer: the DP table is materialized for ALL
    |L|·|R| pairs simultaneously (shape (|L|·|R|, len_b+1) int32 rows),
    so the Python-level loop is O(max_len_a · max_len_b) iterations of
    whole-array numpy ops — never a per-pair loop. Strings are padded to
    fixed width; per-string true lengths select the final DP cell.
    Distances are CHARACTER-level (UTF-32 code units, matching DuckDB's
    ``levenshtein`` and the textbook definition — the substring family's
    character-exact convention), not UTF-8 bytes.
    """
    nl, nr = len(left), len(right)
    if nl == 0 or nr == 0:
        return np.zeros((nl, nr), dtype=np.int32)
    lb = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in left]
    rb = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
          for s in right]
    la = np.array([len(b) for b in lb], dtype=np.int32)
    lr = np.array([len(b) for b in rb], dtype=np.int32)
    ml, mr = int(la.max()), int(lr.max())
    lmat = np.zeros((nl, ml), dtype=np.uint32)
    for i, b in enumerate(lb):
        lmat[i, : len(b)] = b
    rmat = np.zeros((nr, mr), dtype=np.uint32)
    for j, b in enumerate(rb):
        rmat[j, : len(b)] = b

    # pair-major layout: pair p = (i*nr + j)
    a_chars = np.repeat(lmat, nr, axis=0)  # (P, ml)
    b_chars = np.tile(rmat, (nl, 1))  # (P, mr)
    a_len = np.repeat(la, nr)
    b_len = np.tile(lr, nl)

    prev = np.broadcast_to(
        np.arange(mr + 1, dtype=np.int32), (nl * nr, mr + 1)
    ).copy()
    out = np.where(a_len == 0, b_len, 0).astype(np.int32)
    for i in range(1, ml + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a_chars[:, i - 1][:, None]  # (P, 1)
        sub_cost = (ai != b_chars).astype(np.int32)  # (P, mr)
        # deletion/substitution have no intra-row dependency; insertion
        # (cur[:, j-1] + 1) does, so that min folds in a j-loop of
        # whole-column ops (mr iterations, each O(P))
        best = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub_cost)
        for j in range(1, mr + 1):
            cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        # rows whose a-string already ended keep their final value
        done = a_len == i
        if done.any():
            out[done] = cur[done, b_len[done]]
        prev = cur
    return out.reshape(nl, nr)


def _emit_sides(t: pa.Table) -> pa.Table:
    """One scan emits BOTH sides: the original records (side 0) and the
    deterministically derived dirty records (side 1), vectorized."""
    key = t["c_custkey"].to_numpy()
    name = np.asarray(t["c_name"].to_pylist(), dtype=object)
    nk = t["c_nationkey"].to_numpy().astype(np.int64)
    bal = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
    seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)

    near = key % 5 == 0
    garb = key % 7 == 3
    near_names = np.asarray([s[:-1] for s in name[near]], dtype=object)
    garb_names = np.asarray([s[::-1] for s in name[garb]], dtype=object)

    rec_id = np.concatenate(
        [key, key[near] + _NEAR_OFFSET, key[garb] + _GARBLED_OFFSET]
    )
    return pa.table(
        {
            "rec_id": pa.array(rec_id, type=pa.int64()),
            "name": pa.array(
                np.concatenate([name, near_names, garb_names]), type=pa.string()
            ),
            "nk": pa.array(np.concatenate([nk, nk[near], nk[garb]])),
            "bal_cents": pa.array(
                np.concatenate([bal, bal[near] + 7, bal[garb] + 5000])
            ),
            "seg": pa.array(np.concatenate([seg, seg[near], seg[garb]]),
                            type=pa.string()),
            "side": pa.array(
                np.concatenate(
                    [
                        np.zeros(len(key), dtype=np.int8),
                        np.ones(int(near.sum()) + int(garb.sum()), dtype=np.int8),
                    ]
                )
            ),
        }
    )


def _score_chunk(
    l_names: list[str],
    r_names: list[str],
    l_seg: np.ndarray,
    r_seg: np.ndarray,
    l_bal: np.ndarray,
    r_bal: np.ndarray,
) -> np.ndarray:
    """Fused (L, R_chunk) integer score matrix for one right-side chunk."""
    lev = levenshtein_matrix(l_names, r_names).astype(np.float64)
    la = np.array([len(s) for s in l_names], dtype=np.float64)[:, None]
    ra = np.array([len(s) for s in r_names], dtype=np.float64)[None, :]
    name_sim = 1.0 - lev / np.maximum(la, ra)
    seg_eq = (l_seg[:, None] == r_seg[None, :]).astype(np.float64)
    bal_close = (
        np.abs(l_bal[:, None] - r_bal[None, :]) <= _BAL_TOL_CENTS
    ).astype(np.float64)
    # float64 expression mirrors the oracle SQL term-for-term (same
    # operation order → bit-identical doubles → identical floor)
    score = _W_NAME * name_sim + _W_SEG * seg_eq + _W_BAL * bal_close
    return np.floor(score * 1_000_000 + 0.5).astype(np.int64)


def _link_block(
    g: pd.DataFrame, threshold_e6: int, pair_chunk: int = _LINK_PAIR_CHUNK
) -> pd.DataFrame:
    """All-pairs compare inside ONE block (both sides co-located by the
    groupby shuffle), score fusion, per-right top-1 + threshold. The right
    side is processed in chunks bounding live pairs to ``pair_chunk`` —
    per-right top-1 is independent across rights, so the chunked result is
    byte-equal to the monolithic one."""
    lg = g[g["side"] == 0]
    rg = g[g["side"] == 1]
    empty = pd.DataFrame(
        {
            "r_id": pd.Series([], dtype="int64"),
            "l_id": pd.Series([], dtype="int64"),
            "score_e6": pd.Series([], dtype="int64"),
        }
    )
    if lg.empty or rg.empty:  # block present on one side only → no pairs
        return empty

    # per-right top-1, ties broken by smallest l_id: with rows pre-sorted
    # by l_id ascending, argmax's first-max rule picks the smallest l_id
    l_ids_raw = lg["rec_id"].to_numpy()
    order = np.argsort(l_ids_raw, kind="stable")
    l_ids = l_ids_raw[order]
    l_names = [lg["name"].iat[i] for i in order]
    l_seg = lg["seg"].to_numpy(dtype=object)[order]
    l_bal = lg["bal_cents"].to_numpy()[order]

    r_names_all = rg["name"].tolist()
    r_seg_all = rg["seg"].to_numpy(dtype=object)
    r_bal_all = rg["bal_cents"].to_numpy()
    r_ids_all = rg["rec_id"].to_numpy()

    step = max(1, pair_chunk // max(1, len(l_ids)))
    out_frames: list[pd.DataFrame] = []
    for s in range(0, len(r_ids_all), step):
        e = s + step
        score_e6 = _score_chunk(
            l_names, r_names_all[s:e], l_seg, r_seg_all[s:e],
            l_bal, r_bal_all[s:e],
        )
        best_pos = np.argmax(score_e6, axis=0)  # first max → smallest l_id
        best_score = score_e6[best_pos, np.arange(score_e6.shape[1])]
        keep = best_score >= threshold_e6
        out_frames.append(
            pd.DataFrame(
                {
                    "r_id": r_ids_all[s:e][keep],
                    "l_id": l_ids[best_pos[keep]],
                    "score_e6": best_score[keep],
                }
            )
        )
    out = pd.concat(out_frames, ignore_index=True)
    return out if len(out) else empty


def _salt_blocks(t: pa.Table, salt: int) -> pa.Table:
    """Sub-block key: lefts hash-salt into ``salt`` sub-blocks of their
    block, rights REPLICATE to every sub-block — per-right top-1 over a
    partition of the lefts, merged associatively afterwards, equals the
    unsalted global top-1 (max score, then min l_id, is associative)."""
    from ..functions.hashing import splitmix64

    nk = t["nk"].to_numpy().astype(np.int64)
    side = t["side"].to_numpy()
    rec = t["rec_id"].to_numpy()
    left = side == 0
    s_of_left = (
        splitmix64(rec.astype(np.uint64)) % np.uint64(salt)
    ).astype(np.int64)
    bkey_left = nk[left] * salt + s_of_left[left]
    n_r = int((~left).sum())
    rep_idx = np.repeat(np.nonzero(~left)[0], salt)
    bkey_right = nk[~left].repeat(salt) * salt + np.tile(
        np.arange(salt, dtype=np.int64), n_r
    )
    keep_idx = np.concatenate([np.nonzero(left)[0], rep_idx])
    out = t.take(pa.array(keep_idx))
    return out.append_column(
        "bkey", pa.array(np.concatenate([bkey_left, bkey_right]))
    )


def _merge_topk(g: pd.DataFrame) -> pd.DataFrame:
    """Associative per-right merge of sub-block winners: max score, ties to
    the smallest l_id — one vectorized sort + drop_duplicates."""
    return g.sort_values(
        ["r_id", "score_e6", "l_id"],
        ascending=[True, False, True],
        kind="stable",
    ).drop_duplicates("r_id")[["r_id", "l_id", "score_e6"]]


def record_linkage(
    sf_dir: str, threshold_e6: int = 500_000, left_salt: int = 1
) -> pd.DataFrame:
    """Link derived dirty records back to the customer table (T6 analog).

    Returns one row per linked right record: (r_id, l_id, score_e6).
    Near-duplicate rights (id ≥ 1e9, < 2e9) must link to their originals;
    garbled rights (id ≥ 2e9) must be absent (below threshold).

    ``left_salt`` > 1 is the SCALE path: block parallelism is otherwise
    capped at block-key cardinality (25 nations here), so each block's
    lefts hash-split into ``left_salt`` sub-blocks with the rights
    replicated to each, and a second tiny exchange merges the sub-block
    winners per right (byte-equal to the unsalted plan — pytest). At
    10^12 rows pick ``left_salt`` so |L_block|/salt × chunk fits a worker
    and blocks × salt ≥ cluster slots; right replication costs
    salt × |R| rows through the blocking shuffle, and the per-block
    pre-reduce keeps the merge exchange at ≤ salt rows per right.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    sides = ds.map_batches(_emit_sides, batch_format="pyarrow")
    if left_salt <= 1:
        linked = sides.groupby("nk").map_groups(
            lambda g: _link_block(g, threshold_e6), batch_format="pandas"
        )
    else:
        # merge exchange is COARSE (splitmix(r_id) % P partitions, one
        # vectorized kernel per partition) — never per-r_id groups
        from ..functions.hashing import splitmix64

        P = 32

        def add_pkey(g: pd.DataFrame) -> pd.DataFrame:
            g = _merge_topk(g)  # pre-reduce: ≤1 row per r_id leaves the block
            g["pkey"] = (
                splitmix64(g["r_id"].to_numpy().astype(np.uint64))
                % np.uint64(P)
            ).astype(np.int64)
            return g

        linked = (
            sides.map_batches(
                lambda t: _salt_blocks(t, left_salt), batch_format="pyarrow"
            )
            .groupby("bkey")
            .map_groups(
                lambda g: add_pkey(_link_block(g, threshold_e6)),
                batch_format="pandas",
            )
            .groupby("pkey")
            .map_groups(
                lambda g: _merge_topk(g), batch_format="pandas"
            )
        )
    out = ensure_cols(
        linked.to_pandas(), r_id="int64", l_id="int64", score_e6="int64"
    )
    return (
        out.astype({"r_id": "int64", "l_id": "int64", "score_e6": "int64"})
        .sort_values("r_id")
        .reset_index(drop=True)
    )
