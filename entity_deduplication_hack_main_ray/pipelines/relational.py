"""Relational operator pipelines over the TPC-H-ish test tables.

These exercise the engine's aggregation / join / top-k / set-op surface
(SURVEY.md §2.5 A1-A10, §2.4 B3-B4) with DuckDB-checkable semantics. Every
computed column is named identically to its oracle SQL alias.

Scale notes (per-operator docstrings): joins broadcast the small side via
``ray.put`` (no shuffle), aggregates pre-reduce inside ``map_batches`` before
the single ``groupby`` where it matters, reads prune columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.frames import ensure_cols, typed_empty


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style grouped aggregate (A4/A7 analog: grouped sums/counts).

    groupby is the only shuffle; input pruned to 5 of 11 columns. Money
    columns are aggregated as integer cents (rounded per row BEFORE the sum)
    so the result is exact and order-independent — float sums vary with
    reduction order across engines, integers do not.
    """
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])

    def project(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": pa.array(
                    np.round(t["l_quantity"].to_numpy()).astype(np.int64)
                ),
                "base_cents": pa.array(np.round(price * 100).astype(np.int64)),
                # ×10^4: the true value is exactly integral (2-dp price ×
                # 2-dp discount), so numpy and DuckDB round identically —
                # ×100 would land on exact .5 and split on rounding mode
                "revenue_e4": pa.array(
                    np.round(price * (1.0 - disc) * 10000).astype(np.int64)
                ),
                "disc_bp": pa.array(np.round(disc * 10000).astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("revenue_e4", alias_name="sum_revenue_e4"),
            Sum("disc_bp", alias_name="sum_disc_bp"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def top_orders(
    sf_dir: str, k: int = 10, use_global_sort: bool = False
) -> pd.DataFrame:
    """Global top-k by value (A1's global cousin).

    Default plan: PARTIAL top-k — each batch keeps its local k rows
    (vectorized ``argpartition``-style nsmallest over the negated key) and
    the driver merges O(blocks × k) candidate rows. No AllToAll Sort
    operator: a global sort moves the ENTIRE fact table through one
    exchange to keep k rows. ``use_global_sort=True`` keeps the sort-based
    plan as the operator showcase (same result, oracle-identical).

    ``o_orderkey`` tie-break (ascending) mirrors the oracle SQL exactly, so
    ties straddling the k boundary select the same rows in both engines."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    if use_global_sort:
        return (
            ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx)

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return (
        cand.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="stable",
        )
        .head(k)
        .reset_index(drop=True)
    )


def segment_revenue(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ orders via BROADCAST hash join (B3/B5 pattern): the small
    dimension side is ray.put once and looked up per batch — no shuffle join.
    """
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(
        dict(zip(cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy()))
    )
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_agg_batch(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        # vectorized gather: dict-backed pandas map is a C-speed hash probe;
        # then COMBINE locally — the exchange moves O(batches × segments)
        # partial rows, never one row per order (the 100 TB fact table)
        seg = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False)).map(lookup)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = (
            pd.DataFrame({"c_mktsegment": seg, "price_cents": cents})
            .groupby("c_mktsegment", as_index=False)
            .agg(rev_p=("price_cents", "sum"), n_p=("price_cents", "size"))
        )
        # explicit schema: an empty batch must not infer the key as Arrow
        # null type (mixed-schema blocks would break the groupby)
        return pa.table(
            {
                "c_mktsegment": pa.array(g["c_mktsegment"], pa.string()),
                "rev_p": pa.array(g["rev_p"], pa.int64()),
                "n_p": pa.array(g["n_p"], pa.int64()),
            }
        )

    out = (
        orders.map_batches(join_agg_batch, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("rev_p", alias_name="revenue_cents"),
            Sum("n_p", alias_name="n_orders"),
        )
        .to_pandas()
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def top_order_per_customer(sf_dir: str) -> pd.DataFrame:
    """Per-group top-1 (A1: per-right-entity nlargest).

    Top-1 is associative, so the plan is partial-reduce → merge: every batch
    keeps at most one row per customer (vectorized sort + drop_duplicates),
    the survivors are co-partitioned by ``hash(custkey) % P`` in ONE coarse
    exchange, and each of the P partition kernels runs the SAME vectorized
    reduction over its complete key range. Group-function invocations are
    O(P), not O(customers) — the round-2 per-key ``map_groups`` called
    Python once per customer, which is millions of calls at 100× key
    cardinality.
    """
    P = 32
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def best_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        ).drop_duplicates("o_custkey")

    def partial(t: pa.Table) -> pa.Table:
        g = best_per_key(t.to_pandas())
        g["pkey"] = (g["o_custkey"].to_numpy() % P).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(
            lambda g: best_per_key(g).drop(columns=["pkey"]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set (B4 eval-join analog): the order-side
    key set is collected (small) and the probe filters per batch."""
    keys = set(
        _t(sf_dir, "orders", ["o_custkey"])
        .unique("o_custkey")
    )
    key_ref = ray.put(keys)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        # vectorized anti-join probe: Arrow is_in kernel, no Python per row
        mask = pc.invert(
            pc.is_in(t["c_custkey"], value_set=pa.array(list(ks)))
        )
        return t.filter(mask)

    out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty:  # empty Dataset.to_pandas can drop the schema
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def event_type_stats(sf_dir: str) -> pd.DataFrame:
    """Grouped counts + extremes over the events table (A7)."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def milli(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "value": t["value"],
                "value_milli": pa.array(
                    np.round(t["value"].to_numpy() * 1000).astype(np.int64)
                ),
            }
        )

    out = (
        ds.map_batches(milli, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value_milli", alias_name="sum_value_milli"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """Distinct keys (A10: ds.unique)."""
    vals = sorted(_t(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def nation_region_counts(sf_dir: str) -> pd.DataFrame:
    """Two-level broadcast join (nation→region) + grouped count: the
    reference's type-blocking shape (B1) expressed relationally."""
    region = _t(sf_dir, "region").to_pandas()
    rmap_ref = ray.put(
        dict(zip(region["r_regionkey"].to_numpy(), region["r_name"].to_numpy()))
    )
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"])

    def tag(t: pa.Table) -> pa.Table:
        rmap = ray.get(rmap_ref)
        names = pd.Series(
            t["n_regionkey"].to_numpy(zero_copy_only=False)
        ).map(rmap)
        return pa.table(
            {"r_name": pa.Array.from_pandas(names, type=pa.string())}
        )

    out = (
        nation.map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_nations"))
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


def supplier_nation_stats(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation ⋈ region via a TWO-LEVEL broadcast chain (B5): the
    nation→region mapping is composed driver-side into one tiny
    suppkey-side lookup (nationkey → region name), ``ray.put`` once, probed
    per batch — the supplier fact side streams, no shuffle join. Grouped
    account-balance cents per region (exact integer sums)."""
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _t(sf_dir, "region").to_pandas()
    rname = dict(zip(region["r_regionkey"].to_numpy(), region["r_name"].to_numpy()))
    n2r = {
        int(nk): rname[int(rk)]
        for nk, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    ref = ray.put(n2r)
    supp = _t(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def tag(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        names = pd.Series(
            t["s_nationkey"].to_numpy(zero_copy_only=False)
        ).map(lookup)
        cents = np.round(t["s_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "r_name": pa.Array.from_pandas(names, type=pa.string()),
                "acctbal_cents": pa.array(cents),
            }
        )

    out = (
        supp.map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


def hourly_user_windows(sf_dir: str) -> pd.DataFrame:
    """Tumbling event-time window (SURVEY.md §2.7): Ray Data has no
    watermarks, so the window IS a group key — (user_id, hour bucket) →
    count + exact integer sum."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.strftime(t["ts"], format="%Y-%m-%d %H")
        milli = np.round(t["value"].to_numpy() * 1000).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "hour": hour,
                "value_milli": pa.array(milli),
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_milli", alias_name="sum_value_milli"),
        )
        .to_pandas()
    )
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows (SURVEY.md §2.7): per user, events sorted by ts;
    a gap > ``gap_minutes`` starts a new session.

    Ray shape: the ``events_asof_join`` pattern — ONE coarse exchange on
    ``hash(user_id) % P`` co-locates each user's events, and the partition
    kernel is fully vectorized over ALL its users at once: one sort by
    (user_id, ts), one ``diff``, session starts = (new user) ∨ (gap
    exceeded), per-user counts via a C-speed groupby-sum. O(P) group-
    function invocations — the round-2 per-user ``map_groups`` called
    Python once per user."""
    P = 32
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60_000_000

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {
                "pkey": pa.array((uid % P).astype(np.int64)),
                "user_id": pa.array(uid),
                "ts_us": pa.array(ts.astype(np.int64)),
            }
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        start = new_user | (np.diff(ts, prepend=ts[:1]) > gap_us)
        counts = pd.Series(start.astype(np.int64)).groupby(uid, sort=True).sum()
        return pd.DataFrame(
            {
                "user_id": counts.index.to_numpy(),
                "n_sessions": counts.to_numpy(),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def sliding_event_windows(sf_dir: str) -> pd.DataFrame:
    """SLIDING event-time windows (§2.7's third window class): 1-hour
    windows sliding by 15 minutes. Ray Data has no window operator, so each
    event REPLICATES to the exactly-4 windows covering it (the same
    replicate-to-bands shape as the range join), pre-aggregated per batch,
    then ONE tiny groupby-sum — the exchange moves per-batch partials, not
    events. Window key = floor(epoch/900s) − i for i ∈ 0..3; emitted as
    ``window_start`` epoch seconds."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def explode_windows(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        sec = ts.astype(np.int64) // 1_000_000
        slot = sec // 900
        milli = np.round(t["value"].to_numpy() * 1000).astype(np.int64)
        w_all = np.concatenate([(slot - i) * 900 for i in range(4)])
        m_all = np.tile(milli, 4)
        df = (
            pd.DataFrame({"window_start": w_all, "value_milli": m_all})
            .groupby("window_start", sort=False)
            .agg(n_partial=("value_milli", "size"),
                 sum_partial=("value_milli", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(explode_windows, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(
            Sum("n_partial", alias_name="n_events"),
            Sum("sum_partial", alias_name="sum_value_milli"),
        )
        .to_pandas()
    )
    return out.sort_values("window_start").reset_index(drop=True)


def top3_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Generalized per-group top-k (k=3): top-k is associative exactly like
    top-1 — per-batch partial top-3 per customer (vectorized sort + grouped
    head), ONE coarse exchange on ``hash(custkey) % P``, the same kernel as
    the merge. O(P) group-function invocations."""
    P = 32
    k = 3
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def topk_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(
                ["o_custkey", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby("o_custkey", sort=False)
            .head(k)
        )

    def partial(t: pa.Table) -> pa.Table:
        g = topk_per_key(t.to_pandas())
        g["pkey"] = (g["o_custkey"].to_numpy() % P).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(
            lambda g: topk_per_key(g).drop(columns=["pkey"]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    ).reset_index(drop=True)


def daily_order_totals(sf_dir: str) -> pd.DataFrame:
    """Time-bucketed aggregate over events-like data (§2.7: tumbling window
    expressed as a grouped aggregate on the bucket key — Ray Data has no
    event-time windows; the bucket column IS the window)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def bucket_partial(t: pa.Table) -> pa.Table:
        # bucket THEN combine locally: the exchange moves O(batches × days)
        # partial rows, not one row per order
        day = pc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = (
            pd.DataFrame({"day": day.to_pandas(), "price_cents": cents})
            .groupby("day", as_index=False)
            .agg(rev_p=("price_cents", "sum"), n_p=("price_cents", "size"))
        )
        # explicit schema: empty batches must not infer `day` as null type
        return pa.table(
            {
                "day": pa.array(g["day"], pa.string()),
                "rev_p": pa.array(g["rev_p"], pa.int64()),
                "n_p": pa.array(g["n_p"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("rev_p", alias_name="revenue_cents"),
            Sum("n_p", alias_name="n_orders"),
        )
        .to_pandas()
    )
    return out.sort_values("day").reset_index(drop=True)


def events_asof_join(sf_dir: str, num_partitions: int = 32) -> pd.DataFrame:
    """AS-OF JOIN — a custom operator Ray Data lacks (SURVEY brief §custom):
    for every event, the most recent event of the REFERENCE TYPE (the
    lexicographically first event_type — deterministic) by the same user at
    or before the event's timestamp.

    Physical plan: both sides tagged and co-partitioned by ``hash(user_id)``
    in ONE coarse exchange; each partition kernel runs a C-speed
    ``pandas.merge_asof(by=user_id, direction=backward)`` — the partitioning
    assumption is the standard one (all rows of a user co-located), and the
    kernel is vectorized, no per-row Python. Emits the matched timestamp
    (epoch micros, tie-invariant: equal-ts ties share the value) so the
    DuckDB ``ASOF JOIN`` oracle hash-matches exactly.
    """
    P = num_partitions  # the co-partition knob to raise on a real cluster
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    ref_type = min(ds.unique("event_type"))

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        is_ref = pc.equal(t["event_type"], pa.scalar(ref_type))
        return pa.table(
            {
                "pkey": pa.array((uid % P).astype(np.int64)),
                "user_id": pa.array(uid),
                "ts_us": pa.array(ts.astype(np.int64)),
                "event_id": t["event_id"],
                "is_ref": is_ref,
            }
        )

    def asof_kernel(g: pd.DataFrame) -> pd.DataFrame:
        left = g.sort_values("ts_us", kind="stable")[
            ["event_id", "user_id", "ts_us"]
        ]
        right = (
            g[g["is_ref"]]
            .sort_values("ts_us", kind="stable")[["user_id", "ts_us"]]
            .rename(columns={"ts_us": "asof_ts_us"})
        )
        if right.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "asof_ts_us": pd.Series(dtype="int64"),
                }
            )
        m = pd.merge_asof(
            left,
            right,
            left_on="ts_us",
            right_on="asof_ts_us",
            by="user_id",
            direction="backward",
        )
        m = m[m["asof_ts_us"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "asof_ts_us": m["asof_ts_us"].astype("int64"),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(asof_kernel, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def _sweep_pairs(cents: np.ndarray, delta: int, cap: int | None) -> tuple[
    np.ndarray, np.ndarray, int
]:
    """Output-linear within-band pair enumeration: ``cents`` must be sorted
    ascending; returns (ii, jj, n_dropped) index pairs with
    ``cents[jj] - cents[ii] <= delta`` and ``ii < jj``.

    Vectorized two-pointer sweep: per anchor ``i`` the partner count is one
    ``searchsorted`` away, and the (i, j) index arrays are materialized at
    OUTPUT size — never the O(m²) ``triu_indices`` block the round-2 kernel
    allocated. ``cap`` (optional) bounds the pairs GENERATED per call for
    degenerate bands (e.g. one price point shared by millions of rows, where
    the true output itself is quadratic); overflow is returned as
    ``n_dropped`` so the loss is observable, never silent.
    """
    m = len(cents)
    if m < 2:
        return np.array([], np.int64), np.array([], np.int64), 0
    hi = np.searchsorted(cents, cents + delta, side="right")
    counts = hi - np.arange(m) - 1  # partners strictly after each anchor
    total = int(counts.sum())
    dropped = 0
    if cap is not None and total > cap:
        cum = np.cumsum(counts)
        cut = int(np.searchsorted(cum, cap, side="left"))
        emitted_before = int(cum[cut - 1]) if cut else 0
        counts = counts.copy()
        counts[cut] = cap - emitted_before  # partial anchor at the boundary
        counts[cut + 1 :] = 0
        dropped = total - cap
    tot = int(counts.sum())
    ii = np.repeat(np.arange(m, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    jj = np.arange(tot, dtype=np.int64) - np.repeat(starts, counts) + ii + 1
    return ii, jj, dropped


def events_value_range_join(
    sf_dir: str,
    delta_cents: int = 1,
    max_pairs_per_band: int | None = None,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """RANGE JOIN — the second custom operator Ray Data lacks (SURVEY brief
    §custom): all event pairs whose ``value``s lie within ±delta_cents of
    each other (values are exact 2-dp quantities → the whole join runs in
    integer cents, so band assignment and the distance predicate are
    boundary-exact in both engines).

    Physical plan: WIDTH-δ banding — ``band = cents // δ`` — so any pair
    within δ has band numbers differing by at most 1 for EVERY δ (the
    round-2 per-cent bands silently dropped intermediate distances for
    δ ≥ 2). Each row replicates to its band and the band above; a pair then
    co-occurs in band ``max(band_a, band_b)``, which is its OWNER band —
    emitted exactly once globally, no dedup exchange. ONE coarse
    ``groupby(pkey)`` exchange; the partition kernel sorts each band by
    cents and runs a vectorized two-pointer sweep (``_sweep_pairs``) that is
    O(output), not O(m²) — one popular price point no longer allocates a
    quadratic index block. ``max_pairs_per_band`` caps generated pairs for
    degenerate equal-value bands (true output quadratic by definition);
    drops are counted in logs, never silent. Returns
    (id_a, id_b, value_diff_cents).
    """
    P = num_partitions  # the co-partition knob to raise on a real cluster
    delta = int(delta_cents)
    width = max(delta, 1)  # δ=0 degenerates to an exact-equality join
    ds = _t(sf_dir, "events", ["event_id", "value"])

    def explode_bands(t: pa.Table) -> pa.Table:
        cents = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        band0 = np.floor_divide(cents, width)
        band = np.concatenate([band0, band0 + 1])
        return pa.table(
            {
                "pkey": pa.array((band % P).astype(np.int64)),
                "band": pa.array(band),
                "event_id": pa.array(np.tile(eid, 2)),
                "cents": pa.array(np.tile(cents, 2)),
                # the ORIGINAL band rides along: ownership needs
                # max(band_a, band_b) of the un-replicated rows
                "band0": pa.array(np.tile(band0, 2)),
            }
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "cents", "event_id"], kind="stable")
        band = g["band"].to_numpy()
        cents = g["cents"].to_numpy()
        ids = g["event_id"].to_numpy()
        band0 = g["band0"].to_numpy()
        a_out, b_out, d_out = [], [], []
        n_dropped = 0
        bounds = np.nonzero(np.diff(band))[0] + 1
        for s, e in zip(
            np.concatenate([[0], bounds]), np.concatenate([bounds, [len(band)]])
        ):
            ii, jj, drop = _sweep_pairs(
                cents[s:e], delta, max_pairs_per_band
            )
            n_dropped += drop
            if not len(ii):
                continue
            ii += s
            jj += s
            keep = (
                (np.maximum(band0[ii], band0[jj]) == band[s])  # owner band
                & (ids[ii] != ids[jj])
            )
            ii, jj = ii[keep], jj[keep]
            lo = np.minimum(ids[ii], ids[jj])
            hi = np.maximum(ids[ii], ids[jj])
            a_out.append(lo)
            b_out.append(hi)
            d_out.append(np.abs(cents[ii] - cents[jj]))
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "events_value_range_join: %d pairs dropped by "
                "max_pairs_per_band=%s in degenerate bands",
                n_dropped, max_pairs_per_band,
            )
        if not a_out:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "value_diff_cents": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(a_out),
                "id_b": np.concatenate(b_out),
                "value_diff_cents": np.concatenate(d_out),
            }
        )

    out = (
        ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # empty Dataset.to_pandas can drop the schema
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "value_diff_cents": pd.Series(dtype="int64"),
            }
        )
    # ownership guarantees global uniqueness — no driver-side dedup net
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def event_user_counts(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped count-distinct at scale: distinct users + event counts
    per event_type.

    Plan: per-batch partial counts over (event_type, user_id) — the
    combiner dedups inside the batch so the exchange moves at most one row
    per (batch × distinct pair) — ONE groupby on the pair collapses to the
    global distinct set with exact per-pair event counts, and the second
    groupby is tiny (distinct pairs ≪ events). No sketch needed: this is
    the exact path; the approximate path would swap stage one for an HLL
    register merge with the identical topology."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["event_type", "user_id"], sort=False)
            .size()
            .reset_index(name="n_partial")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n_partial", alias_name="n_pair"))
    )

    def fold(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby("event_type", sort=False)
            .agg(n_users_partial=("user_id", "size"),
                 n_events_partial=("n_pair", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        pairs.map_batches(fold, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_users_partial", alias_name="n_users"),
            Sum("n_events_partial", alias_name="n_events"),
        )
        .to_pandas()
    )
    out = ensure_cols(out, event_type="object", n_users="int64",
                      n_events="int64")
    return out.sort_values("event_type").reset_index(drop=True)


def approx_user_counts(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """APPROXIMATE grouped count-distinct via HyperLogLog (Flajolet et al.
    2007, the standard public formulation) — the sketch path promised by
    ``event_user_counts``'s docstring: per-batch 2^p-register sketches (one
    4096-byte row per (batch × type)), element-wise-max merge per type, the
    bias-corrected estimate with linear-counting small-range correction on
    the driver. The exchange moves O(batches × types) fixed-size register
    blobs no matter how many events or users exist — the 100 TB shape.

    Exactness contract: none (approximate by design); the pytest bounds the
    relative error against the exact ``event_user_counts`` at ≤ 3%, well
    inside HLL's 1.04/√4096 ≈ 1.6% standard error."""
    from ..functions.hashing import splitmix64

    m = 1 << p
    wbits = 64 - p
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        types, regs = [], []
        for etype, sub in df.groupby("event_type", sort=False):
            h = splitmix64(
                sub["user_id"].to_numpy().astype(np.uint64)
            )
            idx = (h >> np.uint64(wbits)).astype(np.int64)
            w = h & np.uint64((1 << wbits) - 1)
            # rank of first 1-bit in the wbits-wide suffix; exact via float
            # log2 (w < 2^52 for p ≥ 12, representable in float64)
            bl = np.zeros(len(w), dtype=np.int64)
            nz = w > 0
            bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(
                np.int64
            ) + 1
            rho = (wbits - bl + 1).astype(np.uint8)
            reg = np.zeros(m, dtype=np.uint8)
            np.maximum.at(reg, idx, rho)
            types.append(etype)
            regs.append(reg.tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "registers": pa.array(regs, pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mats = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in g["registers"]]
        )
        reg = np.maximum.reduce(mats)
        # HLL estimate + linear-counting small-range correction
        est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(
            np.power(2.0, -reg.astype(np.float64))
        )
        zeros = int((reg == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "approx_users": [int(round(est))],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(out, event_type="object", approx_users="int64")
    return out.sort_values("event_type").reset_index(drop=True)


def exact_quantiles_int64(
    rows, col: str, qs: tuple[float, ...]
) -> list[int] | None:
    """Exact order statistics of an int64 Dataset column without a global
    sort — the histogram-selection plan shared by
    ``order_price_quantiles`` (here) and ``ann.embedding_spike_outliers``:
    min/max/count pass → fixed-width bucket histogram pre-aggregated per
    batch with ONE tiny groupby (≤ 65536 rows cross the exchange) → fetch
    only the buckets holding a requested order statistic (Arrow is_in
    filter) → driver-side sort of those few buckets, indexed at
    ``ceil(q*n) - 1`` — DuckDB's QUANTILE_DISC selection rule, verified
    empirically, so oracles hash-match exactly. Returns None on an empty
    column. At 100 TB the exchanges are O(buckets), never O(rows)."""
    stats = rows.aggregate(Min(col), Max(col), Count())
    if stats is None or not stats.get("count()"):
        return None
    lo, hi = int(stats[f"min({col})"]), int(stats[f"max({col})"])
    n = int(stats["count()"])
    width = max(1, (hi - lo + 1) // 65536)

    def hist(t: pa.Table) -> pa.Table:
        b = (t[col].to_numpy(zero_copy_only=False) - lo) // width
        keys, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(keys.astype(np.int64)),
                "n_partial": pa.array(counts.astype(np.int64)),
            }
        )

    hdf = (
        rows.map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_partial", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    cum = hdf["n"].cumsum().to_numpy()
    ranks = np.array([max(0, int(np.ceil(q * n)) - 1) for q in qs])
    need_idx = np.searchsorted(cum, ranks + 1, side="left")
    need = np.array(sorted(set(hdf["bucket"].iloc[need_idx])), np.int64)
    bucket_ref = ray.put(need)

    def fetch(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        mask = np.isin((v - lo) // width, ray.get(bucket_ref))
        return pa.table({col: pa.array(v[mask])})

    vals = np.sort(
        rows.map_batches(fetch, batch_format="pyarrow")
        .to_pandas()[col]
        .to_numpy()
    )
    bucket_of = (vals - lo) // width
    out = []
    for r in ranks:
        bi = int(np.searchsorted(cum, r + 1, side="left"))
        bstart = int(cum[bi - 1]) if bi else 0
        b = int(hdf["bucket"].iloc[bi])
        out.append(int(vals[bucket_of == b][r - bstart]))
    return out


def order_price_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> pd.DataFrame:
    """EXACT distributed quantiles of order price cents — one pruned-read
    map to an int64 column, then the shared ``exact_quantiles_int64``
    histogram-selection plan (three passes, O(buckets) exchanges — see its
    docstring for the 10^12-row argument)."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "price_cents": pa.array(
                    np.round(t["o_totalprice"].to_numpy() * 100).astype(
                        np.int64
                    )
                )
            }
        )

    col = ds.map_batches(cents, batch_format="pyarrow")
    vals = exact_quantiles_int64(col, "price_cents", qs)
    if vals is None:
        return typed_empty(q_bp="int64", price_cents="int64")
    return pd.DataFrame(
        {
            "q_bp": [int(round(q * 10000)) for q in qs],
            "price_cents": vals,
        }
    )


def approx_price_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    rate_mod: int = 8,
) -> pd.DataFrame:
    """Sampling-based approximate quantiles — the sketch-family sibling of
    the exact ``order_price_quantiles`` (as HLL is to the exact distinct
    count): EXACT order statistics of a DETERMINISTIC ``1/rate_mod``
    hash-sample of the rows. The sample predicate is the Knuth
    multiplicative mixer already used by the split oracles
    (``(key * 2654435761) mod 2**64 mod rate_mod == 0``), so membership is
    a pure function of ``o_orderkey`` — reproducible across runs, block
    layouts and cluster sizes, and exactly expressible in the DuckDB
    oracle. Returns ``(q_bp, approx_price_cents, sample_rows)``.

    Accuracy: by Dvoretzky-Kiefer-Wolfowitz the sampled q-quantile's true
    rank lies within ``q ± sqrt(ln(2/delta)/(2m))`` with prob 1-delta —
    pytest-pinned against the exact sibling. At 10^12 rows the scan still
    reads every row group (the filter is on a computed hash), but the
    quantile machinery downstream — histogram, bucket fetch — touches
    only 1/rate_mod of the data, and the whole pipeline stays the shared
    ``exact_quantiles_int64`` O(buckets)-exchange plan.
    """
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def sampled_cents(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (k.view(np.uint64) * np.uint64(2654435761)) % np.uint64(
            rate_mod
        )
        keep = bucket == 0
        pc_ = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        return pa.table({"price_cents": pa.array(pc_)})

    # materialize the sampled 8-byte rows once: count + the helper's three
    # passes reuse the same blocks instead of re-reading orders four times
    col = ds.map_batches(sampled_cents, batch_format="pyarrow").materialize()
    n = col.count()
    vals = exact_quantiles_int64(col, "price_cents", qs)
    if vals is None:
        return typed_empty(q_bp="int64", approx_price_cents="int64",
                           sample_rows="int64")
    return pd.DataFrame(
        {
            "q_bp": [int(round(q * 10000)) for q in qs],
            "approx_price_cents": vals,
            "sample_rows": np.int64(n),
        }
    )


def brand_part_stats(sf_dir: str) -> pd.DataFrame:
    """Grouped stats over the ``part`` table: count + retail-price cents sum
    per brand (A4/A7 over the remaining dimension table)."""
    ds = _t(sf_dir, "part", ["p_brand", "p_retailprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "price_cents": pa.array(
                    np.round(t["p_retailprice"].to_numpy() * 100).astype(np.int64)
                ),
            }
        )

    out = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("price_cents", alias_name="retail_cents"),
        )
        .to_pandas()
    )
    return out.sort_values("p_brand").reset_index(drop=True)


def props_k_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured column processing: the events ``props`` column is a
    JSON string; ``k`` is extracted with ONE vectorized Arrow RE2
    ``extract_regex`` per batch (no per-row json.loads) and aggregated per
    event_type with exact integer sums. The DuckDB oracle uses
    ``json_extract_string`` — two engines, one value."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
        )
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def priority_revenue(
    sf_dir: str, cutoff: str = "1997-06-01", num_partitions: int = 32
) -> pd.DataFrame:
    """TPC-H Q3-shaped filtered 3-way join: revenue per order priority for
    orders placed before ``cutoff`` with lineitems shipped after it.

    Scale shape: both date predicates are PUSHED TO THE READ
    (``read_parquet(filter=...)`` prunes row groups before any byte leaves
    storage), then the lineitem ⋈ orders join runs as the tagged-union
    co-partition on ``orderkey % P`` with per-partition pre-aggregation by
    priority — the second exchange moves P × n_priorities rows."""
    P = num_partitions  # the co-partition knob to raise on a real cluster
    cut = pa.scalar(np.datetime64(cutoff, "us"), pa.timestamp("us"))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < cut),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > cut),
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pkey": pa.array((ok % P).astype(np.int64)),
                "key": pa.array(ok),
                "o_orderpriority": t["o_orderpriority"],
                "revenue_e4": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        return pa.table(
            {
                "pkey": pa.array((ok % P).astype(np.int64)),
                "key": pa.array(ok),
                "o_orderpriority": pa.nulls(t.num_rows, pa.string()),
                "revenue_e4": pa.array(
                    np.round(price * (1.0 - disc) * 10000).astype(np.int64)
                ),
            }
        )

    merged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_and_partial_agg(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["o_orderpriority"].notna()][["key", "o_orderpriority"]]
        fact = g[g["revenue_e4"].notna()][["key", "revenue_e4"]].copy()
        fact["revenue_e4"] = fact["revenue_e4"].astype("int64")
        j = fact.merge(dim, on="key", how="inner")
        if j.empty:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series(dtype="object"),
                    "revenue_e4_partial": pd.Series(dtype="int64"),
                    "n_partial": pd.Series(dtype="int64"),
                }
            )
        agg = j.groupby("o_orderpriority", sort=False).agg(
            revenue_e4_partial=("revenue_e4", "sum"),
            n_partial=("revenue_e4", "size"),
        )
        return agg.reset_index()

    out = (
        merged.groupby("pkey")
        .map_groups(join_and_partial_agg, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("revenue_e4_partial", alias_name="revenue_e4"),
            Sum("n_partial", alias_name="n_lineitems"),
        )
        .to_pandas()
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def supplier_part_revenue(sf_dir: str, num_partitions: int = 32) -> pd.DataFrame:
    """LARGE × LARGE co-partitioned hash join — the generic shuffle join the
    broadcast pattern can't cover when NEITHER side fits in memory:
    lineitem ⋈ part on partkey, revenue cents per part type.

    Physical plan: both sides are tagged and hash-co-partitioned on the join
    key in ONE coarse exchange (``pkey = key % P``); each partition kernel
    runs a C-speed ``pandas.merge`` over its complete key range and
    PRE-AGGREGATES locally (partial sums per type), so the final global
    groupby moves only ``P × n_types`` tiny rows. At 100 TB this is the
    standard plan: the exchange volume is the two projected inputs, once.
    """
    P = num_partitions  # the co-partition knob to raise on a real cluster
    part = _t(sf_dir, "part", ["p_partkey", "p_type"])
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def tag_part(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pkey": pa.array((pk % P).astype(np.int64)),
                "key": pa.array(pk),
                "p_type": t["p_type"],
                "revenue_e4": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        return pa.table(
            {
                "pkey": pa.array((pk % P).astype(np.int64)),
                "key": pa.array(pk),
                "p_type": pa.nulls(t.num_rows, pa.string()),
                "revenue_e4": pa.array(
                    np.round(price * (1.0 - disc) * 10000).astype(np.int64)
                ),
            }
        )

    merged = part.map_batches(tag_part, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_and_partial_agg(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["p_type"].notna()][["key", "p_type"]]
        fact = g[g["revenue_e4"].notna()][["key", "revenue_e4"]].copy()
        # the tagged union carries nulls on the other side's columns, which
        # floats the int64 in pandas — restore exact integer arithmetic
        fact["revenue_e4"] = fact["revenue_e4"].astype("int64")
        j = fact.merge(dim, on="key", how="inner")
        if j.empty:
            return pd.DataFrame(
                {
                    "p_type": pd.Series(dtype="object"),
                    "revenue_e4_partial": pd.Series(dtype="int64"),
                    "n_partial": pd.Series(dtype="int64"),
                }
            )
        agg = j.groupby("p_type", sort=False).agg(
            revenue_e4_partial=("revenue_e4", "sum"),
            n_partial=("revenue_e4", "size"),
        )
        return agg.reset_index()

    out = (
        merged.groupby("pkey")
        .map_groups(join_and_partial_agg, batch_format="pandas")
        .groupby("p_type")
        .aggregate(
            Sum("revenue_e4_partial", alias_name="revenue_e4"),
            Sum("n_partial", alias_name="n_lineitems"),
        )
        .to_pandas()
    )
    return out.sort_values("p_type").reset_index(drop=True)


def event_type_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT (conditional aggregation): daily event counts, one column per
    event type.

    Scale shape — aggregate FIRST, reshape LAST: one exchange reduces the
    fact stream to (day, event_type, n) with per-batch partial counts; the
    aggregate is tiny at any corpus size (days × types rows), so the pivot
    itself is a driver-side reshape of an already-small frame. Never pivot
    pre-aggregation: wide conditional columns through the shuffle move
    |types| zeros per row. Missing (day, type) combinations fill 0, pivot
    columns are n_<type> sorted by type name (discovered from the
    aggregate, not hardcoded)."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                "event_type": t["event_type"],
            }
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if agg.empty:
        return typed_empty(day="object")
    wide = (
        agg.pivot_table(
            index="day", columns="event_type", values="n", fill_value=0
        )
        .astype("int64")
        .rename(columns=lambda c: f"n_{c}")
        .sort_index(axis=1)
    )
    wide.columns.name = None
    return wide.reset_index().sort_values("day").reset_index(drop=True)


def customer_region_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (grouping sets): customer counts + exact acctbal cents at
    three levels — (region, nation), per-region subtotal, grand total —
    rolled-up levels carry NULL keys (SQL ROLLUP semantics).

    Scale shape: the nation⋈region dim chain composes driver-side into one
    broadcast lookup (tiny, ``ray.put`` once); the customer fact stream is
    pre-reduced per batch to (region, nation) partials, ONE small groupby,
    and the super-aggregate levels are computed from the finest-level
    aggregate on the driver — rollup is post-aggregation of an
    already-small frame, never a second pass over the facts."""
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _t(sf_dir, "region").to_pandas()
    rname = dict(zip(region["r_regionkey"].to_numpy(), region["r_name"].to_numpy()))
    lookup = {
        int(nk): (rname[int(rk)], nn)
        for nk, nn, rk in zip(
            nation["n_nationkey"], nation["n_name"], nation["n_regionkey"]
        )
    }
    ref = ray.put(lookup)
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "region_name": [lk[int(k)][0] for k in nk],
                "nation_name": [lk[int(k)][1] for k in nk],
                "cents": cents,
            }
        )
        g = df.groupby(["region_name", "nation_name"], sort=False).agg(
            n_partial=("cents", "size"), cents_partial=("cents", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    fine = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby(["region_name", "nation_name"])
        .aggregate(
            Sum("n_partial", alias_name="n_customers"),
            Sum("cents_partial", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    fine = ensure_cols(
        fine, region_name="object", nation_name="object",
        n_customers="int64", acctbal_cents="int64",
    )
    if fine.empty:
        # SQL ROLLUP over zero facts: ONE grand-total row, COUNT(*) = 0 and
        # SUM(...) = NULL (nullable Int64, not 0 — SUM over the empty set).
        # acctbal_cents is nullable Int64 on BOTH paths so the schema is
        # invariant to row count (ADVICE r4: a dtype that flips with data
        # presence breaks strict dtype consumers).
        return pd.DataFrame(
            {
                "region_name": [None],
                "nation_name": [None],
                "n_customers": pd.array([0], dtype="int64"),
                "acctbal_cents": pd.array([pd.NA], dtype="Int64"),
            }
        )
    by_region = (
        fine.groupby("region_name", as_index=False)[
            ["n_customers", "acctbal_cents"]
        ].sum().assign(nation_name=None)
    )
    total = pd.DataFrame(
        {
            "region_name": [None],
            "nation_name": [None],
            "n_customers": [fine["n_customers"].sum()],
            "acctbal_cents": [fine["acctbal_cents"].sum()],
        }
    )
    out = pd.concat([fine, by_region, total], ignore_index=True)[
        ["region_name", "nation_name", "n_customers", "acctbal_cents"]
    ]
    return (
        out.astype({"n_customers": "int64", "acctbal_cents": "Int64"})
        .sort_values(
            ["region_name", "nation_name"], na_position="first"
        )
        .reset_index(drop=True)
    )


def user_event_lag(sf_dir: str, num_partitions: int = 32) -> pd.DataFrame:
    """Analytic window functions (LAG + ROW_NUMBER): per user ordered by
    (ts, event_id) — microseconds since the user's previous event
    (``prev_gap_us``, first event −1) and the 1-based event rank (``rn``).

    Physical plan: the sessionization shape — ONE coarse exchange on
    ``hash(user_id) % P`` co-locates each user's events; the partition
    kernel is vectorized over ALL its users (one sort, one shifted diff
    masked at user boundaries, one cumcount) — O(P) group invocations,
    no per-user Python."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {
                "pkey": pa.array((uid % num_partitions).astype(np.int64)),
                "event_id": t["event_id"],
                "user_id": pa.array(uid),
                "ts_us": pa.array(ts.astype(np.int64)),
            }
        )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same_user = np.concatenate([[False], uid[1:] == uid[:-1]])
        gap = np.diff(ts, prepend=ts[:1])
        prev_gap = np.where(same_user, gap, -1)
        # 1-based rank within user: cumcount over the sorted runs
        starts = ~same_user
        run_id = np.cumsum(starts) - 1
        idx = np.arange(len(uid))
        rn = idx - np.where(starts, idx, 0)[starts][run_id] + 1
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "prev_gap_us": prev_gap.astype(np.int64),
                "rn": rn.astype(np.int64),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(window, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(
        out, event_id="int64", user_id="int64",
        prev_gap_us="int64", rn="int64",
    )
    return out.sort_values("event_id").reset_index(drop=True)


def orders_above_customer_avg(
    sf_dir: str, num_partitions: int = 32
) -> pd.DataFrame:
    """Per-group normalization filter (the correlated-subquery shape
    ``price > AVG(price) OVER customer``): orders strictly above their own
    customer's average price.

    Exactness: the comparison is integer cross-multiplication —
    ``price_cents * n_orders > sum_cents`` — identical on both engines, so
    no float average ever exists to round differently. Scale shape: ONE
    coarse ``groupby(custkey % P)`` exchange; each partition kernel holds
    every order of its customers and computes the group sums with a
    vectorized pandas transform — O(P) kernel invocations, no broadcast of
    the per-customer aggregate table (O(customers) at 100 TB) and no
    second pass over the fact table."""
    P = num_partitions
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def tag(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array((ck % P).astype(np.int64)),
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": pa.array(cents),
            }
        )

    def above_avg(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("o_custkey")["price_cents"]
        s = grp.transform("sum").to_numpy()
        n = grp.transform("size").to_numpy()
        keep = g["price_cents"].to_numpy() * n > s
        return g.loc[keep, ["o_orderkey", "o_custkey", "price_cents"]]

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(above_avg, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(
        out, o_orderkey="int64", o_custkey="int64", price_cents="int64"
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)
