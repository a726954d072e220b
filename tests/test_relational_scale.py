"""Scale-shape tests for the custom relational operators: the range join's
output-linear sweep kernel (δ-generality + degenerate-band cap) and the
O(P)-group rewrites of top-order / sessions."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_deduplication_hack_main_ray.pipelines import relational

SF_DIR = "/root/testdata/sf0.001"


def _range_join_sql(delta: int) -> str:
    return f"""
        SELECT a.event_id AS id_a, b.event_id AS id_b,
               ABS(CAST(ROUND(a.value*100) AS BIGINT)
                   - CAST(ROUND(b.value*100) AS BIGINT)) AS value_diff_cents
        FROM read_parquet('{SF_DIR}/events.parquet') a
        JOIN read_parquet('{SF_DIR}/events.parquet') b
          ON a.event_id < b.event_id
         AND ABS(CAST(ROUND(a.value*100) AS BIGINT)
                 - CAST(ROUND(b.value*100) AS BIGINT)) <= {delta}
        ORDER BY id_a, id_b
    """


@pytest.mark.parametrize("delta", [0, 1, 2, 3, 7])
def test_range_join_matches_duckdb_for_all_deltas(ray_session, delta):
    """Round-2 per-cent banding silently dropped intermediate distances for
    δ ≥ 2 (ADVICE); width-δ banding must match DuckDB for every δ."""
    got = relational.events_value_range_join(SF_DIR, delta_cents=delta)
    want = duckdb.sql(_range_join_sql(delta)).fetchdf()
    assert len(got) == len(want), f"delta={delta}"
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"id_a": "int64", "id_b": "int64",
                     "value_diff_cents": "int64"}).reset_index(drop=True),
    )


def test_range_join_no_duplicate_pairs(ray_session):
    got = relational.events_value_range_join(SF_DIR, delta_cents=3)
    assert not got.duplicated(["id_a", "id_b"]).any()


def _write_events(tmpdir: str, values: np.ndarray) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(values), dtype=np.int64)),
            "value": pa.array(values.astype(np.float64)),
        }
    )
    pq.write_table(t, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def test_range_join_degenerate_band_cap(ray_session, tmp_path):
    """One popular price point: true output is quadratic; the cap bounds
    generated pairs (observable drop), uncapped returns the full set without
    ever allocating an O(m²) index block."""
    m = 4000
    d = _write_events(str(tmp_path / "deg"), np.full(m, 7.77))
    capped = relational.events_value_range_join(
        d, delta_cents=1, max_pairs_per_band=5000
    )
    assert len(capped) <= 5000
    full = relational.events_value_range_join(d, delta_cents=1)
    assert len(full) == m * (m - 1) // 2


def test_range_join_spread_values_output_linear(ray_session, tmp_path):
    """Values spaced 10 cents apart with δ=1 → zero pairs, fast."""
    vals = np.arange(20000, dtype=np.float64) * 0.10
    d = _write_events(str(tmp_path / "spread"), vals)
    out = relational.events_value_range_join(d, delta_cents=1)
    # neighbours are exactly 10 cents apart → no pair within 1 cent
    assert len(out) == 0


def test_sweep_pairs_kernel():
    cents = np.array([0, 0, 1, 3, 3, 3, 10], dtype=np.int64)
    ii, jj, dropped = relational._sweep_pairs(cents, 1, None)
    got = set(zip(ii.tolist(), jj.tolist()))
    want = {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}
    assert got == want and dropped == 0
    ii, jj, dropped = relational._sweep_pairs(cents, 1, 4)
    assert len(ii) == 4 and dropped == 2
    # capped emission is the deterministic prefix of the sweep order
    assert set(zip(ii.tolist(), jj.tolist())) == {
        (0, 1), (0, 2), (1, 2), (3, 4)
    }


def _write_orders(tmpdir: str, prices: np.ndarray) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(len(prices), dtype=np.int64)),
            "o_totalprice": pa.array(prices.astype(np.float64)),
        }
    )
    pq.write_table(t, os.path.join(tmpdir, "orders.parquet"))
    return tmpdir


def test_order_price_quantiles_matches_duckdb_on_skewed_data(
    ray_session, tmp_path
):
    """Histogram-selection quantiles vs DuckDB QUANTILE_DISC on data with
    heavy repeats and outliers (bucket-boundary stress)."""
    rng = np.random.default_rng(7)
    prices = np.concatenate(
        [
            np.full(5000, 19.99),             # heavy repeat
            rng.uniform(1, 100, 3000),
            np.array([99999.99, 0.01]),       # outliers stretch the range
        ]
    )
    d = _write_orders(str(tmp_path / "orders_skew"), prices)
    got = relational.order_price_quantiles(d)
    want = duckdb.sql(
        f"""
        WITH c AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS pc
                   FROM read_parquet('{d}/orders.parquet')),
             a AS (SELECT QUANTILE_DISC(pc,0.25) v1, QUANTILE_DISC(pc,0.5) v2,
                          QUANTILE_DISC(pc,0.75) v3, QUANTILE_DISC(pc,0.95) v4
                   FROM c)
        SELECT UNNEST([2500,5000,7500,9500]) AS q_bp,
               UNNEST([v1,v2,v3,v4]) AS price_cents FROM a
        """
    ).fetchdf()
    assert got["price_cents"].tolist() == want["price_cents"].tolist()


def test_order_price_quantiles_tiny_input(ray_session, tmp_path):
    d = _write_orders(
        str(tmp_path / "orders_tiny"), np.array([5.0, 1.0, 3.0])
    )
    got = relational.order_price_quantiles(d, qs=(0.5,))
    assert got["price_cents"].tolist() == [300]


def test_approx_user_counts_within_hll_error(ray_session):
    """HLL sketch estimate vs the exact count-distinct: relative error must
    stay well inside the 2^12-register standard error."""
    exact = relational.event_user_counts(SF_DIR).set_index("event_type")[
        "n_users"
    ]
    approx = relational.approx_user_counts(SF_DIR).set_index("event_type")[
        "approx_users"
    ]
    assert set(exact.index) == set(approx.index)
    for etype in exact.index:
        rel = abs(approx[etype] - exact[etype]) / max(1, exact[etype])
        assert rel <= 0.03, (etype, approx[etype], exact[etype])


def test_approx_user_counts_deterministic(ray_session):
    a = relational.approx_user_counts(SF_DIR)
    b = relational.approx_user_counts(SF_DIR)
    pd.testing.assert_frame_equal(a, b)


def test_user_event_lag_partition_invariant(ray_session):
    """The window kernel must be exchange-layout independent: one giant
    partition (all users together) equals the default 32-way co-partition."""
    a = relational.user_event_lag(SF_DIR, num_partitions=1)
    b = relational.user_event_lag(SF_DIR, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)
    # spot physics: every user's rank sequence is 1..n with first gap -1
    first = b.sort_values(["user_id", "rn"]).groupby("user_id").first()
    assert (first["rn"] == 1).all()
    assert (first["prev_gap_us"] == -1).all()
    rest = b[b["rn"] > 1]
    assert (rest["prev_gap_us"] >= 0).all()


def test_event_type_pivot_counts_sum_to_total(ray_session):
    piv = relational.event_type_pivot(SF_DIR)
    n_cols = [c for c in piv.columns if c.startswith("n_")]
    assert len(n_cols) == 5
    total = int(piv[n_cols].to_numpy().sum())
    import ray.data

    n_events = ray.data.read_parquet(f"{SF_DIR}/events.parquet").count()
    assert total == n_events


def test_customer_region_rollup_levels_consistent(ray_session):
    roll = relational.customer_region_rollup(SF_DIR)
    fine = roll[roll["nation_name"].notna()]
    sub = roll[roll["nation_name"].isna() & roll["region_name"].notna()]
    grand = roll[roll["region_name"].isna()]
    assert len(grand) == 1
    assert grand["n_customers"].iloc[0] == fine["n_customers"].sum()
    per_region = fine.groupby("region_name")["acctbal_cents"].sum()
    for _, row in sub.iterrows():
        assert row["acctbal_cents"] == per_region[row["region_name"]]


def test_orders_above_customer_avg_partition_invariant(ray_session):
    import pandas as pd

    from entity_deduplication_hack_main_ray.pipelines.relational import (
        orders_above_customer_avg,
    )

    sf = "/root/testdata/sf0.001"
    a = orders_above_customer_avg(sf, num_partitions=4).reset_index(drop=True)
    b = orders_above_customer_avg(sf, num_partitions=32).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # full reference check (subsumes the single-order-customer property:
    # a lone order equals its own average and the filter is strictly >)
    orders = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    ref = set(orders.loc[
        orders["o_totalprice"]
        > orders.groupby("o_custkey")["o_totalprice"].transform("mean"),
        "o_orderkey",
    ])
    assert set(a["o_orderkey"]) == ref


def test_top_orders_partial_plan_equals_global_sort(ray_session):
    """Default top_orders is the partial-top-k plan (per-batch select_k +
    driver merge of O(blocks×k) rows, no AllToAll Sort); the sort-based
    showcase plan must agree row-for-row (VERDICT r3 #6)."""
    import pandas as pd

    sf = "/root/testdata/sf0.01"
    a = relational.top_orders(sf, k=10)
    b = relational.top_orders(sf, k=10, use_global_sort=True)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert len(a) == 10
