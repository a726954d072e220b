"""Driver-contract conformance: every queries() entry runs; every
oracle_sql() entry matches the Ray result (row count, schema, values) —
mirroring the driver's sf0.01 check at sf0.001 for speed."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(ray_session, name):
    ray_df = QUERIES[name](SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    with _duck() as con:
        duck_df = con.execute(ORACLES[name]).fetchdf()
    assert len(ray_df) == len(duck_df), f"{name}: row count"
    assert sorted(ray_df.columns) == sorted(duck_df.columns), f"{name}: schema"
    a, b = _canon(ray_df), _canon(duck_df)
    for c in a.columns:
        # pd.api.types handles pandas extension dtypes (e.g. the rollup's
        # nullable Int64) that np.issubdtype cannot interpret
        if pd.api.types.is_float_dtype(a[c]):
            assert np.allclose(a[c], b[c].astype(float), atol=1e-9), f"{name}.{c}"
        else:
            assert (
                a[c].astype(str).tolist() == b[c].astype(str).tolist()
            ), f"{name}.{c}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {
        "image_dedup_clusters", "image_dedup_edges", "golden_eval",
    })
)
def test_rows_only_queries_run(ray_session, name):
    df = QUERIES[name](SF_DIR)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    assert len(df) >= 0 and len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    assert len(df) > 0
    assert set(["image_id", "cluster_id", "cluster_size"]) <= set(df.columns)


def test_golden_eval_query(ray_session):
    df = entrymod.queries()["golden_eval"](SF_DIR)
    assert df["recall_bp"].iloc[0] >= 9900  # ≥ 0.99 recall vs golden
