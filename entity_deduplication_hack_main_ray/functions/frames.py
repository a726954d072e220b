"""Tiny result-frame helpers.

``Dataset.to_pandas()`` on a fully-empty result drops the schema (no blocks
→ no columns), so every driver query that sorts/selects by name needs a
typed empty frame to fall back on — one shared helper instead of ad-hoc
guards per query."""

from __future__ import annotations

import pandas as pd


def typed_empty(**cols: str) -> pd.DataFrame:
    """Empty DataFrame with named, typed columns: ``typed_empty(a="int64")``."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def ensure_cols(df: pd.DataFrame, **cols: str) -> pd.DataFrame:
    """``df`` unchanged when non-empty; a typed empty frame otherwise."""
    if len(df.columns) and not df.empty:
        return df
    return typed_empty(**cols)
