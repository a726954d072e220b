"""Training-data text analysis over the ``documents`` table: token counting,
quality scoring, language-ID, document fingerprinting.

All stages are TASK-pool ``map_batches`` with vectorized or C-speed kernels.
The regex patterns these kernels use are compiled once per worker process at
module import (they are module-level constants in ``functions/text.py``), so
a task pool gets the same amortization an actor pool would — without actor
spawn cost, and with operator fusion into the read.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions import text as tx


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _stats_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            "n_tokens": pa.array(
                [tx.whitespace_token_count(s) for s in texts], pa.int64()
            ),
        }
    )


def doc_stats(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_stats_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _quality_batch(t: pa.Table) -> pa.Table:
    rows = [tx.quality_features(s) for s in t["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pa.array([r[0] for r in rows], pa.int64()),
            "punct_ratio": pa.array([r[1] for r in rows], pa.float64()),
            "stopword_ratio": pa.array([r[2] for r in rows], pa.float64()),
            "mean_word_len": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def doc_quality(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_quality_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _lang_partial(t: pa.Table) -> pa.Table:
    """Per-batch COMBINER: classify then count locally, emitting one row per
    distinct language per batch — the global exchange then moves
    O(batches × languages) tiny rows instead of one row per document (the
    100 TB pre-aggregation path)."""
    langs = pd.Series([tx.lang_id(s) for s in t["text"].to_pylist()])
    counts = langs.value_counts()
    return pa.table(
        {
            "lang_guess": pa.array(counts.index.tolist(), pa.string()),
            "n_partial": pa.array(counts.to_numpy(), pa.int64()),
        }
    )


def lang_distribution(sf_dir: str) -> pd.DataFrame:
    """Heuristic n-gram lang-id → grouped counts, pre-aggregated per batch
    before the (tiny) global groupby-sum."""
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_lang_partial, batch_format="pyarrow")
        .groupby("lang_guess")
        .aggregate(Sum("n_partial", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("lang_guess").reset_index(drop=True)


def _fingerprint_batch(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "fingerprint": pa.array(
                [tx.fingerprint64(s) for s in t["text"].to_pylist()],
                pa.int64(),
            ),
        }
    )


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_fingerprint_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
