"""Training-data text analysis over the ``documents`` table: token counting,
quality scoring, language-ID, document fingerprinting.

All stages are TASK-pool ``map_batches`` with vectorized or C-speed kernels.
The regex patterns these kernels use are compiled once per worker process at
module import (they are module-level constants in ``functions/text.py``), so
a task pool gets the same amortization an actor pool would — without actor
spawn cost, and with operator fusion into the read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions import text as tx
from ..functions.frames import ensure_cols


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _stats_batch(t: pa.Table) -> pa.Table:
    # fully Arrow: utf8_length + one RE2 scan — no Python per row
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
            ),
        }
    )


def doc_stats(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_stats_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", n_chars="int64", n_tokens="int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _e6_ratio(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """floor(num/den * 1e6 + 0.5) with 0 where den == 0 — the exact-integer
    contract shared with the DuckDB oracle (identical double ops both sides,
    so value hashes cannot diverge on rounding mode)."""
    r = np.zeros(len(num), dtype=np.float64)
    nz = den > 0
    r[nz] = num[nz].astype(np.float64) / den[nz].astype(np.float64)
    return np.floor(r * 1e6 + 0.5).astype(np.int64)


def _quality_batch(t: pa.Table) -> pa.Table:
    """Vectorized quality features: every count is one Arrow RE2 kernel over
    the batch (``tx.QUALITY_*_RE`` — the same patterns the scalar
    ``tx.quality_features`` and the DuckDB oracle use)."""
    txt = t["text"]
    low = pc.utf8_lower(txt)

    def cnt(col, pat):
        return pc.count_substring_regex(col, pat).to_numpy(zero_copy_only=False)

    n = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
    punct = cnt(txt, tx.QUALITY_PUNCT_RE)
    words = cnt(low, tx.QUALITY_WORD_RE)
    wchars = cnt(low, tx.QUALITY_WCHAR_RE)
    stops = cnt(low, tx.QUALITY_STOP_RE)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pa.array(n.astype(np.int64)),
            "punct_ratio_e6": pa.array(_e6_ratio(punct, n)),
            "stopword_ratio_e6": pa.array(_e6_ratio(stops, words)),
            "mean_word_len_e6": pa.array(_e6_ratio(wchars, words)),
        }
    )


def doc_quality(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_quality_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", n_chars="int64",
                      punct_ratio_e6="int64", stopword_ratio_e6="int64",
                      mean_word_len_e6="int64")
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
    out = ensure_cols(out, lang_guess="object", n_docs="int64")
    return out.sort_values("lang_guess").reset_index(drop=True)


def _fingerprint_batch(t: pa.Table) -> pa.Table:
    # one rolling-hash pass over the batch + a reduceat min per doc — no
    # per-document numpy call chain
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "fingerprint": pa.array(
                tx.fingerprint64_batch(t["text"].to_pylist()), pa.int64()
            ),
        }
    )


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_fingerprint_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", fingerprint="int64")
    return out.sort_values("doc_id").reset_index(drop=True)
