"""Training-data text analysis over the ``documents`` table: token counting,
quality scoring, language-ID, document fingerprinting.

All stages are ``map_batches`` with vectorized or C-speed kernels; the
regex-heavy stages use a callable CLASS (actor pool) so patterns compile once
per actor, mirroring the reference's load-model-once discipline
(``Run_Sembedding.py:18``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from ..functions import text as tx


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


class TextStats:
    """Actor-pool stage: per-doc char/token counts (compiled regexes held
    per actor)."""

    def __init__(self) -> None:
        # touch the module-level compiled patterns once so each actor pays
        # compilation exactly once (they are module-cached)
        tx.token_count("warm")

    def __call__(self, t: pa.Table) -> pa.Table:
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
        .map_batches(TextStats, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


class QualityScorer:
    """Actor-pool stage: cheap quality features for corpus filtering."""

    def __call__(self, t: pa.Table) -> pa.Table:
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
        .map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


class LangId:
    def __call__(self, t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_guess": pa.array(
                    [tx.lang_id(s) for s in t["text"].to_pylist()], pa.string()
                ),
            }
        )


def lang_distribution(sf_dir: str) -> pd.DataFrame:
    """Heuristic n-gram lang-id → grouped counts (pre-aggregated per batch
    would be the 100TB path; at test scale the single groupby suffices)."""
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("lang_guess")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("lang_guess").reset_index(drop=True)


class Fingerprinter:
    def __call__(self, t: pa.Table) -> pa.Table:
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
        .map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
