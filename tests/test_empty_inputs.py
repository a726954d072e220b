"""Empty-input hardening: every documents/events/orders/embeddings pipeline
must return a TYPED empty frame (schema intact) on zero-row tables — the
failure mode is Ray's empty-Dataset.to_pandas() dropping the schema, which
round-3 guards with functions.frames.ensure_cols/typed_empty."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in ["documents", "events", "orders", "embeddings", "customer"]:
        tbl = duckdb.sql(
            f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0"
        ).arrow()
        pq.write_table(pa.table(tbl), os.path.join(d, f"{t}.parquet"))
    return d


CASES = [
    ("exact_dedup_docs", ["doc_id", "text"]),
    ("minhash_lsh_dedup_docs", ["doc_id", "cluster_id"]),
    ("simhash_dedup_docs", ["doc_id", "cluster_id"]),
    ("simhash_docs", ["doc_id", "simhash"]),
    ("doc_stats", ["doc_id", "n_chars", "n_tokens", "n_tokens_bpe"]),
    ("doc_quality", ["doc_id", "n_chars", "punct_ratio_e6",
                     "stopword_ratio_e6", "mean_word_len_e6"]),
    ("doc_fingerprints", ["doc_id", "fingerprint"]),
    ("lang_distribution", ["lang_guess", "n_docs"]),
    ("top_words", ["word", "n"]),
    ("gopher_repetition", ["doc_id", "n_words", "n_distinct_words",
                           "top_word_n", "top_bigram_n", "dup_word_frac_e6",
                           "top_word_frac_e6", "top_bigram_frac_e6", "keep"]),
    ("repeated_passages", ["doc_id", "n_shingles", "n_shared",
                           "shared_frac_e6"]),
    ("event_user_counts", ["event_type", "n_users", "n_events"]),
    ("approx_user_counts", ["event_type", "approx_users"]),
    ("order_price_quantiles", ["q_bp", "price_cents"]),
    ("approx_price_quantiles", ["q_bp", "approx_price_cents",
                                "sample_rows"]),
    ("substring_dedup_docs", ["doc_id", "cluster_id"]),
    ("leakage_free_split", ["doc_id", "rep_id", "split"]),
    ("decontaminate_docs", ["doc_id", "n_hits", "keep"]),
    ("stratified_sample", ["doc_id", "lang", "bucket"]),
    ("source_contamination", ["source_a", "source_b", "n_pairs"]),
    ("substring_dup_pairs", ["id_a", "id_b", "n_shared_grams"]),
    ("events_value_range_join", ["id_a", "id_b", "value_diff_cents"]),
    ("ann_cosine_topk", ["query_id", "vec_id", "cos_sim_e6"]),
    ("ann_lsh_topk", ["query_id", "vec_id", "cos_sim_e6"]),
    ("ann_ivf_topk", ["query_id", "vec_id", "cos_sim_e6"]),
    ("embedding_near_dup_pairs", ["id_a", "id_b", "cos_sim_e6"]),
    ("text_embed_near_dup_pairs", ["id_a", "id_b", "cos_sim_e6"]),
    ("semdedup_prune", ["vec_id", "cluster_id", "max_lower_cos_e6", "keep"]),
    ("knn_graph", ["vec_id", "nbr_id", "cos_sim_e6", "nbr_rank"]),
    ("orders_above_customer_avg", ["o_orderkey", "o_custkey", "price_cents"]),
    ("user_event_lag", ["event_id", "user_id", "prev_gap_us", "rn"]),
    # pivot columns are data-dependent: empty input → just the key column
    ("event_type_pivot", ["day"]),
    ("audio_frame_features", ["media_id", "frame_idx", "energy_e6",
                              "centroid_mhz"]),
    ("video_frame_stats", ["media_id", "frame_idx", "mean_e6"]),
    ("record_linkage", ["r_id", "l_id", "score_e6"]),
    ("tfidf_top_terms", ["doc_id", "word", "tf", "df", "score"]),
    ("chunk_documents", ["doc_id", "chunk_idx", "n_words_chunk",
                         "chunk_text"]),
    ("dedup_passages", ["doc_id", "chunk_idx", "rep_doc_id",
                        "rep_chunk_idx", "is_dup"]),
    ("dup_gram_fraction", ["doc_id", "n_grams", "n_dup", "dup_frac_e6"]),
    ("quality_deciles", ["doc_id", "quality_score", "decile"]),
    ("redact_pii", ["doc_id", "n_emails", "n_ips", "n_phones",
                    "clean_text"]),
    ("pack_token_shards", ["doc_id", "part", "n_tokens", "tok_offset",
                           "shard"]),
    ("heavy_hitter_words", ["word", "est_count", "err_bound", "n_total"]),
    ("embedding_spike_outliers", ["vec_id", "spike_e6", "is_outlier"]),
    ("corpus_diff", ["doc_id", "status"]),
    ("decontaminate_docs_bloom", ["doc_id", "n_hits", "keep"]),
    ("curate_corpus", ["doc_id", "n_tokens", "split", "tok_offset",
                       "shard"]),
]
# (customer_region_rollup is absent from CASES because SQL ROLLUP yields
# ONE grand-total row even on empty input — pinned by its own test below.)


def test_rollup_empty_customers_matches_sql(ray_session, tmp_path):
    """GROUP BY ROLLUP over zero facts: exactly one all-NULL-key row with
    COUNT(*) = 0 and SUM(...) = NULL (not 0) — ADVICE r3."""
    import pandas as pd

    from entity_deduplication_hack_main_ray.pipelines.relational import (
        customer_region_rollup,
    )

    d = str(tmp_path)
    for t in ["nation", "region"]:
        pq.write_table(
            pa.table(duckdb.sql(f"SELECT * FROM '{SRC}/{t}.parquet'").arrow()),
            os.path.join(d, f"{t}.parquet"),
        )
    pq.write_table(
        pa.table(
            duckdb.sql(f"SELECT * FROM '{SRC}/customer.parquet' LIMIT 0").arrow()
        ),
        os.path.join(d, "customer.parquet"),
    )
    out = customer_region_rollup(d)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["region_name"] is None and row["nation_name"] is None
    assert row["n_customers"] == 0
    assert pd.isna(row["acctbal_cents"])  # SUM over empty = NULL, never 0
    # schema invariance (ADVICE r4): the dtype must not flip with row count
    full = customer_region_rollup(SRC)
    assert out.dtypes.equals(full.dtypes)
    assert str(full["acctbal_cents"].dtype) == "Int64"


@pytest.mark.parametrize("name,cols", CASES, ids=[c[0] for c in CASES])
def test_empty_input_keeps_schema(ray_session, empty_sf, name, cols):
    import __ray_entry__ as em

    df = em.queries()[name](empty_sf)
    assert len(df) == 0
    assert set(cols) <= set(df.columns)
