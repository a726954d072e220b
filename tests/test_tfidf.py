"""tfidf_top_terms: crafted-corpus value pin (a term unique to one doc must
outscore corpus-wide stopwords), determinism, and the driver-style oracle
compare at sf0.01 (test_queries.py covers sf0.001 via the registry)."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from entity_deduplication_hack_main_ray.pipelines.text_analysis import (
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tfidf"))
    texts = [
        "the cat sat on the mat",        # 'cat'/'sat'/'mat' unique
        "the dog ran in the park",
        "the dog and the cat met",
        "quantum quantum quantum flux",   # tf=3 on a unique term
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(4)), "text": texts,
                  "lang": ["en"] * 4, "source": ["s"] * 4}),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_tfidf_unique_term_outranks_stopword(ray_session, tiny_corpus):
    out = tfidf_top_terms(tiny_corpus, k=2)
    # doc 3: 'quantum' (tf=3, df=1, score=3*4//1=12) must rank above
    # 'flux' (tf=1, df=1, score=4)
    d3 = out[out["doc_id"] == 3].reset_index(drop=True)
    assert list(d3["word"]) == ["flux", "quantum"]  # output word-sorted
    top = d3.sort_values("score", ascending=False).iloc[0]
    assert top["word"] == "quantum" and top["score"] == 12
    # 'the' (df=3) never makes doc 0's top-2 over its unique terms
    d0 = out[out["doc_id"] == 0]
    assert "the" not in set(d0["word"])
    # scores are the exact integers tf * n_docs // df
    for _, r in out.iterrows():
        assert r["score"] == r["tf"] * 4 // r["df"]


def test_tfidf_deterministic(ray_session, tiny_corpus):
    a = tfidf_top_terms(tiny_corpus)
    b = tfidf_top_terms(tiny_corpus)
    pd.testing.assert_frame_equal(a, b)


def test_tfidf_matches_oracle_sf001(ray_session):
    sf = "/root/testdata/sf0.01"
    got = tfidf_top_terms(sf)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["tfidf_top_terms"]).fetchdf()
    con.close()
    a = got.sort_values(["doc_id", "word"]).reset_index(drop=True)
    b = (
        want.astype({"doc_id": "int64", "tf": "int64", "df": "int64",
                     "score": "int64"})
        .sort_values(["doc_id", "word"])
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)
