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


# ---- chunk_documents (sliding-window passage chunking) ---------------------

from entity_deduplication_hack_main_ray.pipelines.text_analysis import (  # noqa: E402
    chunk_documents,
)


def test_chunk_documents_crafted(ray_session, tmp_path):
    d = str(tmp_path)
    words = [f"w{i}" for i in range(150)]  # 150 words → chunks at 0/48/96/144
    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": [" ".join(words), "solo"],
                  "lang": ["en", "en"], "source": ["s", "s"]}),
        os.path.join(d, "documents.parquet"),
    )
    out = chunk_documents(d)
    d0 = out[out["doc_id"] == 0].reset_index(drop=True)
    assert list(d0["chunk_idx"]) == [0, 1, 2, 3]
    assert list(d0["n_words_chunk"]) == [64, 64, 54, 6]
    assert d0.loc[0, "chunk_text"].split(" ") == words[0:64]
    assert d0.loc[1, "chunk_text"].split(" ") == words[48:112]
    assert d0.loc[3, "chunk_text"].split(" ") == words[144:150]
    d1 = out[out["doc_id"] == 1]
    assert len(d1) == 1 and d1.iloc[0]["chunk_text"] == "solo"
    # overlap contract: consecutive chunks share size - stride words
    assert d0.loc[0, "chunk_text"].split(" ")[48:] == \
        d0.loc[1, "chunk_text"].split(" ")[:16]


def test_chunk_documents_matches_oracle(ray_session):
    sf = "/root/testdata/sf0.001"
    got = chunk_documents(sf)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["chunk_documents"]).fetchdf()
    con.close()
    a = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = (
        want.astype({"doc_id": "int64", "chunk_idx": "int64",
                     "n_words_chunk": "int64"})
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)
