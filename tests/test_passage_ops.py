"""Crafted-value tests for the passage/gram curation operators added in
round 5's continuation: passage-level exact dedup (`dedup_passages`), the
directional duplicate-n-gram fraction (`dup_gram_fraction`) and NTILE
quality stratification (`quality_deciles`). The sf-table oracle equality
for all three is covered by the registry-wide compare in test_queries.py;
these tests pin the SEMANTICS on corpora where the expected values are
known by construction, plus partition-count invariance.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from entity_deduplication_hack_main_ray.pipelines import text_analysis as ta
from entity_deduplication_hack_main_ray.pipelines import text_dedup as td

SF001 = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    d = tmp_path / "docs"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return str(d)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_dedup_passages_crafted(ray_session, tmp_path):
    # doc 1: 40 words -> passages (1,0)=w0..w31, (1,1)=w32..w39
    # doc 2: same first 32 words + a distinct tail -> (2,0) dups (1,0)
    # doc 3: fully distinct
    shared = _words("a", 32)
    sf = _write_docs(
        tmp_path,
        [
            (1, shared + " " + _words("t", 8)),
            (2, shared + " " + _words("u", 8)),
            (3, _words("z", 40)),
        ],
    )
    out = td.dedup_passages(sf)
    idx = out.set_index(["doc_id", "chunk_idx"])
    assert tuple(idx.loc[(2, 0), ["rep_doc_id", "rep_chunk_idx"]]) == (1, 0)
    assert idx.loc[(2, 0), "is_dup"] == 1
    # every other passage is its own representative
    rest = out[~((out.doc_id == 2) & (out.chunk_idx == 0))]
    assert (rest.is_dup == 0).all()
    assert (rest.rep_doc_id == rest.doc_id).all()
    assert len(out) == 6


def test_dedup_passages_partition_invariant(ray_session):
    a = td.dedup_passages(SF001, num_partitions=3)
    b = td.dedup_passages(SF001, num_partitions=64)
    pd.testing.assert_frame_equal(a, b)
    assert a.is_dup.sum() > 0  # non-vacuous on the dup corpus


def test_dup_gram_fraction_directional(ray_session, tmp_path):
    # doc 20 is an exact copy of doc 10 (12 words -> 5 full 8-grams):
    # attribution is DIRECTIONAL (min doc_id), so 10 reads clean and 20
    # reads 100% duplicate. doc 30 has 7 words -> no grams, all zeros.
    text = _words("w", 12)
    sf = _write_docs(tmp_path, [(10, text), (20, text), (30, _words("q", 7))])
    out = ta.dup_gram_fraction(sf).set_index("doc_id")
    assert out.loc[10].tolist() == [5, 0, 0]
    assert out.loc[20].tolist() == [5, 5, 1_000_000]
    assert out.loc[30].tolist() == [0, 0, 0]


def test_dup_gram_fraction_partial_overlap(ray_session, tmp_path):
    # doc 2 shares exactly its first 8 words with doc 1 (one dup gram of
    # its 5): integer-division contract 1*1e6//5.
    sf = _write_docs(
        tmp_path,
        [
            (1, _words("s", 8) + " " + _words("x", 4)),
            (2, _words("s", 8) + " " + _words("y", 4)),
        ],
    )
    out = ta.dup_gram_fraction(sf).set_index("doc_id")
    assert out.loc[1].tolist() == [5, 0, 0]
    assert out.loc[2].tolist() == [5, 1, 200_000]


def test_dup_gram_fraction_partition_invariant(ray_session):
    a = ta.dup_gram_fraction(SF001, num_partitions=3)
    b = ta.dup_gram_fraction(SF001, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)
    assert (a.n_dup > 0).any()


def _ntile_reference(scores: pd.DataFrame, k: int) -> pd.Series:
    """Single-process NTILE replica: rank by (score DESC, doc_id ASC),
    first N%k buckets get N//k+1 rows."""
    s = scores.sort_values(
        ["quality_score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(s)
    small, rem = n // k, n % k
    sizes = [small + 1] * rem + [small] * (k - rem)
    dec = np.repeat(np.arange(1, k + 1), sizes)[:n]
    return pd.Series(dec, index=s.doc_id.to_numpy())


def test_quality_deciles_matches_ntile_replica(ray_session):
    out = ta.quality_deciles(SF001)
    ref = _ntile_reference(out[["doc_id", "quality_score"]], 10)
    got = out.set_index("doc_id").decile.sort_index()
    assert (got == ref.sort_index()).all()
    # ties exist in the fixture (several docs share a stopword ratio), so
    # this exercises the within-score doc_id ordering, not just the bins
    assert out.quality_score.duplicated().any()


def test_quality_deciles_small_n_edge(ray_session, tmp_path):
    # N=7 < k=10: NTILE gives 7 singleton buckets 1..7 (ordered by score
    # DESC then doc_id)
    rows = [(i, ("the and of to " * (i + 1)) + _words("m", 20)) for i in range(7)]
    sf = _write_docs(tmp_path, rows)
    out = ta.quality_deciles(sf)
    assert sorted(out.decile.tolist()) == [1, 2, 3, 4, 5, 6, 7]
    # highest stopword ratio -> decile 1
    top = out.sort_values(["quality_score", "doc_id"], ascending=[False, True])
    assert top.iloc[0].decile == 1


def test_redact_pii_planted(ray_session, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (1, "mail me at bob.smith+x@ex-ample.co.uk or 10.0.0.1"),
            (2, "call 555-123-4567 now ip 1.2.3.4"),
            (3, "no pii here at all"),
        ],
    )
    out = ta.redact_pii(sf).set_index("doc_id")
    assert out.loc[1, "clean_text"] == "mail me at <EMAIL> or <IP>"
    assert out.loc[1, ["n_emails", "n_ips", "n_phones"]].tolist() == [1, 1, 0]
    assert out.loc[2, "clean_text"] == "call <PHONE> now ip <IP>"
    assert out.loc[2, ["n_emails", "n_ips", "n_phones"]].tolist() == [0, 1, 1]
    assert out.loc[3, "clean_text"] == "no pii here at all"


def test_redact_pii_no_false_positives_on_corpus(ray_session):
    # the synthetic corpus carries no PII: the scrub must be the identity
    out = ta.redact_pii(SF001)
    assert (out[["n_emails", "n_ips", "n_phones"]].to_numpy() == 0).all()
    docs = pq.read_table(
        os.path.join(SF001, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out["clean_text"].to_numpy() == docs["text"].to_numpy()).all()


def test_pack_token_shards_crafted(ray_session, tmp_path):
    # budget 256, part_size 1000: doc ids 0,1,2 in part 0 with 100 tokens
    # each -> offsets 0/100/200 -> shard 0/0/0; doc 3 with 100 -> offset
    # 300 -> shard 1; doc 1001 starts part 1 at offset 0.
    rows = [(i, _words("w", 100)) for i in range(4)] + [(1001, _words("w", 100))]
    sf = _write_docs(tmp_path, rows)
    out = ta.pack_token_shards(sf).set_index("doc_id")
    assert out["tok_offset"].tolist() == [0, 100, 200, 300, 0]
    assert out["shard"].tolist() == [0, 0, 0, 1, 0]
    assert out.loc[1001, "part"] == 1


def test_pack_token_shards_shard_budget_property(ray_session):
    # a shard's token span starts within budget of its first doc: for every
    # consecutive doc pair in one (part, shard), offsets differ < 256 + max
    # doc length; and the first doc of each shard has tok_offset // 256 ==
    # shard by construction. Stronger: within a part, offsets are the
    # cumsum of n_tokens (exclusive), i.e. packing loses no tokens.
    out = ta.pack_token_shards(SF001)
    for _, g in out.groupby("part"):
        g = g.sort_values("doc_id")
        expect = np.concatenate(
            [[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]]
        )
        assert (g["tok_offset"].to_numpy() == expect).all()
        assert (g["shard"].to_numpy() == expect // 256).all()


def _exact_word_counts(sf_dir):
    import duckdb

    return duckdb.sql(
        f"""SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS word
              FROM read_parquet('{sf_dir}/documents.parquet'))
            GROUP BY word"""
    ).df().set_index("word")["n"]


def test_heavy_hitters_invariants(ray_session):
    # bounds hold for ANY batch layout: est <= true <= est + err_bound,
    # and every word with true count > err_bound is in the full summary
    out = ta.heavy_hitter_words(SF001, k=10**9, capacity=64)
    true = _exact_word_counts(SF001)
    assert (out.n_total == int(true.sum())).all()
    err = int(out.err_bound.iloc[0])
    got = out.set_index("word")["est_count"]
    for w, est in got.items():
        assert est <= true[w] <= est + err
    must_have = set(true[true > err].index)
    assert must_have <= set(got.index)
    assert len(out) <= 64


def test_heavy_hitters_exact_at_full_capacity(ray_session):
    # capacity >= vocabulary: the sketch degrades to exact counting and
    # equals the hash-green top_words bit-for-bit with a zero bound
    hh = ta.heavy_hitter_words(SF001, k=20, capacity=10**6)
    tw = ta.top_words(SF001, k=20)
    assert (hh.err_bound == 0).all()
    assert hh.word.tolist() == tw.word.tolist()
    assert hh.est_count.tolist() == tw.n.tolist()


def test_embedding_spike_outliers_planted(ray_session, tmp_path):
    # 16 healthy unit vectors with spread mass (max component ~0.5-0.56)
    # and ONE one-hot spike (max component 1.0): only the spike is flagged
    from entity_deduplication_hack_main_ray.pipelines import ann

    # healthy vectors: sign patterns of the flat unit vector, so every
    # spike score is exactly 1/sqrt(8) (IQR = 0 -> the fence collapses to
    # that value and only a genuinely different vector can be flagged)
    vecs = []
    for i in range(16):
        v = np.full(8, 1.0 / np.sqrt(8.0))
        signs = np.array([1 if (i >> b) & 1 else -1 for b in range(8)])
        vecs.append((v * signs).astype(np.float32))
    spike = np.zeros(8, np.float32)
    spike[3] = 1.0
    vecs.append(spike)
    d = tmp_path / "emb"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(17), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    out = ann.embedding_spike_outliers(str(d)).set_index("vec_id")
    assert out.loc[16, "is_outlier"] == 1
    assert out.loc[16, "spike_e6"] == 1_000_000
    assert (out.loc[:15, "is_outlier"] == 0).all()


def test_corpus_diff_crafted(ray_session, tmp_path):
    # ids crafted to hit all four statuses under the in-query derivation
    # (drop %10==0, modify %7==3, add %13==1 under + max(doc_id)+1 = 21):
    #   20 -> removed (20%10==0); 3 -> changed (3%7==3);
    #   1 -> unchanged AND source of added 22 (1%13==1); 5 -> unchanged
    from entity_deduplication_hack_main_ray.pipelines import incremental as inc

    sf = _write_docs(
        tmp_path,
        [(1, "alpha beta"), (3, "gamma delta"), (5, "epsilon"), (20, "zeta")],
    )
    out = inc.corpus_diff(sf).set_index("doc_id")["status"]
    assert out.to_dict() == {
        1: "unchanged",
        3: "changed",
        5: "unchanged",
        20: "removed",
        22: "added",
    }


def test_corpus_diff_no_id_collision(ray_session, tmp_path):
    # review-finding regression: a fixed +1e6 offset would collide a real
    # doc_id 1000001 with the copy derived from doc_id 1. The max+1 offset
    # keeps the namespaces disjoint: 1000001 stays classified on its own
    # row and the derived copy lands above the corpus range.
    from entity_deduplication_hack_main_ray.pipelines import incremental as inc

    sf = _write_docs(
        tmp_path, [(1, "alpha"), (1000001, "omega")]
    )
    out = inc.corpus_diff(sf).set_index("doc_id")["status"]
    # offset = 1000002: added copy of id 1 -> 1000003
    assert out.to_dict() == {
        1: "unchanged",
        1000001: "unchanged",
        1000003: "added",
    }


def test_corpus_diff_partition_invariant(ray_session):
    from entity_deduplication_hack_main_ray.pipelines import incremental as inc

    a = inc.corpus_diff(SF001, num_partitions=3)
    b = inc.corpus_diff(SF001, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.status.unique()) == {"added", "removed", "changed",
                                      "unchanged"}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 500), st.integers(1, 20))
    @settings(max_examples=80, deadline=None)
    def test_ntile_property(total, k):
        """_ntile must reproduce SQL NTILE for every (total, k): bucket
        sizes differ by at most 1, the first total%k buckets are the big
        ones, buckets are contiguous and non-decreasing in rank."""
        ranks = np.arange(total)
        dec = ta._ntile(ranks, total, k)
        if total == 0:
            assert len(dec) == 0
            return
        assert dec[0] == 1 and dec[-1] == min(k, total)
        sizes = pd.Series(dec).value_counts().sort_index()
        big, rem = total // k + 1, total % k
        for b, n in sizes.items():
            assert n == (big if b <= rem else big - 1) or k > total
        assert (np.diff(dec) >= 0).all()

    @given(
        st.lists(st.integers(1, 1000), min_size=0, max_size=60),
        st.integers(1, 10),
    )
    @settings(max_examples=80, deadline=None)
    def test_mg_compress_property(counts, capacity):
        """Misra-Gries invariants for ANY input: at most `capacity`
        counters survive, every surviving count shrinks by exactly thr,
        every dropped word had count <= thr, and est <= true <=
        est + thr for every word."""
        counts = np.array(counts, dtype=np.int64)
        words = np.array([f"w{i}" for i in range(len(counts))], object)
        w2, c2, thr = ta._mg_compress(words, counts, capacity)
        assert len(w2) <= capacity
        surv = dict(zip(w2, c2))
        for w, c in zip(words, counts):
            est = surv.get(w, 0)
            assert est <= c <= est + thr
            if w in surv:
                assert surv[w] == c - thr
            else:
                assert c <= thr

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_decontaminate_bloom_one_sided(ray_session):
    # Bloom decontamination may over-drop (false positive) but NEVER
    # under-drop: every doc the exact filter drops is dropped here, and
    # n_hits is a pointwise upper bound. Deterministic across runs.
    ex = td.decontaminate_docs(SF001).set_index("doc_id")
    bl = td.decontaminate_docs_bloom(SF001).set_index("doc_id")
    assert list(ex.index) == list(bl.index)
    assert ((ex.keep == 0) <= (bl.keep == 0)).all()  # no false negatives
    assert (bl.n_hits >= ex.n_hits).all()
    assert (ex.keep == 0).sum() > 0  # non-vacuous: real leaks exist
    bl2 = td.decontaminate_docs_bloom(SF001).set_index("doc_id")
    pd.testing.assert_frame_equal(bl.reset_index(), bl2.reset_index())


def test_decontaminate_bloom_exact_at_large_m(ray_session):
    # with m >> k*n the FP probability collapses: bloom == exact
    ex = td.decontaminate_docs(SF001)
    bl = td.decontaminate_docs_bloom(SF001, m_bits=1 << 26)
    pd.testing.assert_frame_equal(ex, bl)


def test_coverage_ledger_matches_registry():
    """Doc-drift guard: every explicitly numbered `| N | name |` row in
    COVERAGE.md's driver-sweep ledger must name the query actually at
    position N of __ray_entry__.queries() (1-based), and the advertised
    total must equal the registry size."""
    import re

    import __ray_entry__ as em

    names = list(em.queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "COVERAGE.md")).read()
    m = re.search(r"verification ledger \(all (\d+) registered queries\)", text)
    assert m and int(m.group(1)) == len(names)
    rows = re.findall(r"^\| (\d+) \| ([A-Za-z0-9_]+)", text, re.M)
    assert rows, "ledger rows not found"
    for num, name in rows:
        assert names[int(num) - 1] == name, (
            f"ledger row {num} says {name!r} but registry has "
            f"{names[int(num) - 1]!r}"
        )


def test_curate_corpus_stage_consistency(ray_session):
    """The composed curation DAG must agree with its independently
    verified stage queries: every curated doc passes the Gopher filter
    and the decontamination filter, is its own exact-dup representative,
    and carries the leakage-free split of its id; no two curated docs
    share a text fingerprint."""
    from entity_deduplication_hack_main_ray.pipelines import (
        text_analysis as ta2,
    )

    cur = td.curate_corpus(SF001)
    gop = ta2.gopher_repetition(SF001).set_index("doc_id")
    dec = td.decontaminate_docs(SF001).set_index("doc_id")
    for d in cur.doc_id:
        assert gop.loc[d, "keep"] == 1
        assert dec.loc[d, "keep"] == 1
    # split = the Knuth mixer of the survivor's OWN id (each survivor is
    # the min doc_id of its exact-text group among curated docs; note an
    # eval-source duplicate with a smaller id would NOT anchor the split
    # — eval docs carry no split — so leakage_free_split's corpus-wide
    # rep is deliberately not the reference here)
    ids = cur.doc_id.to_numpy().astype(np.uint64)
    bucket = (ids * np.uint64(2654435761)) % np.uint64(100)
    expect = np.where(bucket < 80, "train",
                      np.where(bucket < 90, "val", "test"))
    assert (cur.split.to_numpy() == expect).all()
    assert 0 < len(cur) < len(dec)  # every stage filtered something
    assert set(cur.split.unique()) <= {"train", "val", "test"}


def test_curate_corpus_partition_invariant(ray_session):
    a = td.curate_corpus(SF001, num_partitions=3)
    b = td.curate_corpus(SF001, num_partitions=64)
    pd.testing.assert_frame_equal(a, b)


def test_approx_price_quantiles_dkw_bound(ray_session):
    """The hash-sampled quantile's TRUE rank must lie within the DKW band
    q +/- sqrt(ln(2/delta)/(2m)) (delta = 1e-6) of the full data —
    checked against the exact full-data CDF in DuckDB. Deterministic
    across runs by construction (pure function of o_orderkey)."""
    import duckdb

    from entity_deduplication_hack_main_ray.pipelines import relational

    out = relational.approx_price_quantiles(SF001)
    m = int(out["sample_rows"].iloc[0])
    eps = float(np.sqrt(np.log(2 / 1e-6) / (2 * m)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF001}/orders.parquet')"
    )
    for _, row in out.iterrows():
        q = row["q_bp"] / 10000.0
        rank = con.execute(
            "SELECT AVG(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) <= ? "
            "AS DOUBLE)) FROM orders",
            [int(row["approx_price_cents"])],
        ).fetchone()[0]
        assert q - eps <= rank <= q + eps, (q, rank, eps)
    out2 = relational.approx_price_quantiles(SF001)
    pd.testing.assert_frame_equal(out, out2)
