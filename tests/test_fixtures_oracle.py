import numpy as np
import pyarrow as pa

from entity_deduplication_hack_main_ray.config import PipelineConfig
from entity_deduplication_hack_main_ray.fixtures import generate_corpus
from entity_deduplication_hack_main_ray.functions.codecs import decode_image, psnr
from entity_deduplication_hack_main_ray.functions.hashing import phash64
from entity_deduplication_hack_main_ray.oracle import (
    dup_pairs_from_clusters,
    oracle_match,
)
from entity_deduplication_hack_main_ray.state.unionfind import UnionFind


def test_generator_deterministic():
    c1, g1 = generate_corpus(30, seed=7)
    c2, g2 = generate_corpus(30, seed=7)
    assert c1.equals(c2) and g1.equals(g2)
    c3, _ = generate_corpus(30, seed=8)
    assert not c1.equals(c3)


def test_corpus_schema_matches_input_hint():
    c, _ = generate_corpus(10)
    assert [f.name for f in c.schema] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    assert c.schema.field("bytes").type == pa.binary()
    assert c.schema.field("phash").type == pa.int64()


def test_corpus_phash_column_agrees_with_decode():
    """Per-row invariant (input_hint): stored phash == recomputed phash."""
    c, _ = generate_corpus(20)
    for blob, fmt, ph in zip(
        c["bytes"].to_pylist()[:30],
        c["fmt"].to_pylist()[:30],
        c["phash"].to_pylist()[:30],
    ):
        assert phash64(decode_image(blob, fmt)) == ph


def test_reencode_duplicates_preserve_psnr():
    c, g = generate_corpus(60, seed=42)
    by_id = {i: (b, f) for i, b, f in zip(
        c["image_id"].to_pylist(), c["bytes"].to_pylist(), c["fmt"].to_pylist()
    )}
    n_checked = 0
    for o, d, v in zip(
        g["original_id"].to_pylist(),
        g["duplicate_id"].to_pylist(),
        g["variation_type"].to_pylist(),
    ):
        if v != "reencode":
            continue
        po = decode_image(*by_id[o])
        pd_ = decode_image(*by_id[d])
        assert po.shape == pd_.shape
        assert psnr(po, pd_) >= 40.0
        n_checked += 1
    assert n_checked > 0


def test_unionfind_min_id_root():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("b", "a")
    uf.union("x", "y")
    a = uf.assignments()
    assert a["a"] == a["b"] == a["c"] == "a"
    assert a["x"] == a["y"] == "x"


def test_oracle_recall_vs_golden():
    """The oracle (reference-semantics matcher) must find every injected
    duplicate pair — this is what makes it a valid recall target."""
    cfg = PipelineConfig()
    corpus, golden = generate_corpus(150, seed=42)
    _, clusters = oracle_match(corpus, cfg)
    pred = dup_pairs_from_clusters(clusters)
    gold = {
        tuple(sorted((o, d)))
        for o, d in zip(
            golden["original_id"].to_pylist(),
            golden["duplicate_id"].to_pylist(),
        )
    }
    assert gold, "fixture must contain golden pairs"
    recall = len(pred & gold) / len(gold)
    assert recall >= 0.99


def test_oracle_deterministic():
    cfg = PipelineConfig()
    corpus, _ = generate_corpus(50, seed=11)
    e1, c1 = oracle_match(corpus, cfg)
    e2, c2 = oracle_match(corpus, cfg)
    assert e1.equals(e2) and c1.equals(c2)


def test_golden_carries_entity_types():
    _, golden = generate_corpus(80, seed=42)
    types = set(golden["entity_type"].to_pylist())
    assert types <= {"Person", "Provider", "Organization"} and len(types) > 1


def test_eval_by_type_consistency(ray_session):
    """Per-type rows must sum to the overall golden_eval figures, and every
    type must clear the recall bar on the small corpus."""
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        eval_by_type,
        golden_eval,
    )

    sf = "/root/testdata/sf0.001"
    by_type = eval_by_type(sf)
    overall = golden_eval(sf)
    assert by_type["n_golden"].sum() == overall["n_golden"].iloc[0]
    assert by_type["true_positives"].sum() == overall["true_positives"].iloc[0]
    assert (by_type["recall_bp"] >= 9900).all()
    assert len(by_type) > 1


def test_eval_by_variation_typed_grid(ray_session):
    from entity_deduplication_hack_main_ray.pipelines.corpus_dedup import (
        eval_by_variation,
    )

    out = eval_by_variation("/root/testdata/sf0.001")
    assert set(out.columns) == {
        "variation_type", "entity_type", "n_golden", "n_found"
    }
    assert out["entity_type"].nunique() > 1
    assert (out["n_found"] <= out["n_golden"]).all()
