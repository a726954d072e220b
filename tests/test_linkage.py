"""Record-linkage pipeline (SURVEY.md §2.3 T6 analog): vectorized
Levenshtein kernel vs a pure-python reference, link semantics (near-dups
link back, garbled decoys rejected), determinism, and the full
driver-style oracle compare at sf0.01 (test_queries.py already runs the
sf0.001 compare via the oracle_sql registry)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from entity_deduplication_hack_main_ray.pipelines.linkage import (
    _GARBLED_OFFSET,
    _NEAR_OFFSET,
    levenshtein_matrix,
    record_linkage,
)

SF_DIR = "/root/testdata/sf0.001"


def _lev_ref(a: str, b: str) -> int:
    """Textbook Wagner-Fischer, row-rolling — the independent reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_kernel_matches_reference():
    left = ["", "a", "kitten", "sitting", "Customer#000000042",
            "flaw", "saturday", "xyz"]
    right = ["", "b", "sitting", "kitten", "Customer#00000004",
             "lawn", "sunday", "xyzxyzxyz"]
    got = levenshtein_matrix(left, right)
    for i, a in enumerate(left):
        for j, b in enumerate(right):
            assert got[i, j] == _lev_ref(a, b), (a, b)


def test_levenshtein_kernel_character_level_unicode():
    """Distances count CHARACTERS (code points), not UTF-8 bytes —
    'Müller' vs 'Muller' is 1 edit even though ü is 2 bytes; matches
    DuckDB's levenshtein and the pure-python reference."""
    left = ["Müller", "東京都", "naïve", "café"]
    right = ["Muller", "京都", "naive", "cafe"]
    got = levenshtein_matrix(left, right)
    for i, a in enumerate(left):
        for j, b in enumerate(right):
            assert got[i, j] == _lev_ref(a, b), (a, b)
    assert got[0, 0] == 1 and got[1, 1] == 1


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.text(max_size=10), min_size=1, max_size=5),
        st.lists(st.text(max_size=10), min_size=1, max_size=5),
    )
    @settings(max_examples=60, deadline=None)
    def test_levenshtein_kernel_property(left, right):
        """Random unicode strings (incl. empty, astral, combining chars):
        the vectorized kernel must agree with the textbook DP cell-for-cell."""
        got = levenshtein_matrix(left, right)
        for i, a in enumerate(left):
            for j, b in enumerate(right):
                assert got[i, j] == _lev_ref(a, b), (a, b)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_levenshtein_kernel_empty_sides():
    assert levenshtein_matrix([], ["a"]).shape == (0, 1)
    assert levenshtein_matrix(["a"], []).shape == (1, 0)
    assert levenshtein_matrix(["", ""], [""]).tolist() == [[0], [0]]


def test_record_linkage_semantics(ray_session):
    out = record_linkage(SF_DIR)
    near = out[out["r_id"] < _GARBLED_OFFSET]
    # every near-dup right links back to exactly its original
    assert len(near) > 0
    assert (near["l_id"] == near["r_id"] - _NEAR_OFFSET).all()
    # every garbled decoy is rejected by the threshold
    assert (out["r_id"] >= _GARBLED_OFFSET).sum() == 0
    # one-to-one on the right side
    assert out["r_id"].is_unique
    # threshold respected
    assert (out["score_e6"] >= 500_000).all()


def test_record_linkage_deterministic(ray_session):
    a = record_linkage(SF_DIR)
    b = record_linkage(SF_DIR)
    pd.testing.assert_frame_equal(a, b)


def test_record_linkage_threshold_knob(ray_session):
    """A threshold above the near-dup score empties the result (F5-style
    pass/fail gate is real, not decorative)."""
    out = record_linkage(SF_DIR, threshold_e6=999_999)
    assert len(out) == 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_record_linkage_matches_oracle(ray_session, sf_dir):
    """The exact driver compare (rows, schema, canonicalized values) at two
    scale factors — sf0.01 is what the round driver would run."""
    got = record_linkage(sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["record_linkage"]).fetchdf()
    con.close()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    a = got.sort_values(["r_id"]).reset_index(drop=True)
    b = (
        want.astype({"r_id": "int64", "l_id": "int64", "score_e6": "int64"})
        .sort_values(["r_id"])
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("salt", [2, 5])
def test_record_linkage_salted_equals_unsalted(ray_session, salt):
    """left_salt > 1 (the scale path: lefts hash-split per block, rights
    replicated, sub-winners merged per right) must be byte-equal to the
    unsalted plan — per-right top-1 with (max score, min l_id) tie-break
    is associative over any partition of the lefts."""
    base = record_linkage(SF_DIR)
    salted = record_linkage(SF_DIR, left_salt=salt)
    pd.testing.assert_frame_equal(base, salted)


def test_link_block_chunked_equals_monolithic():
    """Forced pair_chunk=1 (one right record per DP call) must be
    byte-equal to the monolithic path — per-right top-1 is independent
    across rights, so chunking cannot change the result."""
    from entity_deduplication_hack_main_ray.pipelines.linkage import (
        _link_block,
    )

    rng = np.random.default_rng(7)
    n_l, n_r = 23, 17
    names = [f"Customer#{i:09d}" for i in range(n_l)]
    r_names = [names[int(i)][:-1] for i in rng.integers(0, n_l, n_r)]
    g = pd.DataFrame(
        {
            "rec_id": list(range(n_l)) + [10_000 + i for i in range(n_r)],
            "name": names + r_names,
            "nk": [0] * (n_l + n_r),
            "bal_cents": list(rng.integers(0, 1000, n_l))
            + list(rng.integers(0, 1000, n_r)),
            "seg": list(rng.choice(["A", "B"], n_l))
            + list(rng.choice(["A", "B"], n_r)),
            "side": np.array([0] * n_l + [1] * n_r, dtype=np.int8),
        }
    )
    mono = _link_block(g, 400_000, pair_chunk=1 << 22)
    tiny = _link_block(g, 400_000, pair_chunk=1)
    pd.testing.assert_frame_equal(
        mono.reset_index(drop=True), tiny.reset_index(drop=True)
    )
    assert len(mono) > 0


def test_record_linkage_single_side_block(ray_session):
    """A block present on only one side emits nothing (the reference's
    'only types present in both graphs are compared', B1)."""
    from entity_deduplication_hack_main_ray.pipelines.linkage import (
        _link_block,
    )

    g = pd.DataFrame(
        {
            "rec_id": [1, 2],
            "name": ["a", "b"],
            "nk": [0, 0],
            "bal_cents": [100, 200],
            "seg": ["X", "Y"],
            "side": np.array([0, 0], dtype=np.int8),
        }
    )
    out = _link_block(g, 500_000)
    assert len(out) == 0
    assert list(out.columns) == ["r_id", "l_id", "score_e6"]
