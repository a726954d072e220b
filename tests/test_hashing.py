import numpy as np

from entity_deduplication_hack_main_ray.functions import hashing as H


def test_shingle_hashes_deterministic_and_set():
    a = H.shingle_hashes("hello world", 5, seed=42)
    b = H.shingle_hashes("hello world", 5, seed=42)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)
    # different seed → different hashes
    c = H.shingle_hashes("hello world", 5, seed=43)
    assert not np.array_equal(a, c)


def test_shingle_short_and_empty_text():
    assert H.shingle_hashes("ab", 5, 42).shape[0] == 1
    assert H.shingle_hashes("", 5, 42).shape[0] == 1


def test_minhash_batched_equals_single():
    rng = np.random.default_rng(0)
    a, b = H.minhash_params(64, 42)
    sets = [
        np.unique(rng.integers(0, 2**63, size=s, dtype=np.uint64))
        for s in (5, 200, 1, 77)
    ]
    batched = H.minhash_signatures(sets, a, b)
    for i, s in enumerate(sets):
        assert np.array_equal(batched[i], H.minhash_signature(s, a, b))


def test_minhash_jaccard_estimate():
    """Signature agreement ≈ Jaccard (MinHash's defining property)."""
    rng = np.random.default_rng(1)
    a, b = H.minhash_params(256, 42)
    base = np.unique(rng.integers(0, 2**62, 1000, dtype=np.uint64))
    other = base.copy()
    other[:200] = rng.integers(0, 2**62, 200, dtype=np.uint64)  # ~0.67 jaccard
    s1 = H.minhash_signature(np.unique(base), a, b)
    s2 = H.minhash_signature(np.unique(other), a, b)
    est = (s1 == s2).mean()
    inter = len(np.intersect1d(base, other))
    true_j = inter / len(np.union1d(base, other))
    assert abs(est - true_j) < 0.08


def test_band_keys_equal_iff_rows_equal():
    rng = np.random.default_rng(2)
    sigs = rng.integers(0, 2**61, size=(2, 16), dtype=np.uint64)
    sigs[1] = sigs[0]
    sigs[1, 8] ^= np.uint64(1)  # corrupt band 2 (rows 8..11 with r=4)
    k = H.band_keys(sigs, 4, 4, seed=42)
    assert (k[0] == k[1]).tolist() == [True, True, False, True]


def test_chunk16_bands_hamming_collisions():
    v = np.array([0x1234_5678_9ABC_DEF0] * 2, dtype=np.uint64)
    v[1] ^= np.uint64(1)  # hamming 1 → differs in exactly one 16-bit chunk
    k = H.chunk16_bands(v, 4, tag=1, seed=42)
    assert (k[0] == k[1]).sum() == 3


def test_hamming_and_popcount():
    x = np.array([0b1011], dtype=np.uint64)
    y = np.array([0b0010], dtype=np.uint64)
    assert H.hamming64(x, y)[0] == 2
    assert H.popcount64(np.array([2**64 - 1], dtype=np.uint64))[0] == 64


def test_phash_reencode_stability():
    """pHash must be stable under PSNR≥40dB re-encoding (BASELINE.md)."""
    from entity_deduplication_hack_main_ray.functions.codecs import (
        decode_fake_jpeg,
        encode_fake_jpeg,
    )

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:64, 0:64]
    img = np.clip(
        x * 2 + y + rng.normal(0, 3, (64, 64)), 0, 255
    ).astype(np.uint8)
    h1 = H.phash64(img)
    h2 = H.phash64(decode_fake_jpeg(encode_fake_jpeg(img, 85)))
    # bits whose DCT coefficient sits at the median can flip under noise;
    # ≤8/64 keeps re-encodes within near-dup Hamming range (random ≈ 32)
    assert H.hamming64(
        np.array([np.uint64(h1 % 2**64)]), np.array([np.uint64(h2 % 2**64)])
    )[0] <= 8
    assert H.phash64(img) == h1  # deterministic


def test_phash_differs_for_different_images():
    rng = np.random.default_rng(6)
    a = H.phash64(rng.integers(0, 256, (32, 32), dtype=np.uint8))
    b = H.phash64(rng.integers(0, 256, (32, 32), dtype=np.uint8))
    assert a != b


def test_block_keys():
    keys = H.block_keys(
        [{"name": "ada", "email": "a@b"}, {"name": "ada"}, {"caption": "x"}],
        ("name", "email"),
        seed=42,
    )
    assert len(keys[0]) == 2 and len(keys[1]) == 1 and keys[2] == []
    assert keys[0][0] == keys[1][0]  # same name → same block key
