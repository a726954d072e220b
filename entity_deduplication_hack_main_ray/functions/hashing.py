"""Deterministic hash families: shingle hashing, MinHash, SimHash, pHash, bands.

Everything derives from a single ``seed`` (see ``PipelineConfig``), so the Ray
pipeline and the single-process oracle produce bit-identical signatures — the
property the recall≥0.99 acceptance test rests on (the reference gets the same
property from fixed random seeds, reference ``embedding_utils.py:83,93``).

All kernels are pure numpy on ``uint64`` with natural mod-2^64 wraparound —
the standard "multiply-shift" universal-hash family. No Python-level loops
over characters; per-document loops only where document lengths are ragged
(with numpy inner ops), which benchmarking shows is batch-cost dominated by
the vectorized matrix work.
"""

from __future__ import annotations

import numpy as np

# mod-2^64 wraparound is intentional throughout this module
_ERRSTATE = {"over": "ignore"}

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer — public-domain integer mixer (Steele et al.)."""
    with np.errstate(**_ERRSTATE):
        z = np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))


def hash64_bytes(data: bytes, seed: int = 0) -> int:
    """FNV-1a 64-bit over raw bytes, seed-mixed. For ids / band keys."""
    h = int(_FNV_OFFSET) ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def shingle_hashes(text: str, k: int, seed: int) -> np.ndarray:
    """64-bit hashes of all character ``k``-shingles of ``text`` (vectorized).

    Polynomial hash over the UTF-8 code units with FNV base, computed as a
    sliding-window × powers product — one numpy expression per document, no
    per-character Python loop. Texts shorter than ``k`` hash as one shingle
    (the whole text) so short captions still participate (mirrors the
    reference's tolerance of low-evidence records, ``similarity_utils.py:49``).
    Returns unique shingle hashes (a set, as MinHash requires).
    """
    raw = text.encode("utf-8", "surrogatepass")
    codes = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    n = codes.shape[0]
    if n == 0:
        return np.array([splitmix64(np.uint64(seed))], dtype=np.uint64)
    if n < k:
        k = n
    with np.errstate(**_ERRSTATE):
        powers = np.empty(k, dtype=np.uint64)
        p = np.uint64(1)
        for i in range(k - 1, -1, -1):
            powers[i] = p
            p = p * _FNV_PRIME
        win = np.lib.stride_tricks.sliding_window_view(codes, k)
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
        h = splitmix64(h + np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return np.unique(h)


_M31 = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31 - 1


def _fold31(x: np.ndarray) -> np.ndarray:
    """Fold 64-bit shingle hashes into [0, 2^31-1) (the hash-family domain)."""
    f = (x ^ (x >> np.uint64(31)) ^ (x >> np.uint64(62))) & _M31
    return np.where(f == _M31, np.uint64(0), f)


def shingle_hash_stream(
    texts: list[str], k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched shingle hashing for a whole batch of texts → (hashes,
    offsets) where ``hashes[offsets[i]:offsets[i+1]]`` are doc i's k-shingle
    hashes (MULTISET — duplicates kept; MinHash's min is unaffected by
    multiplicity and SimHash becomes occurrence-weighted, used consistently
    by engine and oracle).

    One rolling-hash pass over the concatenated bytes instead of a per-doc
    numpy call chain — the per-doc path spends more time in call overhead
    than hashing at caption lengths. Texts shorter than ``k`` (incl. empty)
    are NUL-padded to ``k`` so they contribute exactly one shingle.
    """
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    raws = []
    for t in texts:
        r = t.encode("utf-8", "surrogatepass")
        if len(r) < k:
            r = r + b"\x00" * (k - len(r))
        raws.append(r)
    lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    big = np.frombuffer(b"".join(raws), dtype=np.uint8).astype(np.uint64)

    powers = np.empty(k, dtype=np.uint64)
    p = 1
    for i in range(k - 1, -1, -1):
        powers[i] = np.uint64(p)
        p = (p * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    win = np.lib.stride_tricks.sliding_window_view(big, k)
    h_all = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    h_all = splitmix64(h_all + np.uint64(seed & 0xFFFFFFFFFFFFFFFF))

    # valid window positions per doc: [starts[i], starts[i] + len_i - k]
    cnt = lens - k + 1
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])
    # ragged ranges: global position index for every (doc, local window)
    base = np.repeat(starts[:-1] - offsets[:-1], cnt)
    pos = base + np.arange(offsets[-1], dtype=np.int64)
    return h_all[pos], offsets


_POLY_B2 = np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)  # second odd base


def char_ngram_hash2_stream(
    texts: list[str], L: int, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, offsets): TWO independent 64-bit polynomial hashes (distinct
    odd multiplier bases, independently seed-finalized) of every CHARACTER
    ``L``-gram of every text; ``h*[offsets[i]:offsets[i+1]]`` belong to doc
    i, in window order. Character-exact — the stream is UTF-32 code units,
    so window boundaries agree with SQL ``substr`` on any text, not just
    ASCII. Texts shorter than ``L`` contribute NO windows (a doc cannot
    share an L-substring it doesn't have). One sliding-window pass over the
    concatenated batch; windows crossing document boundaries are excluded
    by the ragged position index. The (h1, h2) pair is an effectively
    128-bit key: two distinct windows collide on BOTH hashes with
    p ≈ 2⁻¹²⁸ per pair, so exact-substring consumers need no re-verify."""
    n = len(texts)
    empty = (
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),
        np.zeros(n + 1, dtype=np.int64),
    )
    if n == 0:
        return empty
    raws = [t.encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(r) >> 2 for r in raws), dtype=np.int64, count=n)
    cnt = np.maximum(lens - L + 1, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])
    if offsets[-1] == 0:
        return empty
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    big = np.frombuffer(b"".join(raws), dtype=np.uint32).astype(np.uint64)

    with np.errstate(**_ERRSTATE):
        # Horner accumulation: L sequential O(N) vector ops and O(N)
        # transient memory — NOT an (N×L) sliding-window product matrix,
        # which at L=40 would allocate ~640 bytes per input character
        n_win = len(big) - L + 1
        s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        acc1 = big[:n_win].copy()
        acc2 = big[:n_win].copy()
        for j in range(1, L):
            acc1 *= _FNV_PRIME
            acc1 += big[j : j + n_win]
            acc2 *= _POLY_B2
            acc2 += big[j : j + n_win]
        h1_all = splitmix64(acc1 + s)
        h2_all = splitmix64(acc2 + splitmix64(s + np.uint64(1)))
    base = np.repeat(starts[:-1] - offsets[:-1], cnt)
    pos = base + np.arange(offsets[-1], dtype=np.int64)
    return h1_all[pos], h2_all[pos], offsets


def minhash_from_stream(
    hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures from a shingle stream → (n, K) uint64."""
    n = offsets.shape[0] - 1
    K = a.shape[0]
    out = np.empty((n, K), dtype=np.uint64)
    folded = _fold31(hashes)
    max_s = int((offsets[1:] - offsets[:-1]).max()) if n else 1
    scratch = np.empty((max_s, K), dtype=np.uint64)
    hi = np.empty((max_s, K), dtype=np.uint64)
    for i in range(n):
        x = folded[offsets[i] : offsets[i + 1]]
        s = x.shape[0]
        m = scratch[:s]
        h = hi[:s]
        np.multiply(x[:, None], a[None, :], out=m)
        m += b[None, :]
        np.right_shift(m, np.uint64(31), out=h)
        m &= _M31
        m += h
        np.right_shift(m, np.uint64(31), out=h)
        m &= _M31
        m += h
        np.subtract(m, _M31, out=m, where=m >= _M31)
        m.min(axis=0, out=out[i])
    return out


def simhash_from_stream(hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Occurrence-weighted SimHash from a shingle stream → (n,) uint64."""
    n = offsets.shape[0] - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = offsets[1:] - offsets[:-1]
    bits = np.unpackbits(
        np.ascontiguousarray(hashes).view(np.uint8).reshape(-1, 8),
        axis=1,
        bitorder="little",
    )
    ones = np.add.reduceat(bits, offsets[:-1], axis=0, dtype=np.int32)
    sig_bits = (2 * ones) > lengths[:, None]
    packed = np.packbits(sig_bits, axis=1, bitorder="little")
    return packed.reshape(n, 8).copy().view(np.uint64).ravel()


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) for the universal family ``(a*x + b) mod (2^31 - 1)``.

    The classic MinHash permutation family (same shape Spark's MinHashLSH
    uses): inputs folded to 31 bits, a,b < 2^31, so products stay < 2^62 —
    every op on numpy's fast uint64 path, the modulus wraps ~2^31 times
    (proper min-wise mixing), and the Mersenne reduction is two shifts.
    Built once per actor/oracle.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M31), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_M31), size=num_perm, dtype=np.uint64)
    return a, b


def _mod_m31(v: np.ndarray) -> np.ndarray:
    """v mod (2^31 - 1) for v < 2^62, branch-light Mersenne reduction."""
    m = (v & _M31) + (v >> np.uint64(31))   # < 2^32
    m = (m & _M31) + (m >> np.uint64(31))   # ≤ 2^31
    return np.where(m >= _M31, m - _M31, m)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (K,) uint64 for one shingle-hash set."""
    x = _fold31(shingles)
    m = _mod_m31(x[:, None] * a[None, :] + b[None, :])
    return m.min(axis=0)


def minhash_signatures(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched signatures: one (K,) row per document → (n, K) uint64.

    Concatenates all shingle sets and reduces with ``np.minimum.reduceat`` so
    the heavy (total_shingles × K) product runs as a handful of vectorized
    ops per batch instead of one matmul per document. Memory is bounded by
    chunking over the shingle axis.
    """
    n = len(shingle_sets)
    K = a.shape[0]
    if n == 0:
        return np.empty((0, K), dtype=np.uint64)
    out = np.empty((n, K), dtype=np.uint64)
    # Per-doc small-matrix kernel with preallocated scratch: an (s, K) tile
    # for typical caption shingle counts stays inside L2, which measures an
    # order of magnitude faster on this host than a concatenated
    # (total_shingles, K) chunked matrix (large fresh allocations fault in
    # pages at a huge cost). Scratch buffers are reused across docs.
    max_s = max((s.shape[0] for s in shingle_sets), default=1)
    scratch = np.empty((max_s, K), dtype=np.uint64)
    hi = np.empty((max_s, K), dtype=np.uint64)
    for i, sh in enumerate(shingle_sets):
        s = sh.shape[0]
        m = scratch[:s]
        h = hi[:s]
        np.multiply(_fold31(sh)[:, None], a[None, :], out=m)
        m += b[None, :]
        # in-place Mersenne reduction mod 2^31-1 (two folds + correction)
        np.right_shift(m, np.uint64(31), out=h)
        m &= _M31
        m += h
        np.right_shift(m, np.uint64(31), out=h)
        m &= _M31
        m += h
        np.subtract(m, _M31, out=m, where=m >= _M31)
        m.min(axis=0, out=out[i])
    return out


def simhash_signatures(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per document from its shingle-hash set → (n,) uint64.

    Bit-vote: each shingle hash votes ±1 per bit; sign of the sum is the
    signature bit. Batched: one unpackbits over the concatenated shingle
    hashes, one reduceat per document boundary, one packbits — no per-doc
    Python beyond the boundary bookkeeping.
    """
    n = len(shingle_sets)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = np.fromiter((s.shape[0] for s in shingle_sets), dtype=np.int64, count=n)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    allsh = np.ascontiguousarray(np.concatenate(shingle_sets))
    # little-endian uint64 → byte view → bit matrix (total, 64)
    bits = np.unpackbits(
        allsh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    # dtype=int32 accumulates without materializing an int32 copy of `bits`
    ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int32)  # (n, 64)
    sig_bits = (2 * ones) > lengths[:, None]
    packed = np.packbits(sig_bits, axis=1, bitorder="little")
    return packed.reshape(n, 8).copy().view(np.uint64).ravel()


def hamming64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays (vectorized)."""
    v = np.bitwise_xor(np.asarray(x, dtype=np.uint64), np.asarray(y, dtype=np.uint64))
    return popcount64(v)


def popcount64(v: np.ndarray) -> np.ndarray:
    b = v.view(np.uint8).reshape(*v.shape, 8)
    return np.unpackbits(b, axis=-1).sum(axis=-1).astype(np.int8)


def band_keys(signatures: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """LSH band keys for a signature matrix (n, K) → (n, bands) uint64.

    Key = mix(band_idx, FNV-fold of the band's ``rows`` signature values,
    seed). Two documents share a key iff they agree on every row of that
    band — the classic banding scheme (Leskovec/Rajaraman/Ullman, MMDS ch.3).
    """
    n, K = signatures.shape
    assert bands * rows == K
    with np.errstate(**_ERRSTATE):
        sig = signatures.reshape(n, bands, rows)
        h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        for r in range(rows):
            h = (h ^ sig[:, :, r]) * _FNV_PRIME
        band_idx = np.arange(bands, dtype=np.uint64)[None, :]
        h = splitmix64(h + splitmix64(band_idx + np.uint64(seed)))
    return h


def chunk16_bands(values: np.ndarray, n_bands: int, tag: int, seed: int) -> np.ndarray:
    """Split 64-bit signatures into ``n_bands`` equal bit-chunks → (n, n_bands)
    band keys, namespaced by ``tag`` so different families (pHash, SimHash)
    never collide with each other or with the MinHash bands.

    Two values at Hamming distance d collide on ≥ n_bands - d chunks — the
    image-side LSH the north rule asks for. With n_bands=2 (32-bit chunks)
    random collisions are ~2·2^-32 (negligible), and identical / Hamming≤1
    signatures always collide.
    """
    assert 1 <= n_bands <= 4 and 64 % n_bands == 0
    width = np.uint64(64 // n_bands)
    mask = np.uint64((1 << int(width)) - 1)
    v = np.asarray(values, dtype=np.uint64)
    shifts = (np.arange(n_bands, dtype=np.uint64) * width)[None, :]
    chunks = (v[:, None] >> shifts) & mask
    band_idx = np.arange(n_bands, dtype=np.uint64)[None, :]
    salt = splitmix64(band_idx + splitmix64(np.uint64((seed ^ (tag * 0x9E37)) & 0xFFFFFFFFFFFFFFFF)))
    return splitmix64((chunks ^ salt) * _FNV_PRIME + salt)


def all_candidate_keys(
    minhash_sigs: np.ndarray,
    phash: np.ndarray,
    simhash: np.ndarray,
    bands: int,
    rows: int,
    phash_bands: int,
    simhash_bands: int,
    seed: int,
) -> np.ndarray:
    """All LSH candidate keys per row → (n, bands + phash_bands + simhash_bands).

    Three namespaced families (SURVEY.md §2.4 B1): caption MinHash banding,
    image pHash 16-bit chunks, caption SimHash 16-bit chunks. A pair is a
    candidate iff it shares ≥1 key in ANY family. Shared verbatim by the
    Ray band-explode stage and the oracle.
    """
    parts = [band_keys(minhash_sigs, bands, rows, seed)]
    if phash_bands:
        parts.append(chunk16_bands(phash, phash_bands, tag=1, seed=seed))
    if simhash_bands:
        parts.append(chunk16_bands(simhash, simhash_bands, tag=2, seed=seed))
    return np.concatenate(parts, axis=1)


def block_keys(
    fields_list: list[dict[str, str]],
    block_fields: tuple[str, ...],
    seed: int,
) -> list[list[int]]:
    """Reference-style blocking keys (B1 analog): one key per present block
    field per document — exact hash of ``field=value``. Ragged (0..len(block_
    fields) keys per doc). Free-text captions (single ``caption`` field) get
    no block key unless ``caption`` itself is listed."""
    out: list[list[int]] = []
    tag_seed = (seed ^ 0x3B1) & 0xFFFFFFFFFFFFFFFF
    for fields in fields_list:
        keys = [
            hash64_bytes(f"{f}={fields[f]}".encode(), tag_seed)
            for f in block_fields
            if f in fields and fields[f]
        ]
        out.append(keys)
    return out


def signature_digest(signatures: np.ndarray) -> np.ndarray:
    """FNV fold of each full signature row → (n,) uint64.

    Used by hot-bucket refinement: identical digests ⇒ identical MinHash
    signatures ⇒ near-certain duplicates.
    """
    with np.errstate(**_ERRSTATE):
        h = np.full(signatures.shape[0], _FNV_OFFSET, dtype=np.uint64)
        for c in range(signatures.shape[1]):
            h = (h ^ signatures[:, c]) * _FNV_PRIME
    return h


# ---------------------------------------------------------------------------
# pHash — 64-bit DCT perceptual hash (public algorithm: 32×32 grayscale →
# 2D DCT-II → top-left 8×8 AC block → median threshold).
# ---------------------------------------------------------------------------

def dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n, n), float64. Built once per actor."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


def resize_gray(pixels: np.ndarray, out: int = 32) -> np.ndarray:
    """Area-average resize of a (h, w[, c]) uint8 image to (out, out) float64.

    Deterministic box filter (no external imaging libs in this environment);
    channels are luma-averaged with Rec.601 weights first.
    """
    p = pixels.astype(np.float64)
    if p.ndim == 3:
        w = np.array([0.299, 0.587, 0.114])[: p.shape[2]]
        w = w / w.sum()
        p = (p * w[None, None, :]).sum(axis=2)
    h, wd = p.shape
    ys = (np.arange(out + 1) * h) // out
    xs = (np.arange(out + 1) * wd) // out
    csum = np.zeros((h + 1, wd + 1))
    csum[1:, 1:] = p.cumsum(0).cumsum(1)
    ya, yb = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    xa, xb = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    area = (yb - ya)[:, None] * (xb - xa)[None, :]
    s = (csum[yb][:, xb] - csum[yb][:, xa] - csum[ya][:, xb] + csum[ya][:, xa])
    return s / area


def phash64(pixels: np.ndarray, dct: np.ndarray | None = None) -> int:
    """64-bit DCT pHash of decoded pixels. Signed int64 (Arrow-friendly).

    Robust to re-encoding at PSNR≥40dB (the fidelity bar in BASELINE.md):
    quantization noise of a few gray levels does not flip the median-threshold
    bits of the low-frequency DCT block.
    """
    if dct is None:
        dct = dct_matrix(32)
    g = resize_gray(pixels, 32)
    d = dct @ g @ dct.T
    block = d[:8, :8].copy().ravel()
    med = np.median(np.concatenate([block[1:]]))  # exclude DC from the median
    bits = block > med
    bits[0] = False  # DC bit fixed → hash independent of global brightness
    v = 0
    for i in np.nonzero(bits)[0]:
        v |= 1 << int(i)
    return v - (1 << 64) if v >= (1 << 63) else v


def hashed_ngram_embed(
    texts: list[str], dim: int = 128, k: int = 3, seed: int = 42
) -> np.ndarray:
    """Deterministic dense text embedding by FEATURE HASHING (the public
    hashing-trick construction, Weinberger et al. 2009): each character
    k-gram hashes to one of ``dim`` buckets with a ±1 sign bit, occurrence
    counts accumulate, rows L2-normalize. The text analog of
    ``multimodal.ImageEmbed`` — the engine's stand-in for the reference's
    learned sentence embedder (reference ``Run_Sembedding.py:18``,
    ``dedup_pipeline.py:34-48``), with the same contract: similar texts →
    high cosine, computable batched with no model weights.

    Vectorized: ONE rolling-hash pass over the batch
    (``shingle_hash_stream``) + one scatter-add; no per-document Python.
    Empty/short texts hash their padded single shingle (unit vector).
    """
    n = len(texts)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float64)
    stream, offsets = shingle_hash_stream([t.lower() for t in texts], k, seed)
    idx = (stream % np.uint64(dim)).astype(np.int64)
    sign = (
        ((stream >> np.uint64(32)) & np.uint64(1)).astype(np.float64) * 2.0
        - 1.0
    )
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    M = np.zeros((n, dim), dtype=np.float64)
    np.add.at(M, (doc, idx), sign)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return M / norms
