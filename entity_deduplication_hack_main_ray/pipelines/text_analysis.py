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
    # fully Arrow: utf8_length + two RE2 scans — no Python per row.
    # n_tokens is the whitespace count; n_tokens_bpe the GPT-2-style
    # pretokenizer count (tx.BPE_TOKEN_RE — the "BPE-ish regex" budget a
    # byte-pair tokenizer sees before merges).
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
            ),
            "n_tokens_bpe": pc.cast(
                pc.count_substring_regex(t["text"], tx.BPE_TOKEN_RE),
                pa.int64(),
            ),
        }
    )


def doc_stats(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_stats_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", n_chars="int64", n_tokens="int64",
                      n_tokens_bpe="int64")
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


# Gopher-style repetition thresholds (Rae et al. 2021 §A.1.1, adapted to
# the fixture's word-salad distribution so the keep flag is non-vacuous:
# dup-word fraction spans 0–0.72 and top-bigram 0.01–0.17 at sf0.01).
GOPHER_MIN_WORDS = 20
GOPHER_DUP_WORD_E6 = 550_000  # reject > 55% repeated word mass
GOPHER_TOP_WORD_E6 = 200_000  # reject if one word is > 20% of the doc
GOPHER_TOP_BIGRAM_E6 = 120_000  # reject if one bigram is > 12% of bigrams


def _word_splits(
    t: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(parent_doc_index, word_codes, words_per_doc, vocabulary) for a batch
    — ONE Arrow split + ONE factorize; no per-row Python. Splitting on a
    single space (not ``\\S+``) is the contract shared with DuckDB
    ``string_split``."""
    wl = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    parent = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
    nw = pc.list_value_length(wl).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = wl.flatten().to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(flat)
    return parent.astype(np.int64), codes.astype(np.int64), nw, uniq


def _run_counts(*keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(first_index_of_each_run, run_length) after lexsorting the key tuple.
    Overflow-free group counting (no key packing), all numpy."""
    order = np.lexsort(keys[::-1])
    sorted_keys = [k[order] for k in keys]
    n = len(order)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in sorted_keys:
        new[1:] |= k[1:] != k[:-1]
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, n))
    return order[starts], counts


def _repetition_batch(t: pa.Table) -> pa.Table:
    """Vectorized Gopher repetition features for one batch: word/bigram
    duplication via lexsort run-length counting (C-speed, no Python rows)."""
    parent, codes, nw, _uniq = _word_splits(t)
    n_docs = len(nw)
    # distinct words + most-frequent word per doc
    firsts, counts = _run_counts(parent, codes)
    doc_of = parent[firsts] if len(firsts) else np.empty(0, np.int64)
    n_distinct = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    top_word = np.zeros(n_docs, np.int64)
    np.maximum.at(top_word, doc_of, counts)
    # bigrams: adjacent positions within the same doc
    same = parent[:-1] == parent[1:] if len(parent) > 1 else np.empty(0, bool)
    bp = parent[:-1][same]
    bfirsts, bcounts = _run_counts(bp, codes[:-1][same], codes[1:][same])
    top_bigram = np.zeros(n_docs, np.int64)
    np.maximum.at(top_bigram, bp[bfirsts] if len(bfirsts) else bfirsts, bcounts)
    nb = np.maximum(nw - 1, 0)
    dup_e6 = _e6_ratio(nw - n_distinct, nw)
    topw_e6 = _e6_ratio(top_word, nw)
    topb_e6 = _e6_ratio(top_bigram, nb)
    keep = (
        (nw >= GOPHER_MIN_WORDS)
        & (dup_e6 <= GOPHER_DUP_WORD_E6)
        & (topw_e6 <= GOPHER_TOP_WORD_E6)
        & (topb_e6 <= GOPHER_TOP_BIGRAM_E6)
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(nw),
            "n_distinct_words": pa.array(n_distinct),
            "top_word_n": pa.array(top_word),
            "top_bigram_n": pa.array(top_bigram),
            "dup_word_frac_e6": pa.array(dup_e6),
            "top_word_frac_e6": pa.array(topw_e6),
            "top_bigram_frac_e6": pa.array(topb_e6),
            "keep": pa.array(keep.astype(np.int64)),
        }
    )


def gopher_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021, "Scaling
    Language Models" §A.1.1): per-document duplicate-word fraction, top-word
    and top-bigram concentration, and an integer keep flag. Embarrassingly
    parallel — one task-pool ``map_batches``, no exchange; every count is an
    integer and every ratio uses the shared ``_e6_ratio`` contract, so the
    DuckDB oracle hash-matches exactly."""
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_repetition_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(
        out, doc_id="int64", n_words="int64", n_distinct_words="int64",
        top_word_n="int64", top_bigram_n="int64", dup_word_frac_e6="int64",
        top_word_frac_e6="int64", top_bigram_frac_e6="int64", keep="int64",
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _word_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch combiner: local word counts, so the global exchange moves
    O(batches × vocab) rows, not one row per word occurrence."""
    _parent, codes, _nw, uniq = _word_splits(t)
    counts = np.bincount(codes, minlength=len(uniq))
    return pa.table(
        {
            "word": pa.array(np.asarray(uniq, dtype=object), pa.string()),
            "n_partial": pa.array(counts.astype(np.int64)),
        }
    )


def top_words(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-wide word frequency top-k — the canonical pre-aggregated
    map-reduce: per-batch bincount combiner → one ``groupby(word)`` sum over
    partials → distributed ``sort`` + ``limit(k)`` (only k rows reach the
    driver). Ties break on the word itself so the oracle ordering is total.
    """
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_word_count_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_partial", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out = ensure_cols(out, word="object", n="int64")
    return out.reset_index(drop=True)


_SHINGLE_B = np.uint64(1099511628211)  # FNV prime as polynomial base


def _passage_rows(t: pa.Table, n: int, P: int) -> pa.Table:
    """Distinct (shingle_hash, doc_id) rows for one batch. Word hashes come
    from ``pd.util.hash_array`` over the batch VOCABULARY (O(vocab), fully
    vectorized siphash); the n-word window combines them with a polynomial
    rolling product — n numpy ops per batch, no per-shingle Python. Only the
    16-byte hash row crosses the exchange, never the passage text (the
    100 TB shape; 64-bit collisions merge two shingles with p ≈ m²/2⁶⁴)."""
    from ..functions.hashing import splitmix64

    parent, codes, _nw, uniq = _word_splits(t)
    # hash each distinct word string once (vocab ≪ words)
    vocab_hash = pd.util.hash_array(np.asarray(uniq, dtype=object),
                                    categorize=False)
    h0 = vocab_hash[codes]
    L = len(h0) - n + 1
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if L <= 0:
        return pa.table(
            {"h": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
             "pkey": pa.array([], pa.int64())}
        )
    with np.errstate(over="ignore"):
        acc = h0[:L].copy()
        for j in range(1, n):
            acc = acc * _SHINGLE_B + h0[j : j + L]
        valid = parent[:L] == parent[n - 1 :]
        sh = splitmix64(acc[valid])
    sdoc = parent[:L][valid]
    # distinct per doc
    firsts, _counts = _run_counts(sdoc, sh.view(np.int64))
    return pa.table(
        {
            "h": pa.array(sh.view(np.int64)[firsts]),
            "doc_id": pa.array(doc_ids[sdoc[firsts]]),
            "pkey": pa.array((sh[firsts] % np.uint64(P)).astype(np.int64)),
        }
    )


def repeated_passages(
    sf_dir: str, n: int = 8, num_partitions: int = 32
) -> pd.DataFrame:
    """Cross-document repeated-passage statistics (the span-granularity
    dedup signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at word-``n``-gram granularity): per document,
    how many of its distinct ``n``-word passages also occur in at least one
    OTHER document.

    Physical plan: per-batch distinct (shingle_hash, doc_id) rows → ONE
    coarse ``groupby(pkey)`` exchange on hash%P, where each of the P
    partition kernels holds every row of its shingles and computes per-doc
    partial (n_shingles, n_shared) vectorized → one tiny coarse
    ``groupby(doc_id % P)`` merge over O(docs × P) partial rows (a
    vectorized pandas sum per partition — measured ~100× faster than
    Ray's per-key hash aggregate at 5k keys). No joins, no per-key
    ``map_groups``, and passage text never leaves the mapper.
    Documents with fewer than ``n`` words emit no shingles and are absent
    from the output (the oracle's inner join drops them identically).
    """
    P = num_partitions

    def part(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("size")  # rows are distinct
        return (
            g.assign(shared=(nd >= 2).astype(np.int64))
            .groupby("doc_id", as_index=False)
            .agg(n_shingles_p=("h", "size"), n_shared_p=("shared", "sum"))
        )

    def add_doc_pkey(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("pkey2", pa.array((d % P).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_shingles_p", "sum"), n_shared=("n_shared_p", "sum")
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(lambda t: _passage_rows(t, n, P), batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(part, batch_format="pandas")
        .map_batches(add_doc_pkey, batch_format="pyarrow")
        .groupby("pkey2")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", n_shingles="int64", n_shared="int64")
    out["shared_frac_e6"] = _e6_ratio(
        out["n_shared"].to_numpy(), out["n_shingles"].to_numpy()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


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


def stratified_sample(
    sf_dir: str,
    rates: dict[str, int] | None = None,
    default_rate: int = 60,
) -> pd.DataFrame:
    """Deterministic stratified sampling — the data-MIXING primitive of
    corpus curation: keep ``rates[stratum]`` percent of each language
    stratum (down-weight over-represented languages, keep all of a rare
    one) with NO randomness. A document is kept iff
    ``bucket(doc_id) < rates.get(lang, default_rate)`` where ``bucket =
    (doc_id * 11400714819323198485) mod 2^64 mod 100`` (golden-ratio odd
    multiplier — deliberately a DIFFERENT mixer than
    ``leakage_free_split``'s, so sample membership is uncorrelated with
    split assignment).

    Properties that matter at corpus scale: reproducible across runs,
    partition counts and cluster sizes (pure function of doc_id);
    monotone in the rate (raising a stratum's rate only ADDS documents,
    so mixture experiments are nested subsets); zero shuffle — one
    embarrassingly parallel ``map_batches`` over a 2-column pruned read.

    Returns the kept rows ``(doc_id, lang, bucket)``.
    """
    rates = {"en": 40, "de": 100} if rates is None else rates

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (ids * np.uint64(11400714819323198485)) % np.uint64(100)
        rate = (
            pd.Series(t["lang"].to_pylist())
            .map(rates)
            .fillna(default_rate)
            .to_numpy()
            .astype(np.uint64)
        )
        keep = bucket < rate
        kept = t.select(["doc_id", "lang"]).filter(pa.array(keep))
        return kept.append_column(
            "bucket", pa.array(bucket[keep].astype(np.int64))
        )

    out = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", lang="object", bucket="int64")
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "lang", "bucket"]
    ]


def _df_partial(t: pa.Table) -> pa.Table:
    """Per-batch document-frequency combiner: distinct (word, doc) runs →
    docs-per-word within the batch. Exact after the global word sum (a doc
    is one row, so it never straddles batches)."""
    parent, codes, _nw, uniq = _word_splits(t)
    firsts, _counts = _run_counts(parent, codes)
    df = np.bincount(codes[firsts], minlength=len(uniq)) if len(firsts) \
        else np.zeros(len(uniq), np.int64)
    return pa.table(
        {
            "word": pa.array(np.asarray(uniq, dtype=object), pa.string()),
            "df_partial": pa.array(df.astype(np.int64)),
        }
    )


def tfidf_top_terms(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-document top-k terms by an integer TF-IDF score — the relevance
    leg of the curation toolchain (which terms make a document distinctive
    across the corpus).

    ``score = tf * n_docs // df`` — monotone in tf·idf with NO float log,
    so engine and DuckDB agree bit-for-bit (integer division of BIGINTs;
    word order ties break on the raw word, where UTF-8 byte order equals
    code-point order, so numpy/pandas and DuckDB binary collation sort
    identically).

    Plan: scan 1 streams per-batch df combiners into ONE ``groupby(word)``
    sum (the only exchange — O(batches × vocab) partial rows); the exact
    df table is broadcast once via ``ray.put`` (test-scale vocab is small;
    at 10^8-word vocab swap the broadcast for a co-partitioned join on
    ``hash(word) % P`` plus a second doc-keyed exchange for the top-k);
    scan 2 recomputes per-doc tf per batch (cheaper than shuffling tf
    rows) and takes the per-doc top-k inline — zero doc-keyed exchange.
    """
    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # metadata-only: parquet row counts, no scan
    df_pd = (
        docs.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df_partial", alias_name="df"))
        .to_pandas()
    )
    if df_pd.empty or not len(df_pd.columns):  # ensure_cols would collide
        from ..functions.frames import typed_empty  # with its df param

        df_pd = typed_empty(word="object", df="int64")
    vocab = df_pd["word"].to_numpy(dtype=object)
    order = np.argsort(vocab, kind="stable")
    ref = ray.put(
        (vocab[order], df_pd["df"].to_numpy().astype(np.int64)[order])
    )

    def score_topk(t: pa.Table) -> pa.Table:
        vocab_sorted, df_sorted = ray.get(ref)
        parent, codes, _nw, uniq = _word_splits(t)
        firsts, tf = _run_counts(parent, codes)
        d_idx = parent[firsts] if len(firsts) else firsts
        words = np.asarray(uniq, dtype=object)[codes[firsts]] \
            if len(firsts) else np.empty(0, object)
        pos = np.searchsorted(vocab_sorted, words).astype(np.int64)
        df = df_sorted[pos] if len(pos) else pos
        score = tf * np.int64(n_docs) // np.maximum(df, 1)
        # per-doc top-k: lexsort by (doc, -score, word-rank); ``pos`` is the
        # word's rank in the sorted global vocabulary, an integer total
        # order identical to binary word order — then keep each run's
        # first k rows
        o = np.lexsort((pos, -score, d_idx))
        d_s = d_idx[o]
        if len(d_s):
            new = np.concatenate([[True], d_s[1:] != d_s[:-1]])
            run_start = np.maximum.accumulate(
                np.where(new, np.arange(len(d_s)), 0)
            )
            keep = o[np.arange(len(d_s)) - run_start < k]
        else:
            keep = o
        doc_ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d_idx[keep]]),
                "word": pa.array(words[keep], pa.string()),
                "tf": pa.array(tf[keep]),
                "df": pa.array(df[keep] if len(keep) else
                               np.empty(0, np.int64)),
                "score": pa.array(score[keep]),
            }
        )

    out = (
        docs.map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty or not len(out.columns):
        from ..functions.frames import typed_empty

        out = typed_empty(
            doc_id="int64", word="object", tf="int64", df="int64",
            score="int64",
        )
    return out.sort_values(["doc_id", "word"]).reset_index(drop=True)


CHUNK_WORDS = 64   # words per training chunk
CHUNK_STRIDE = 48  # chunk start stride (overlap = CHUNK_WORDS - STRIDE)


def _chunk_batch(t: pa.Table, size: int, stride: int) -> pa.Table:
    """Sliding-window passage chunks for one batch, fully vectorized:
    chunk word-index ranges are built with one repeat/arange pass, the
    chunk word lists come from a single Arrow take, and the chunk text
    from ONE ``pc.binary_join`` — no per-chunk Python."""
    wl = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    nw = pc.list_value_length(wl).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(nw)])  # word offsets per doc
    n_chunks = np.where(nw > 0, (nw - 1) // stride + 1, 0)
    doc_of_chunk = np.repeat(np.arange(len(nw)), n_chunks)
    # chunk_idx within its doc: global arange minus each doc's first slot
    first_slot = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_idx = np.arange(len(doc_of_chunk)) - first_slot[doc_of_chunk]
    start = chunk_idx * stride
    length = np.minimum(start + size, nw[doc_of_chunk]) - start
    # flat word indices: for each chunk an arange(start, start+length)
    # shifted by its doc's word offset
    flat_off = np.concatenate([[0], np.cumsum(length)])
    total = int(flat_off[-1])
    idx = np.arange(total) - np.repeat(flat_off[:-1], length) + np.repeat(
        start + doc_off[doc_of_chunk], length
    )
    flat_words = wl.flatten()
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(flat_off, pa.int32()),
        flat_words.take(pa.array(idx, pa.int64())),
    )
    return pa.table(
        {
            "doc_id": t["doc_id"].take(pa.array(doc_of_chunk, pa.int64())),
            "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
            "n_words_chunk": pa.array(length.astype(np.int64)),
            "chunk_text": pc.binary_join(chunk_lists, " "),
        }
    )


def chunk_documents(
    sf_dir: str, size: int = CHUNK_WORDS, stride: int = CHUNK_STRIDE
) -> pd.DataFrame:
    """Sliding-window passage chunking — the training-data prep stage that
    turns documents into overlapping fixed-budget chunks (``size`` words
    per chunk, starts every ``stride`` words; the word boundary is the
    corpus-wide single-space contract shared with the DuckDB oracle).

    Embarrassingly parallel: ONE task-pool ``map_batches``, no exchange;
    output is chunk rows (doc_id, chunk_idx, n_words_chunk, chunk_text).
    At 100 TB this is the stage that feeds the tokenizer — each batch's
    chunks stay inside the task, and downstream stages consume the chunk
    Dataset without ever materializing a document twice.
    """
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda t: _chunk_batch(t, size, stride), batch_format="pyarrow"
        )
        .to_pandas()
    )
    out = ensure_cols(
        out, doc_id="int64", chunk_idx="int64", n_words_chunk="int64",
        chunk_text="object",
    )
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Duplicate-n-gram fraction — the DIRECTIONAL span-dedup metric of Lee et
# al. 2022 ("what fraction of this document's token windows already
# appeared in an EARLIER document"), complementing `repeated_passages`
# (which is symmetric: shared-with-anyone). Earlier = smaller doc_id, the
# corpus ingestion order.


def dup_gram_fraction(
    sf_dir: str, n: int = 8, num_partitions: int = 32
) -> pd.DataFrame:
    """Per document: how many of its word-``n``-gram POSITIONS carry a gram
    whose first corpus occurrence (minimum doc_id) is in an earlier
    document. Returns ``(doc_id, n_grams, n_dup, dup_frac_e6)`` with
    ``dup_frac_e6 = n_dup * 1e6 // n_grams`` (pure integer division — the
    oracle computes the identical expression).

    Physical plan: sliding windows are cut inside the mapper
    (``_chunk_batch(size=n, stride=1)``, full windows only), fingerprinted
    to 128 bits, and pre-aggregated per (gram, doc) BEFORE the exchange —
    so the one ``groupby(pkey)`` shuffle moves O(distinct (gram, doc))
    32-byte rows, not O(positions). Each partition kernel attributes every
    gram group to its minimum doc_id with one lexsort; per-doc partials
    then merge through a tiny coarse ``groupby(doc_id % P)``. Documents
    with fewer than ``n`` words ride as zero-count sentinel rows keyed by
    doc_id (uniform, never a hot key), so the output covers every
    document. Gram text never crosses an exchange.
    """
    from ..functions import text as tx

    P = num_partitions

    def rows(t: pa.Table) -> pa.Table:
        c = _chunk_batch(t, n, 1)
        c = c.filter(pc.equal(c["n_words_chunk"], n))
        h1, h2 = tx.content_fingerprint128(c["chunk_text"].to_pylist())
        d = c["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # pre-aggregate per (gram, doc): one lexsort + boundary scan
        o = np.lexsort((d, h2, h1))
        h1s, h2s, ds = h1[o], h2[o], d[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = (
            (h1s[1:] != h1s[:-1])
            | (h2s[1:] != h2s[:-1])
            | (ds[1:] != ds[:-1])
        )
        first = np.flatnonzero(new)
        cnt = np.diff(np.append(first, len(o))).astype(np.int64)
        h1u, h2u, du = h1s[first], h2s[first], ds[first]
        # zero-count sentinel per batch document (h1=h2=0, keyed by doc_id
        # so sentinels spread uniformly): keeps gram-less docs in the
        # output without a second read; cnt=0 contributes nothing to any
        # min-doc group it lands in.
        alld = np.unique(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        z = np.zeros(len(alld), dtype=np.int64)
        h1a = np.concatenate([h1u, z])
        h2a = np.concatenate([h2u, z])
        da = np.concatenate([du, alld])
        ca = np.concatenate([cnt, z])
        pkey = np.where(
            np.concatenate([np.ones(len(h1u), bool), np.zeros(len(alld), bool)]),
            h1a.view(np.uint64) % np.uint64(P),
            da.view(np.uint64) % np.uint64(P),
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(pkey),
                "h1": pa.array(h1a),
                "h2": pa.array(h2a),
                "doc_id": pa.array(da),
                "cnt": pa.array(ca),
            }
        )

    def attr(g: pd.DataFrame) -> pd.DataFrame:
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        d = g["doc_id"].to_numpy()
        cnt = g["cnt"].to_numpy()
        o = np.lexsort((d, h2, h1))
        h1s, h2s, ds, cs = h1[o], h2[o], d[o], cnt[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        grp = np.cumsum(new) - 1
        min_d = ds[np.flatnonzero(new)][grp]  # lexsort => first row is min doc
        dup = np.where(ds > min_d, cs, 0)
        part = (
            pd.DataFrame({"doc_id": ds, "tot_p": cs, "dup_p": dup})
            .groupby("doc_id", as_index=False)
            .sum()
        )
        part["pkey2"] = (part["doc_id"].to_numpy() % P).astype(np.int64)
        return part

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False).agg(
            n_grams=("tot_p", "sum"), n_dup=("dup_p", "sum")
        )
        ng = m["n_grams"].to_numpy()
        nd = m["n_dup"].to_numpy()
        m["dup_frac_e6"] = np.where(ng > 0, nd * 1_000_000 // np.maximum(ng, 1), 0)
        return m

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(attr, batch_format="pandas")
        .groupby("pkey2")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(
        out, doc_id="int64", n_grams="int64", n_dup="int64",
        dup_frac_e6="int64",
    )
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_grams", "n_dup", "dup_frac_e6"]
    ]


# ---------------------------------------------------------------------------
# Quality-stratified deciles — the data-MIXING primitive that follows
# quality scoring: every document gets its corpus-wide quality decile
# (exact NTILE semantics over (score DESC, doc_id ASC)), so mixture
# experiments can up/down-weight strata reproducibly.


def _ntile(rank: np.ndarray, total: int, k: int) -> np.ndarray:
    """Exact SQL NTILE(k) bucket for 0-based global ``rank`` out of
    ``total`` rows: the first ``total % k`` buckets hold ``total//k + 1``
    rows, the rest ``total//k``."""
    small = total // k
    rem = total % k
    big = small + 1
    cut = rem * big
    return np.where(
        rank < cut,
        rank // max(big, 1),
        rem + (rank - cut) // max(small, 1),
    ).astype(np.int64) + 1


def quality_deciles(
    sf_dir: str, k: int = 10, num_partitions: int = 32
) -> pd.DataFrame:
    """Assign every document its exact corpus-wide quality decile
    (``NTILE(k)`` over ``(quality_score DESC, doc_id ASC)``) where
    ``quality_score`` is the hash-green ``doc_quality`` stopword ratio.
    Returns ``(doc_id, quality_score, decile)``.

    Scale design — exact global rank WITHOUT a global sort: the score is a
    ratio in [0, 1e6], so the score histogram is BOUNDED (<= 1e6+1 bins)
    regardless of corpus size. (1) one scoring pass produces 16-byte
    (doc_id, score) rows, materialized once (the reduced projection, not
    the corpus); (2) per-batch partial histograms merge on the driver into
    cumulative greater-than counts — a bounded broadcast, `ray.put` once;
    (3) one ``groupby(score % P)`` exchange co-locates each score's docs,
    whose kernel computes within-score offsets by doc_id and adds the
    broadcast cum-count: rank = |{score' > s}| + |{same s, smaller id}|.
    No all-to-all sort; the one exchange moves fixed-width rows.
    """
    P = num_partitions

    def srows(t: pa.Table) -> pa.Table:
        q = _quality_batch(t)
        s = q["stopword_ratio_e6"]
        pkey = (
            s.to_numpy(zero_copy_only=False).view(np.uint64) % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {"doc_id": q["doc_id"], "score": s, "pkey": pa.array(pkey)}
        )

    scored = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(srows, batch_format="pyarrow")
        .materialize()  # 16-byte rows: reused by both passes below
    )

    def hist_part(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["score"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"score": pa.array(v), "n_p": pa.array(c.astype(np.int64))}
        )

    hp = scored.map_batches(hist_part, batch_format="pyarrow").to_pandas()
    if hp.empty:  # zero-row corpus: Ray drops the schema with the rows
        return ensure_cols(
            pd.DataFrame(), doc_id="int64", quality_score="int64",
            decile="int64",
        )
    hist = hp.groupby("score")["n_p"].sum().sort_index()
    sc_asc = hist.index.to_numpy().astype(np.int64)
    cnts = hist.to_numpy().astype(np.int64)
    total = int(cnts.sum())
    # gt_asc[i] = #docs with score strictly greater than sc_asc[i]
    gt_asc = total - np.cumsum(cnts)
    ref = ray.put((sc_asc, gt_asc, total))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        sca, gta, n = ray.get(ref)
        s = g["score"].to_numpy()
        d = g["doc_id"].to_numpy()
        o = np.lexsort((d, s))
        ss, ds = s[o], d[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = ss[1:] != ss[:-1]
        first = np.flatnonzero(new)
        off = np.arange(len(o)) - first[np.cumsum(new) - 1]
        rank = gta[np.searchsorted(sca, ss)] + off
        return pd.DataFrame(
            {
                "doc_id": ds,
                "quality_score": ss,
                "decile": _ntile(rank, n, k),
            }
        )

    out = (
        scored.groupby("pkey")
        .map_groups(kern, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(
        out, doc_id="int64", quality_score="int64", decile="int64"
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# PII redaction — the scrub pass every public training corpus runs before
# release. One embarrassingly parallel map_batches; every count/replace is
# an Arrow RE2 kernel over the whole batch (patterns compiled once per
# worker at import). The synthetic corpus carries no PII, so on the sf
# tables this query doubles as a NO-FALSE-POSITIVES proof (the oracle
# compares the full redacted text per document); the crafted pytest proves
# the redaction itself.


def redact_pii(sf_dir: str) -> pd.DataFrame:
    """Redact emails → ``<EMAIL>``, IPv4 addresses → ``<IP>``, then
    phone-shaped numbers → ``<PHONE>`` (in that fixed order, each count
    taken on the text AFTER the previous category's replacement — the
    contract the oracle replicates step for step). Returns
    ``(doc_id, n_emails, n_ips, n_phones, clean_text)``.
    """

    def scrub(t: pa.Table) -> pa.Table:
        def step(col, pat, repl):
            n = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            return n, pc.replace_substring_regex(col, pat, repl)

        ne, s1 = step(t["text"], tx.PII_EMAIL_RE, "<EMAIL>")
        ni, s2 = step(s1, tx.PII_IPV4_RE, "<IP>")
        np_, s3 = step(s2, tx.PII_PHONE_RE, "<PHONE>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_emails": ne,
                "n_ips": ni,
                "n_phones": np_,
                "clean_text": s3,
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", n_emails="int64", n_ips="int64",
                      n_phones="int64", clean_text="object")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Token-offset sharding ("sequence packing" at the shard level): assign
# every document a deterministic training-shard id from its token offset
# in doc_id order — the fixed-length-chunk pass a GPT-style pipeline runs
# after curation. Documents are range-partitioned by doc_id so the
# prefix-sum is partition-local (no global sequential dependency at
# 100 TB: each `part` packs independently and in parallel).


def pack_token_shards(
    sf_dir: str, budget: int = 256, part_size: int = 1000
) -> pd.DataFrame:
    """Within each doc_id range partition (``part = doc_id // part_size``),
    order documents by doc_id, take the exclusive prefix sum of whitespace
    token counts (the ``doc_stats`` n_tokens contract), and assign
    ``shard = tok_offset // budget`` — a document lands in the shard where
    its first token falls. Returns
    ``(doc_id, part, n_tokens, tok_offset, shard)``.

    One pruned read → token counts per batch (Arrow RE2) → ONE
    ``groupby(part)`` exchange of 24-byte rows whose kernel is a sort +
    cumsum. Group size is bounded by ``part_size`` regardless of corpus
    size, so no partition kernel ever sees more than ``part_size`` rows.
    """
    P = part_size

    def rows(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = (
            pc.count_substring_regex(t["text"], r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(d),
                "part": pa.array(d // P),
                "n_tokens": pa.array(nt),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        nt = g["n_tokens"].to_numpy()
        off = np.concatenate([[0], np.cumsum(nt)[:-1]]).astype(np.int64)
        g["tok_offset"] = off
        g["shard"] = off // budget
        return g

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
    )
    out = ensure_cols(out, doc_id="int64", part="int64", n_tokens="int64",
                      tok_offset="int64", shard="int64")
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "part", "n_tokens", "tok_offset", "shard"]
    ]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — the bounded-state approximate sibling of the
# exact `top_words` (as `approx_user_counts`' HLL is to the exact
# `event_user_counts`): per-batch summaries of at most `capacity` counters,
# merged word-wise, one final compression. At 100 TB the exchange volume is
# O(batches * capacity) fixed-width rows no matter how skewed the corpus;
# `top_words`' exact path pays one full word exchange instead.


def _mg_compress(
    words: np.ndarray, counts: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """One Misra-Gries decrement step: if more than ``capacity`` counters
    survive, subtract the (capacity+1)-th largest count from all and drop
    the non-positive. Every counter shrinks by at most the returned
    ``thr``, and dropped words had true-count-so-far <= ``thr``."""
    if len(words) <= capacity:
        return words, counts, 0
    thr = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    keep = counts > thr
    return words[keep], counts[keep] - thr, int(thr)


def _mg_partial(t: pa.Table, capacity: int) -> pa.Table:
    """Per-batch summary: exact factorize+bincount, one compression, plus
    two meta rows (meta=1: exact batch word total, meta=2: the batch's
    subtracted error) so the merge can carry N and the error bound."""
    _parent, codes, _nw, uniq = _word_splits(t)
    cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    w, c, err = _mg_compress(np.asarray(uniq, dtype=object), cnt, capacity)
    return pa.table(
        {
            "word": pa.array(list(w) + ["", ""], pa.string()),
            "cnt": pa.array(
                np.concatenate([c, [cnt.sum(), err]]).astype(np.int64)
            ),
            "meta": pa.array(
                np.concatenate(
                    [np.zeros(len(w), np.int64), [1, 2]]
                ).astype(np.int64)
            ),
        }
    )


def heavy_hitter_words(
    sf_dir: str, k: int = 20, capacity: int = 256
) -> pd.DataFrame:
    """Approximate corpus top-``k`` words from mergeable Misra-Gries
    summaries. Returns ``(word, est_count, err_bound, n_total)`` sorted by
    (est_count DESC, word ASC).

    Guarantees that hold for ANY batch layout (asserted in pytest against
    exact counts): ``est_count <= true_count <= est_count + err_bound``
    for every emitted word, and any word with
    ``true_count > err_bound`` is present in the summary. The point
    estimates themselves may shift within the bound when Ray re-batches
    the read (inherent to Misra-Gries merging); with
    ``capacity >= distinct words`` the sketch degrades to exact and
    equals ``top_words`` bit-for-bit. Scale shape: each batch ships at
    most ``capacity + 2`` rows; the driver merge handles
    O(batches x capacity) rows (tree-mergeable at cluster scale since
    the merge is word-wise sum + one compression).
    """
    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda t: _mg_partial(t, capacity), batch_format="pyarrow"
        )
        .to_pandas()
    )
    if parts.empty:
        return ensure_cols(
            pd.DataFrame(), word="object", est_count="int64",
            err_bound="int64", n_total="int64",
        )
    n_total = int(parts.loc[parts.meta == 1, "cnt"].sum())
    batch_err = int(parts.loc[parts.meta == 2, "cnt"].sum())
    agg = (
        parts.loc[parts.meta == 0]
        .groupby("word")["cnt"]
        .sum()
    )
    w, c, thr = _mg_compress(
        agg.index.to_numpy(dtype=object), agg.to_numpy(), capacity
    )
    err = batch_err + thr
    out = (
        pd.DataFrame(
            {
                "word": w,
                "est_count": c.astype(np.int64),
                "err_bound": np.int64(err),
                "n_total": np.int64(n_total),
            }
        )
        .sort_values(["est_count", "word"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return ensure_cols(out, word="object", est_count="int64",
                       err_bound="int64", n_total="int64")
