"""Caption/text kernels: normalization, field parsing, the verification
similarity functions (reference semantics), suffix-array containment, and the
training-data text-analysis scalars (lang-id, quality, token count,
fingerprint).

Reference-semantics functions reproduce the quirks documented in SURVEY.md §2.6
exactly — the oracle and the Ray verify stage both call these, so "recall vs
reference-semantics matcher" is measured against one shared kernel:

* ``seq_ratio``        — reference F1: `normalized_levenshtein` is actually
  ``difflib.SequenceMatcher.ratio()`` (Ratcliff–Obershelp) on lowercased
  values (reference ``similarity_utils.py:35-39``, lowercasing at :73-74).
* ``acronym`` / boost  — reference F2 (``similarity_utils.py:42-47``).
* ``adaptive_threshold`` — reference F3 (``similarity_utils.py:49-54``).
* pass/fail asymmetry  — reference F5 (``similarity_utils.py:94-103``),
  applied in ``stages/verify.py``.
"""

from __future__ import annotations

import re
import unicodedata
from difflib import SequenceMatcher

import numpy as np

_WS = re.compile(r"\s+")
# label ":" value "." — the value may contain dots (emails, dates) as long as
# they are not followed by whitespace; the sentence terminator is ". " or EOS
_FIELD = re.compile(r"([A-Za-z][A-Za-z ]{0,40}?):\s*(.*?)\.(?:\s|$)")


def normalize_caption(s: str) -> str:
    """NFKC, lowercase, whitespace-collapse, strip.

    The analog of the reference's label/value normalization chain
    (``graphToText_utils.py:10-28`` camel/title/prefix utils + lowercasing in
    ``similarity_utils.py:73-74``), applied once up front instead of per pair.
    """
    s = unicodedata.normalize("NFKC", s)
    return _WS.sub(" ", s).strip().lower()


def parse_fields(caption: str) -> dict[str, str]:
    """Parse a verbalized caption ``"type: person. name: ada. …"`` into a
    ``{field → value}`` map — the analog of the reference's literal map
    (``graphToText_utils.py:30-42``). Captions without the verbalized shape
    yield ``{"caption": whole_text}`` so free-text captions still verify.
    """
    fields = {m.group(1).strip(): m.group(2).strip() for m in _FIELD.finditer(caption)}
    if not fields:
        return {"caption": caption}
    return fields


def seq_ratio(a: str, b: str) -> float:
    """Reference F1: SequenceMatcher.ratio on lowercased strings."""
    return SequenceMatcher(None, a.lower(), b.lower()).ratio()


def ratio_upper_bound(a: str, b: str) -> float:
    """Character-multiset upper bound on ``seq_ratio`` (difflib's
    ``quick_ratio`` invariant: ratio ≤ 2·|multiset ∩|/(|a|+|b|)).

    Used as a decision-lossless prefilter in the verify kernel: when the mean
    per-field BOUND is already below the adaptive pass threshold, the exact
    mean must fail too, so the expensive Ratcliff–Obershelp pass is skipped
    without changing any pass/fail outcome.
    """
    if not a and not b:
        return 1.0
    ca: dict[str, int] = {}
    for ch in a.lower():
        ca[ch] = ca.get(ch, 0) + 1
    inter = 0
    cb: dict[str, int] = {}
    for ch in b.lower():
        seen = cb.get(ch, 0)
        if seen < ca.get(ch, 0):
            inter += 1
        cb[ch] = seen + 1
    return 2.0 * inter / (len(a) + len(b))


def acronym(s: str) -> str:
    """Reference F2 analog: first letter of each whitespace word, uppercased.

    INTENTIONAL DEVIATION from the reference: ``get_acronym``
    (``similarity_utils.py:42-47``) uses ``re.findall(r'\\b\\w', s)``, which
    also captures word-starts after punctuation/digits (e.g. ``st. mary's``
    → ``SMS``). This engine whitespace-splits, so punctuated values yield
    shorter acronyms and some boost decisions differ on such values. The
    oracle shares THIS function, so engine ≡ oracle regardless.
    """
    return "".join(w[0] for w in s.split() if w).upper()


def acronym_match(a: str, b: str) -> bool:
    """Reference F2 boost condition: one side's acronym equals the other side
    de-spaced + uppercased (``similarity_utils.py:76-80``).

    INTENTIONAL DEVIATION: the reference has no length guard, so a
    single-character value acronym-boosts against its own single letter;
    the ``len > 1`` guard here suppresses that degenerate 0.95 boost
    (shared by the oracle, so both sides agree)."""
    da, db = a.replace(" ", "").upper(), b.replace(" ", "").upper()
    return (acronym(a) == db and len(db) > 1) or (acronym(b) == da and len(da) > 1)


def adaptive_threshold(n_common: int, table: dict[int, float], default: float) -> float:
    """Reference F3: evidence-count → pass threshold (``similarity_utils.py:49-54``)."""
    return table.get(n_common, default)


def field_hists(fields: dict[str, str]) -> dict[str, tuple[np.ndarray, int]]:
    """Per-field 128-bin byte histograms, precomputed once per document and
    reused across all its candidate pairs (the verify stage's per-batch
    amortization). ``None`` entry marks a non-ASCII value (exact-bound
    fallback needed to preserve the dominance guarantee)."""
    out: dict[str, tuple[np.ndarray, int]] = {}
    for k, v in fields.items():
        raw = v.encode("utf-8", "surrogatepass")
        if len(raw) != len(v):  # non-ascii → histogram bound unsafe
            out[k] = (None, len(v))  # type: ignore[assignment]
            continue
        h = np.zeros(128, dtype=np.int32)
        arr = np.frombuffer(raw, dtype=np.uint8)
        np.add.at(h, arr & 0x7F, 1)
        out[k] = (h, len(v))
    return out


def field_similarity_bound(
    fa: dict[str, str],
    fb: dict[str, str],
    acronym_boost: float = 0.95,
    ha: dict[str, tuple[np.ndarray, int]] | None = None,
    hb: dict[str, tuple[np.ndarray, int]] | None = None,
) -> tuple[float, int]:
    """Upper bound on ``field_similarity``'s avg (and the common count).

    mean of per-field ``max(ratio_upper_bound, boost-if-acronym)`` — every
    term dominates its exact counterpart, so the mean dominates the exact
    mean. With precomputed ``field_hists`` the per-pair cost is a handful of
    vectorized minimum-sums; otherwise O(total chars). No SequenceMatcher.
    """
    common = [k for k in fa if k in fb]
    if not common:
        return 0.0, 0
    total = 0.0
    for k in common:
        va, vb = fa[k], fb[k]
        if va == vb:
            total += 1.0
            continue
        if ha is not None and hb is not None:
            hista, la = ha[k]
            histb, lb = hb[k]
            if hista is not None and histb is not None:
                denom = la + lb
                ub = (
                    2.0 * int(np.minimum(hista, histb).sum()) / denom
                    if denom
                    else 1.0
                )
            else:
                ub = ratio_upper_bound(va, vb)
        else:
            ub = ratio_upper_bound(va, vb)
        if ub < acronym_boost and acronym_match(va, vb):
            ub = acronym_boost
        total += ub
    return total / len(common), len(common)


def field_similarity(
    fa: dict[str, str],
    fb: dict[str, str],
    acronym_boost: float = 0.95,
) -> tuple[float, int, bool]:
    """Per-common-field SequenceMatcher mean — the reference's
    ``Levenshtein_filter`` core (``similarity_utils.py:58-104``).

    Returns ``(avg_sim, n_common, all_exact)`` where ``all_exact`` follows the
    reference F4 exactness rule: both sides have the same field count == the
    common count AND every per-field sim == 1.0 (``similarity_utils.py:86-92``).
    """
    common = [k for k in fa if k in fb]
    if not common:
        return 0.0, 0, False
    sims = []
    for k in common:
        va, vb = fa[k], fb[k]
        if va == vb:  # SequenceMatcher.ratio(x, x) == 1.0; skip the O(n²) pass
            sims.append(1.0)
            continue
        s = seq_ratio(va, vb)
        if s < acronym_boost and acronym_match(va, vb):
            s = acronym_boost
        sims.append(s)
    avg = float(np.mean(sims))
    all_exact = (
        len(fa) == len(fb) == len(common) and all(s == 1.0 for s in sims)
    )
    return avg, len(common), all_exact


# ---------------------------------------------------------------------------
# Suffix-array substring containment (north_rule verification tier)
# ---------------------------------------------------------------------------

class SuffixArray:
    """Suffix array over one text with O(m log n) substring containment.

    Built once per *verification target* and reused across all candidate
    pairs that share that target (amortized in ``stages/verify.py``); the
    classic scale path for "is a contained in b" when b is long and queried
    repeatedly. For single-shot short captions the kernel falls back to the
    C-speed ``in`` operator — identical semantics.
    """

    def __init__(self, text: str):
        self.text = text
        self.sa = sorted(range(len(text)), key=lambda i: text[i:])

    def contains(self, pattern: str) -> bool:
        t, sa, m = self.text, self.sa, len(pattern)
        if m == 0:
            return True
        lo, hi = 0, len(sa)
        while lo < hi:
            mid = (lo + hi) // 2
            if t[sa[mid] : sa[mid] + m] < pattern:
                lo = mid + 1
            else:
                hi = mid
        return lo < len(sa) and t[sa[lo] : sa[lo] + m] == pattern


def substring_contained(a: str, b: str, sa_threshold: int = 4096) -> bool:
    """True iff the shorter of a/b is a substring of the longer.

    Uses the C-speed scan for short texts; a suffix-array binary search above
    ``sa_threshold`` characters (the documented scale path).
    """
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if not short:
        return False
    if len(long_) <= sa_threshold:
        return short in long_
    return SuffixArray(long_).contains(short)


# ---------------------------------------------------------------------------
# Training-data text analysis (engine extensions; vectorized over batches)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"[A-Za-z0-9_']+|[^\sA-Za-z0-9_']")

# Quality-feature patterns, shared verbatim by three consumers: the scalar
# kernel below (compiled with re.ASCII so Python \w matches RE2's
# ASCII-only \w), the vectorized Arrow batch kernel
# (pipelines/text_analysis.py, pyarrow count_substring_regex) and the DuckDB
# oracle SQL (__ray_entry__.py) — one definition, three engines, identical
# counts.
QUALITY_PUNCT_RE = r"[^\w\s]"
QUALITY_WORD_RE = r"\w+"
QUALITY_WCHAR_RE = r"\w"

# BPE-ish pretokenizer: the GPT-2 pattern (Radford et al. 2019 — the public
# `'s|'t|'re|…| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+` rule)
# adapted to RE2 (no lookahead: the trailing-whitespace alternative folds
# into plain `\s+`, which only changes how END-of-text whitespace runs are
# grouped — one token either way). Counting non-overlapping matches gives
# the pre-merge BPE token count, the budget a byte-pair tokenizer sees
# BEFORE merges (an upper bound on post-merge tokens). Shared verbatim by
# the Arrow batch kernel (count_substring_regex) and the DuckDB oracle
# (REGEXP_EXTRACT_ALL) — both are RE2, so counts are bit-identical.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

# PII-scrub patterns (pipelines.text_analysis.redact_pii): shared VERBATIM
# by the Arrow kernels (count_substring_regex / replace_substring_regex)
# and the DuckDB oracle (REGEXP_EXTRACT_ALL / REGEXP_REPLACE(..., 'g')) —
# both engines are RE2, so counts and replacements are bit-identical.
# Applied in this order: email, then IPv4, then phone.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_STOPWORD_LIST = (
    "the a an and or of to in is are was were be for on with as by at it "
    "this that from"
).split()
QUALITY_STOP_RE = r"\b(?:" + "|".join(_STOPWORD_LIST) + r")\b"

_WORD = re.compile(QUALITY_WORD_RE, re.ASCII)
_PUNCT = re.compile(QUALITY_PUNCT_RE, re.ASCII)
_STOP = re.compile(QUALITY_STOP_RE, re.ASCII)

# top character-trigram inventories per language, derived from public
# frequency tables (small heuristic n-gram lang-id, not a trained model)
_LANG_TRIGRAMS: dict[str, frozenset[str]] = {
    "en": frozenset(["the", "and", "ing", "ion", "tio", "ent", "ati", "for",
                     "her", "ter", "hat", "tha", "ere", "ate", "his", "con",
                     "res", "ver", "all", "ons"]),
    "de": frozenset(["der", "ein", "sch", "ich", "nde", "die", "che", "den",
                     "und", "ten", "ung", "gen", "ber", "cht", "ver", "das"]),
    "fr": frozenset(["ent", "les", "des", "que", "ion", "ous", "ait", "ur ",
                     "eur", "ant", "tre", "est", "our", "dan", "men", "par"]),
    "es": frozenset(["que", "ent", "ión", "los", "ado", "con", "res", "aci",
                     "del", "est", "par", "cio", "nte", "era", "las", "por"]),
}


def lang_id(text: str) -> str:
    """Heuristic character-trigram language guess over {en,de,fr,es,unknown}."""
    t = text.lower()
    if len(t) < 6:
        return "unknown"
    grams = [t[i : i + 3] for i in range(0, min(len(t) - 2, 4000))]
    best, best_score = "unknown", 0
    for lang, inv in _LANG_TRIGRAMS.items():
        score = sum(1 for g in grams if g in inv)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score >= max(2, len(grams) // 50) else "unknown"


def token_count(text: str) -> int:
    """BPE-ish token count: word/number runs plus individual symbols."""
    return len(_TOKEN.findall(text))


def whitespace_token_count(text: str) -> int:
    return len(text.split())


_STOPWORDS = frozenset(_STOPWORD_LIST)


def quality_features(text: str) -> tuple[int, float, float, float]:
    """(n_chars, punct_ratio, stopword_ratio, mean_word_len) — the standard
    cheap quality signals for training-data filtering.

    Words are ASCII ``\\w+`` runs (so the scalar, the Arrow batch kernel and
    the DuckDB oracle — all RE2-pattern engines — count identically); the
    stopword count is occurrences of the ``QUALITY_STOP_RE`` alternation,
    which equals set-membership counting because the ``\\b`` anchors only
    match whole ``\\w+`` runs."""
    n = len(text)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    punct = len(_PUNCT.findall(text))
    low = text.lower()
    words = _WORD.findall(low)
    stop = len(_STOP.findall(low))
    n_words = len(words)
    wchars = sum(len(w) for w in words)
    return (
        n,
        punct / n,
        (stop / n_words) if n_words else 0.0,
        (wchars / n_words) if n_words else 0.0,
    )


def fingerprint64_batch(texts: list[str], window: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprints for a whole batch: ONE rolling-
    hash pass over the concatenated bytes (``shingle_hash_stream``) and a
    single ``np.minimum.reduceat`` for the per-doc min — no per-document
    Python/numpy call chain. Texts shorter than the window are NUL-padded to
    one shingle (the stream kernel's convention). Returns int64 (the uint64
    min reinterpreted, matching Arrow's signed storage)."""
    if not texts:
        return np.empty(0, dtype=np.int64)
    stream, offsets = _shingle_hash_stream(texts, window, seed=0x51)
    return np.minimum.reduceat(stream, offsets[:-1]).view(np.int64)


def content_fingerprint128(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """128-bit whole-text content fingerprints as two int64 arrays
    (blake2b, digest_size=16 — a cryptographic hash, so distinct texts
    collide with p ≈ 2⁻¹²⁸: the same effective-exactness contract the
    substring family's ``char_ngram_hash2_stream`` windows carry). Used by
    the exact-dedup family so text equality can be decided from 16-byte
    keys and the text column never rides an exchange.

    Per-doc ``hashlib`` calls, not a numpy kernel: whole-text hashing is
    inherently per-document and the C digest over the bytes dominates the
    ~1 µs/doc call overhead for any non-trivial document."""
    import hashlib

    n = len(texts)
    h1 = np.empty(n, dtype=np.int64)
    h2 = np.empty(n, dtype=np.int64)
    for i, s in enumerate(texts):
        d = hashlib.blake2b(
            (s or "").encode("utf-8", "surrogatepass"), digest_size=16
        ).digest()
        h1[i] = int.from_bytes(d[:8], "little", signed=True)
        h2[i] = int.from_bytes(d[8:], "little", signed=True)
    return h1, h2


def fingerprint64(text: str, window: int = 8) -> int:
    """Scalar convenience wrapper over ``fingerprint64_batch``."""
    # module-level import (bottom of file) — a function-local package import
    # would re-import by name inside Ray workers, defeating the by-value
    # pickling the driver contract relies on
    return int(fingerprint64_batch([text], window)[0])


from .hashing import shingle_hash_stream as _shingle_hash_stream  # noqa: E402
