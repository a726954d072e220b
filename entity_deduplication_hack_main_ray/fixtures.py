"""Deterministic fixture generator: the ``corpus`` table per BASELINE.json's
``input_hint`` + reference-style ``golden`` duplicate pairs.

Mirrors the reference's test-corpus design (SURVEY.md §5): verbalized records
("Type: X. Name: Y. …" — reference ``graphToText_utils.py:47-58``) with
duplicate injections following the golden variation taxonomy of
``data/test_golden_standard_high.csv`` (typos, abbreviations, omissions,
format changes) plus image-side variations (re-encode, exact copy).

Everything is a pure function of ``seed`` — same seed ⇒ byte-identical
parquet, which is what lets tests, oracle and bench share one corpus without
shipping data.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.codecs import decode_image, encode_fake_jpeg, encode_png
from .functions.hashing import dct_matrix, phash64

# Vocabularies are syllable-composed so the name/city space is large
# (~10^4 first×last combos): with small hand lists, thousands of *distinct*
# records would share exact names and 0.6+ caption Jaccard, flooding the
# candidate stage with fixture-artifact near-dups no real caption corpus has.
_SYL_A = ["a", "be", "ca", "do", "el", "fa", "gi", "ha", "ilo", "jo", "ka",
          "lu", "ma", "ne", "or", "pa", "qui", "ra", "sa", "tu", "u", "vi",
          "wa", "xe", "ya", "zo"]
_SYL_B = ["bel", "car", "dan", "der", "fin", "gard", "hart", "kin", "lin",
          "lock", "man", "mer", "nor", "rick", "ron", "son", "stein", "ter",
          "ton", "vale", "wick", "worth"]
_FIRST = [a + b for a in _SYL_A for b in ["la", "ri", "no", "ta", "vin",
                                          "dra", "mi", "sel"]]
_LAST = [a + b for a in _SYL_A for b in _SYL_B]
_JOB = [f"{lvl} {role}".strip() for lvl in
        ["senior", "junior", "chief", "assistant", "", "locum", "interim"]
        for role in
        ["nurse practitioner", "general practitioner", "radiology technician",
         "cardiologist", "medical receptionist", "pharmacist", "surgeon",
         "physical therapist", "lab technician", "anesthesiologist",
         "dietitian", "midwife", "paramedic", "orthopedist"]]
_CITY = [a + b for a in _SYL_A for b in ["stad", "burg", "dam", "wijk",
                                         "veld", "hoven", "lo", "meer"]]
_DEPT = ["emergency department", "intensive care unit", "radiology department",
         "cardiology department", "general surgery", "outpatient clinic",
         "oncology ward", "maternity ward", "neurology department",
         "orthopedics department", "pediatrics department", "dialysis unit"]

VARIATIONS = [
    "exact", "reencode", "name_typo", "city_typo", "email_typo",
    "abbreviated_first_name", "department_abbreviation", "omission",
    "date_format_variation", "substring",
]

CORPUS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("original_id", pa.string()),
        ("duplicate_id", pa.string()),
        ("variation_type", pa.string()),
        ("field_name", pa.string()),
        ("entity_type", pa.string()),  # base record's Type field — enables
        # the reference's per-entity-type P/R breakdown
        # (EvaluateVariations.ipynb cell 5)
    ]
)

# Entity types mirror the reference corpus's mix of record kinds; a dup pair
# always shares its base record's type (variations never touch the Type
# field), so typed records don't change matcher semantics — they enable the
# (variation × type) eval grid.
_TYPES = ["Person", "Provider", "Organization"]


def _image_id(seed: int, i: int) -> str:
    return f"{i:08d}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{seed}/{i}')}"


def _base_pixels(rng: np.random.Generator, size: int = 32) -> np.ndarray:
    """Deterministic synthetic RGB image: gradient + rectangles + mild noise.

    Structured (not pure noise) so DCT pHash has real low-frequency content
    and re-encoding at PSNR≥40dB keeps Hamming distance near 0.
    """
    y, x = np.mgrid[0:size, 0:size]
    base = (x * (255 / size) * 0.5 + y * (255 / size) * 0.5)
    img = np.stack([base] * 3, axis=2)
    for _ in range(3):
        x0, y0 = rng.integers(0, size - 8, size=2)
        wd, ht = rng.integers(6, 16, size=2)
        color = rng.integers(0, 256, size=3)
        img[y0 : y0 + ht, x0 : x0 + wd] = color
    img = img + rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(rec: dict[str, str]) -> str:
    parts = [f"Type: {rec['type']}."]
    for label, key in [
        ("Name", "name"), ("Job Title", "job"), ("Email", "email"),
        ("Birth Date", "birth"), ("City", "city"), ("Postal Code", "postal"),
        ("Department", "dept"),
    ]:
        if key in rec:
            parts.append(f"{label}: {rec[key]}.")
    return " ".join(parts)


def _make_record(rng: np.random.Generator) -> dict[str, str]:
    first = _FIRST[rng.integers(len(_FIRST))]
    last = _LAST[rng.integers(len(_LAST))]
    y, m, d = rng.integers(1950, 2005), rng.integers(1, 13), rng.integers(1, 29)
    return {
        "type": _TYPES[int(rng.integers(len(_TYPES)))],
        "name": f"{first} {last}",
        "job": _JOB[rng.integers(len(_JOB))],
        "email": f"{first}.{last}@example.org".replace(" ", ""),
        "birth": f"{y:04d}-{m:02d}-{d:02d}",
        "city": _CITY[rng.integers(len(_CITY))],
        "postal": f"{rng.integers(1000, 9999)} {chr(65+rng.integers(26))}{chr(65+rng.integers(26))}",
        "dept": _DEPT[rng.integers(len(_DEPT))],
    }


def _typo(rng: np.random.Generator, s: str) -> str:
    if len(s) < 3:
        return s + "x"
    i = int(rng.integers(1, len(s) - 1))
    op = rng.integers(3)
    if op == 0:  # substitute
        return s[:i] + chr(97 + int(rng.integers(26))) + s[i + 1 :]
    if op == 1:  # delete
        return s[:i] + s[i + 1 :]
    return s[:i] + s[i] + s[i:]  # duplicate


def _apply_variation(
    rng: np.random.Generator, rec: dict[str, str], var: str
) -> tuple[dict[str, str], str]:
    """Return (mutated record, field_name touched)."""
    r = dict(rec)
    if var in ("exact", "reencode", "substring"):
        return r, ""
    if var == "name_typo":
        r["name"] = _typo(rng, r["name"]); return r, "name"
    if var == "city_typo":
        r["city"] = _typo(rng, r["city"]); return r, "city"
    if var == "email_typo":
        r["email"] = _typo(rng, r["email"]); return r, "email"
    if var == "abbreviated_first_name":
        first, rest = r["name"].split(" ", 1)
        r["name"] = f"{first[0]}. {rest}"; return r, "name"
    if var == "department_abbreviation":
        r["dept"] = "".join(w[0] for w in r["dept"].split()).upper()
        return r, "department"
    if var == "omission":
        key = ["job", "email", "postal", "dept"][int(rng.integers(4))]
        r.pop(key, None); return r, key
    if var == "date_format_variation":
        y, m, d = r["birth"].split("-")
        r["birth"] = f"{d}/{m}/{y}"; return r, "birthDate"
    raise ValueError(var)


def generate_corpus(
    n_base: int,
    seed: int = 42,
    dup_rate: float = 0.45,
    max_dups: int = 3,
) -> tuple[pa.Table, pa.Table]:
    """Generate ``(corpus, golden)`` Arrow tables.

    ~``dup_rate`` of base records spawn 1..max_dups duplicates drawn from the
    variation taxonomy. ``phash`` is precomputed by this generator with the
    same public DCT-pHash algorithm the engine's Signer recomputes — the
    engine asserts agreement (per-row fidelity check).
    """
    rng = np.random.default_rng(seed)
    dct = dct_matrix(32)
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    golden_rows: list[tuple[str, str, str, str, str]] = []
    idx = 0

    def _emit(rec: dict[str, str], pixels: np.ndarray, fmt: str, quality: int) -> str:
        nonlocal idx
        iid = _image_id(seed, idx)
        idx += 1
        if fmt == "png":
            blob = encode_png(pixels)
        else:
            blob = encode_fake_jpeg(pixels, quality)
        decoded = decode_image(blob, fmt)
        ids.append(iid)
        blobs.append(blob)
        hs.append(pixels.shape[0])
        ws.append(pixels.shape[1])
        fmts.append(fmt)
        captions.append(_caption(rec))
        phashes.append(phash64(decoded, dct))
        return iid

    for _ in range(n_base):
        rec = _make_record(rng)
        size = int(rng.choice([32, 48, 64]))
        pixels = _base_pixels(rng, size)
        fmt = "png" if rng.random() < 0.5 else "jpeg"
        quality = int(rng.choice([70, 85, 95]))
        oid = _emit(rec, pixels, fmt, quality)

        if rng.random() < dup_rate:
            for _ in range(int(rng.integers(1, max_dups + 1))):
                var = VARIATIONS[int(rng.integers(len(VARIATIONS)))]
                drec, field = _apply_variation(rng, rec, var)
                dpix, dfmt, dq = pixels, fmt, quality
                if var == "reencode":
                    # re-encode the *published* image (decode → encode), as a
                    # scraper would: only ONE extra quantization error, so
                    # pairwise decoded-pixel PSNR stays ≥ 40 dB
                    if fmt == "png":
                        dpix = pixels
                    else:
                        dpix = decode_image(encode_fake_jpeg(pixels, quality), "jpeg")
                    dfmt, dq = "jpeg", 95
                elif var == "substring":
                    # caption strictly contained in the original; image cropped
                    drec = {k: v for k, v in drec.items() if k in
                            ("type", "name", "job", "email", "birth", "city",
                             "postal", "dept")}
                    drec.pop("dept", None)
                    drec.pop("postal", None)
                    c = size // 8
                    dpix = pixels[c : size - c, c : size - c]
                did = _emit(drec, dpix, dfmt, dq)
                golden_rows.append((oid, did, var, field, rec["type"]))

    corpus = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        },
        schema=CORPUS_SCHEMA,
    )
    golden = pa.table(
        {
            "original_id": pa.array([r[0] for r in golden_rows], pa.string()),
            "duplicate_id": pa.array([r[1] for r in golden_rows], pa.string()),
            "variation_type": pa.array([r[2] for r in golden_rows], pa.string()),
            "field_name": pa.array([r[3] for r in golden_rows], pa.string()),
            "entity_type": pa.array([r[4] for r in golden_rows], pa.string()),
        },
        schema=GOLDEN_SCHEMA,
    )
    return corpus, golden


def write_corpus(
    out_dir: str,
    n_base: int,
    seed: int = 42,
    rows_per_file: int = 10_000,
) -> tuple[str, str]:
    """Write corpus + golden parquet under ``out_dir`` (idempotent cache:
    skipped when the marker for the same (n_base, seed) already exists).
    Returns (corpus_dir, golden_path). Multiple part files so Ray reads
    parallelize."""
    corpus_dir = os.path.join(out_dir, "corpus")
    golden_path = os.path.join(out_dir, "golden.parquet")
    # v3: typed entities + entity_type golden column (cache key bump —
    # corpora written by earlier generator versions regenerate)
    marker = os.path.join(out_dir, f"_complete_v3_{n_base}_{seed}")
    if os.path.exists(marker):
        return corpus_dir, golden_path
    corpus, golden = generate_corpus(n_base, seed)
    os.makedirs(corpus_dir, exist_ok=True)
    for f in os.listdir(corpus_dir):  # drop stale parts from older versions
        if f.endswith(".parquet"):
            os.remove(os.path.join(corpus_dir, f))
    n = corpus.num_rows
    for p, start in enumerate(range(0, n, rows_per_file)):
        pq.write_table(
            corpus.slice(start, rows_per_file),
            os.path.join(corpus_dir, f"part-{p:05d}.parquet"),
        )
    pq.write_table(golden, golden_path)
    with open(marker, "w") as f:
        f.write("ok")
    return corpus_dir, golden_path
