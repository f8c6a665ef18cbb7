"""Shared constants for the pipeline operators.

Every constant here is consumed by BOTH the Spark implementation and the
DuckDB oracle-SQL generator, so the two sides cannot drift. All hash
arithmetic is sized so intermediate products fit in signed int64 in both
engines (DuckDB errors on bigint overflow; Spark wraps silently — either
behavior would break parity, so we never get near 2^63).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# 32-bit content hash: first 8 hex chars of md5, parsed as an integer.
# md5 is available and byte-identical in Spark (F.md5), DuckDB (md5) and
# Python (hashlib.md5), making it the one hash we can share across all
# three implementations. Range [0, 2^32), always non-negative.
# ---------------------------------------------------------------------------


def hash32_sql_duckdb(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def hash32_sql_spark(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def hash32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# MinHash: h_i(x) = (a_i * x + b_i) mod P  over 32-bit shingle hashes x.
# P = 2^31 - 1 (Mersenne prime). a_i < 2^29, x < 2^32 → a_i*x < 2^61,
# safely inside int64 for both engines. 16 hashes = 4 bands × 4 rows,
# the classic S-curve with ~50% collision probability at Jaccard ≈ 0.72.
# Coefficients are fixed literals (seeded once, frozen) so Spark, DuckDB
# and tests share them verbatim.
# ---------------------------------------------------------------------------

MERSENNE_P = 2147483647  # 2^31 - 1
NUM_MINHASHES = 16
LSH_BANDS = 4
LSH_ROWS = NUM_MINHASHES // LSH_BANDS
SHINGLE_N = 3  # token 3-gram shingles
MINHASH_JACCARD_THRESHOLD = 0.5

_rng = np.random.RandomState(20260816)
MINHASH_A: list[int] = [int(x) for x in _rng.randint(1, 2**29, size=NUM_MINHASHES)]
MINHASH_B: list[int] = [int(x) for x in _rng.randint(0, MERSENNE_P, size=NUM_MINHASHES)]


def minhash_sql(i: int, x_expr: str) -> str:
    """One permutation hash, identical text for Spark SQL and DuckDB."""
    return f"(({MINHASH_A[i]} * {x_expr} + {MINHASH_B[i]}) % {MERSENNE_P})"


# Band value: fold the band's ROWS minhash values with a 31-polynomial mod P.
# m_i < P < 2^31; acc*31 + m < 2^36 + 2^31 — int64-safe.
def band_sql(sig_exprs: list[str]) -> str:
    acc = "0"
    for e in sig_exprs:
        acc = f"(({acc} * 31 + {e}) % {MERSENNE_P})"
    return acc


# ---------------------------------------------------------------------------
# SimHash: 64-bit, token-tf weighted, stored as TWO 32-bit words (lo, hi)
# so every intermediate stays far inside signed int64 in Spark, DuckDB and
# Python (a single 64-bit fingerprint would need 1<<63, which overflows
# signed int64). Bit j of lo is 1 iff Σ_terms tf · (bit j of hash32(term)
# ? +1 : −1) > 0; hi uses hash32(term || '#') for its 32 independent bits
# ('#' is outside the token alphabet, so the suffixed string never
# collides with another token).
# Near-dup pairs: Hamming distance <= 3 over the 64 bits. With 4 bands of
# 16 bits (2 per word), any pair within Hamming 3 shares at least one
# exact band (pigeonhole), so the band join is an EXACT prefilter — and
# 65,536 buckets per band keep the self-join sub-quadratic at 100× corpus
# (the previous 32-bit/8-bit-band layout had only 256 buckets per band,
# which degenerates toward all-pairs at scale).
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_WORD_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 16
SIMHASH_BANDS_PER_WORD = SIMHASH_WORD_BITS // SIMHASH_BAND_BITS  # 2
SIMHASH_MAX_HAMMING = 3
SIMHASH_HI_SUFFIX = "#"

# ---------------------------------------------------------------------------
# N-gram Jaccard dedup
# ---------------------------------------------------------------------------

NGRAM_JACCARD_THRESHOLD = 0.5

# ---------------------------------------------------------------------------
# Embedding LSH: random-hyperplane sign bits. 4 planes → 16 buckets.
# Components are frozen literals via repr(float) so the decimal string
# parses to the identical IEEE-754 double in Spark, DuckDB and Python.
# ---------------------------------------------------------------------------

EMBEDDING_DIM = 64
N_HYPERPLANES = 4
COSINE_DUP_THRESHOLD = 0.99
ANN_K = 10

_hp = np.random.RandomState(7).randn(N_HYPERPLANES, EMBEDDING_DIM)
HYPERPLANES: list[list[float]] = [[float(round(v, 6)) for v in row] for row in _hp]

# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse spherical-kmeans lists. Deterministic
# contract shared with the DuckDB oracle: seeds = the IVF_N_LISTS vectors
# with the smallest ids; ONE Lloyd refinement whose per-dim means are
# rounded to 6 dp (absorbs cross-engine summation-order noise so the
# refined centroids are bit-identical doubles on both sides).
# ---------------------------------------------------------------------------

IVF_N_LISTS = 8
IVF_NPROBE = 2

# ---------------------------------------------------------------------------
# Product quantization (PQ — Jégou et al. 2011, the Faiss IVF,PQ storage
# path; OpenSearch k-NN ships it as the `pq` encoder on the IVF engine).
# The 64-dim vector splits into PQ_M subspaces of PQ_SUBDIM dims; each
# subspace gets a PQ_K-entry codebook (same deterministic training recipe
# as the IVF coarse quantizer: seeds = the PQ_K lowest-id subvectors, one
# Lloyd step with 6-dp means — but L2 argmin, PQ's native metric). A
# vector stores only PQ_M 1-byte codes: 64 float32 dims → 4 bytes, 64×
# compression (int8 SQ is 4×). Query-time scoring is ADC (asymmetric
# distance computation): a driver-built M×K lookup table of per-subspace
# partial dots / squared norms — O(M·K·SUBDIM) doubles, always
# broadcastable — turns the coarse pass into ONE codegen scan of the code
# table with no float I/O at all; an exact float rescore then touches only
# the k×oversample window.
# ---------------------------------------------------------------------------

#: 8 subspaces of 8 dims — the Faiss-typical geometry for 64-dim vectors
#: (8 bytes/vector, 32× vs float32). Measured on the synthetic corpus
#: (tools/ann_recall.py; random gaussians are the ADVERSARIAL case for a
#: quantizer — no cluster structure to exploit): recall@10 0.48 vs 0.37
#: at the coarser M=4, against int8's 0.98 at only 4× compression.
PQ_M = 8
PQ_SUBDIM = EMBEDDING_DIM // PQ_M
PQ_K = 16

# ---------------------------------------------------------------------------
# SemDeDup cluster sizing (pipeline/dedup.py semantic_dedup). The within-
# cluster compare is O(|cluster|²), so the cluster COUNT must grow with the
# corpus or the "never all-pairs" claim decays (the r6 verdict's flag):
# SemDeDup itself uses tens of thousands of clusters at scale (Abbas et al.
# 2023 run 50k clusters over LAION-440M). Rule:
#
#   n_lists = max(MIN, ceil(sqrt(N)), ceil(N / MEAN_CLUSTER))
#
# sqrt(N) is the classic IVF sweet spot for small-to-medium corpora; the
# N / MEAN_CLUSTER term takes over past N = MEAN_CLUSTER² (~1M rows) and
# caps the EXPECTED cluster width at a constant, making total pair work
# ≈ N × MEAN_CLUSTER / 2 — linear in the corpus. (k-means does not bound
# the MAX cluster; a pathologically hot cluster still needs an in-cluster
# banding stage, which embedding_near_dups' hyperplane buckets provide.)
# ---------------------------------------------------------------------------

SEMANTIC_DEDUP_MEAN_CLUSTER = 1024
SEMANTIC_DEDUP_MIN_LISTS = IVF_N_LISTS


def semantic_dedup_n_lists(n_rows: int) -> int:
    """The SemDeDup cluster-count rule above; must stay arithmetically
    identical to :func:`semantic_dedup_n_lists_sql`."""
    import math

    n = max(int(n_rows), 0)
    s = math.isqrt(n)
    if s * s < n:
        s += 1
    per = -(-n // SEMANTIC_DEDUP_MEAN_CLUSTER)
    return max(SEMANTIC_DEDUP_MIN_LISTS, s, per)


def semantic_dedup_n_lists_sql(count_expr: str) -> str:
    """DuckDB twin of :func:`semantic_dedup_n_lists` (float sqrt is exact
    for every count below 2^52, so ceil(sqrt(·)) agrees with the integer
    form at any realistic row count)."""
    return (
        f"GREATEST({SEMANTIC_DEDUP_MIN_LISTS}, "
        f"CAST(ceil(sqrt({count_expr})) AS BIGINT), "
        f"CAST(ceil({count_expr} / {SEMANTIC_DEDUP_MEAN_CLUSTER}.0) AS BIGINT))"
    )


def dot_sql(vec_expr: str, plane: list[float], one_based: bool) -> str:
    """Unrolled, left-associated dot product so both engines sum in the
    same order → bit-identical doubles. `one_based` for DuckDB indexing."""
    off = 1 if one_based else 0
    terms = [
        f"CAST({vec_expr}[{i + off}] AS DOUBLE) * {plane[i]!r}"
        for i in range(len(plane))
    ]
    return "(" + " + ".join(terms) + ")"


def pairwise_dot_sql(a_expr: str, b_expr: str, dim: int, one_based: bool) -> str:
    off = 1 if one_based else 0
    terms = [
        f"CAST({a_expr}[{i + off}] AS DOUBLE) * CAST({b_expr}[{i + off}] AS DOUBLE)"
        for i in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def bucket_sql(vec_expr: str, one_based: bool) -> str:
    bits = [
        f"(CASE WHEN {dot_sql(vec_expr, HYPERPLANES[j], one_based)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_HYPERPLANES)
    ]
    return "(" + " + ".join(bits) + ")"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

#: language → stopword list for the n-gram/stopword language-ID heuristic.
#: Order of LANGS is the deterministic tie-break (first wins).
LANGS: list[str] = ["en", "de", "es", "fr", "zh"]
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "zh": ["shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "na", "bu"],
}

#: "BPE-ish" token regex: words, numbers, or single punctuation marks —
#: the usual pre-tokenizer shape (GPT-2 style, ASCII simplification).
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

FINGERPRINT_MULT = 31  # rolling polynomial base, mod MERSENNE_P

# quality-score weights (length, alpha ratio, stopword ratio, mean token len)
QUALITY_STOPWORDS = STOPWORDS["en"]


# ---------------------------------------------------------------------------
# Deterministic 4-dp rounding. Engine round() implementations disagree on
# half-way cases (Spark: BigDecimal HALF_UP; DuckDB: float-path), which
# matters for ratio columns that land exactly on x.xxxx5. floor(x*1e4+0.5)
# is the same IEEE arithmetic in both engines.
# ---------------------------------------------------------------------------


def round4_sql(expr: str) -> str:
    return f"(floor({expr} * 10000 + 0.5) / 10000)"


def round4(col):
    from pyspark.sql import functions as F

    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# 6-dp variant: used where a rounded value feeds FURTHER computation that
# must agree bit-for-bit across engines (e.g. the neural clause score that
# min_max normalization stats are computed over) — absorbing float
# summation-order noise at the clause boundary makes everything downstream
# exact on both sides.


def round6_sql(expr: str) -> str:
    return f"(floor({expr} * 1000000 + 0.5) / 1000000)"


def round6(col):
    from pyspark.sql import functions as F

    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000


# ---------------------------------------------------------------------------
# PII scrubbing (CCNet/Dolma-style pre-training hygiene). The patterns are
# kept inside the RE2 ∩ java.util.regex common dialect (no backrefs, no
# lookaround) so Spark and DuckDB match byte-identically; replacements are
# the Dolma-style sentinel tokens.
# ---------------------------------------------------------------------------

# Host part: regular domain with alpha TLD OR an IPv4 literal, so
# user@10.0.0.5 scrubs as one email (never as an IP — emails mask first).
PII_EMAIL_PATTERN = (
    "[a-z0-9._%+-]+@([a-z0-9.-]+\\.[a-z]{2,}"
    "|[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})"
)
PII_IPV4_PATTERN = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_PATTERN = "\\+[0-9]{7,15}"
PII_EMAIL_TOKEN = "|||EMAIL|||"
PII_IPV4_TOKEN = "|||IP|||"
PII_PHONE_TOKEN = "|||PHONE|||"
