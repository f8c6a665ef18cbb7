"""Lucene ``SmallFloat`` byte4 norm quantization (public Lucene knowledge).

Lucene stores the per-document field length (token count) as a single
byte via ``SmallFloat#intToByte4`` and decodes it at query time with
``byte4ToInt``; BM25 sees the *quantized* length. The reference plugin
inherits this untouched from Lucene's ``BM25Similarity`` (SURVEY.md §2.2,
§7.2) — without reproducing it, scores are not rank-identical to the
reference stack.

Encoding (Lucene ``org.apache.lucene.util.SmallFloat``):

- ``longToInt4``: 3-bit mantissa + implicit leading bit + shift; values
  < 16 are exact ("subnormal"), larger values keep the top 4 significant
  bits (truncation).
- ``intToByte4``: values ``0..NUM_FREE_VALUES-1`` map to themselves;
  larger values map to ``NUM_FREE_VALUES + longToInt4(i - NUM_FREE_VALUES)``
  where ``NUM_FREE_VALUES = 255 - longToInt4(2^31-1) = 255 - 231 = 24``.

Net effect: lengths 0..39 are exact; above that, ``quantize(L) =
24 + top4bits(L - 24)``. All three implementations here (scalar, numpy,
SQL expression) must agree; tests assert it.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - longToInt4(Integer.MAX_VALUE) == 255 - 231


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Lucene ``SmallFloat.intToByte4`` (returned as unsigned 0..255)."""
    if i < 0:
        raise ValueError("only positive values")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Lucene ``SmallFloat.byte4ToInt`` (b unsigned 0..255)."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


def quantize_length(length: int) -> int:
    """byte4ToInt(intToByte4(length)) — what BM25 sees as the doc length."""
    return byte4_to_int(int_to_byte4(length))


def quantize_length_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized quantize for Arrow/pandas kernels."""
    lengths = np.asarray(lengths, dtype=np.int64)
    out = lengths.copy()
    big = lengths >= 40
    if big.any():
        x = lengths[big] - NUM_FREE_VALUES
        # bit_length(x) for x >= 16
        nbits = np.floor(np.log2(x.astype(np.float64))).astype(np.int64) + 1
        # guard against fp edge at exact powers of two
        nbits = np.where((np.int64(1) << nbits) <= x, nbits + 1, nbits)
        nbits = np.where((np.int64(1) << (nbits - 1)) > x, nbits - 1, nbits)
        shift = nbits - 4
        out[big] = NUM_FREE_VALUES + ((x >> shift) << shift)
    return out


def quantize_length_sql(col: str) -> str:
    """The same step function as a SQL expression (DuckDB *and* Spark SQL:
    both provide ``bin()``, ``>>``/``<<`` on integers)."""
    x = f"({col} - 24)"
    s = f"(length(bin({x})) - 4)"
    return f"(CASE WHEN {col} < 40 THEN {col} ELSE 24 + (({x} >> {s}) << {s}) END)"
