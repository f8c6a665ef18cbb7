"""Codec unit tests: varint + delta + block metadata round-trips."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from neural_search_spark.index.codec import (
    decode_posting_list,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 255, 16383, 16384, 2**32 - 1, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_random(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500, unique=True),
    st.integers(min_value=1, max_value=1000),
    st.sampled_from([4, 128]),
)
def test_posting_list_roundtrip(docids, tf_seed, block_size):
    d = np.sort(np.array(docids, dtype=np.int64))
    rng = np.random.RandomState(tf_seed)
    tfs = rng.randint(1, 50, size=d.size).astype(np.int64)
    dlqs = rng.randint(1, 5000, size=d.size).astype(np.int64)
    db, tb, blocks = encode_posting_list(d, tfs, dlqs, block_size=block_size)
    dd, tt = decode_posting_list(db, tb, blocks)
    assert np.array_equal(dd, d)
    assert np.array_equal(tt, tfs)
    # block metadata is sound
    for i, (last, max_tf, min_dlq, _, _) in enumerate(blocks):
        s, e = i * block_size, min((i + 1) * block_size, d.size)
        assert last == d[e - 1]
        assert max_tf == tfs[s:e].max()
        assert min_dlq == dlqs[s:e].min()


def test_partial_block_decode():
    d = np.arange(0, 1000, 3, dtype=np.int64)
    tfs = (d % 7 + 1).astype(np.int64)
    dlqs = np.full(d.size, 100, dtype=np.int64)
    db, tb, blocks = encode_posting_list(d, tfs, dlqs, block_size=64)
    mask = np.zeros(len(blocks), dtype=bool)
    mask[1] = True
    mask[3] = True
    dd, tt = decode_posting_list(db, tb, blocks, block_mask=mask)
    expect_idx = np.concatenate([np.arange(64, 128), np.arange(192, 256)])
    expect_idx = expect_idx[expect_idx < d.size]
    assert np.array_equal(dd, d[expect_idx])
    assert np.array_equal(tt, tfs[expect_idx])
