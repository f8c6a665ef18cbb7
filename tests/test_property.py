"""Property-based tests (hypothesis) over the pure-Python kernels.

The reference ships no randomized testing (SURVEY.md §5 "Not present");
these properties pin the invariants the Spark plans rely on: codec
round-trips, block-metadata soundness, SmallFloat quantization laws, the
chunker's offset-slicing reconstruction rule, prune-strategy partition
laws, and the never-throws contract of the simple_query_string parser.
All Spark-free — they run in milliseconds."""

import math

import numpy as np
from hypothesis import given, settings as hsettings, strategies as st

hsettings.register_profile("repo", deadline=None)
hsettings.load_profile("repo")

from neural_search_spark.index.codec import (
    decode_posting_list,
    encode_posting_list,
    varint_decode,
    varint_encode,
)
from neural_search_spark.index.smallfloat import (
    byte4_to_int,
    int_to_byte4,
    quantize_length,
    quantize_length_np,
)

uint64s = st.lists(
    st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300
)


@given(uint64s)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=512),
            st.integers(min_value=1, max_value=255),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),
)
def test_posting_list_roundtrip_and_blockmax(rows, block_size):
    rows = sorted(rows)
    d = np.array([r[0] for r in rows], dtype=np.int64)
    t = np.array([r[1] for r in rows], dtype=np.int64)
    q = np.array([r[2] for r in rows], dtype=np.int64)
    doc_b, tf_b, blocks = encode_posting_list(d, t, q, block_size=block_size)
    dd, tt = decode_posting_list(doc_b, tf_b, blocks)
    assert np.array_equal(dd, d) and np.array_equal(tt, t)
    # block metadata is SOUND: per-block max_tf / min_dlq bound the rows
    for bi, (last, maxtf, mindlq, _de, _te) in enumerate(blocks):
        s, e = bi * block_size, min((bi + 1) * block_size, len(rows))
        assert last == int(d[e - 1])
        assert maxtf == int(t[s:e].max())
        assert mindlq == int(q[s:e].min())
    # selective decode of any single block equals that slice
    if len(blocks) > 1:
        mask = np.zeros(len(blocks), dtype=bool)
        mask[1] = True
        dd1, tt1 = decode_posting_list(doc_b, tf_b, blocks, block_mask=mask)
        s, e = block_size, min(2 * block_size, len(rows))
        assert np.array_equal(dd1, d[s:e]) and np.array_equal(tt1, t[s:e])


@given(st.integers(min_value=1, max_value=2**30))
def test_smallfloat_laws(n):
    qn = quantize_length(n)
    # idempotence: a quantized value round-trips through the byte codec
    assert byte4_to_int(int_to_byte4(qn)) == qn
    # lossy-but-bounded: the decoded bucket never exceeds the input and is
    # within the 3-bit mantissa's relative error below it
    assert qn <= n
    assert qn >= n // 16  # SmallFloat byte4 worst-case bucket floor
    # vectorized path agrees with the scalar path
    assert int(quantize_length_np(np.array([n], dtype=np.int64))[0]) == qn


@given(st.integers(min_value=1, max_value=2**30), st.integers(min_value=0, max_value=2**30))
def test_smallfloat_monotone(a, b):
    lo, hi = min(a, a + b), max(a, a + b)
    assert quantize_length(lo) <= quantize_length(hi)


@given(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")),
        max_size=400,
    ),
    st.integers(min_value=1, max_value=20),
    st.floats(min_value=0.0, max_value=0.5),
    st.sampled_from(["standard", "whitespace", "letter", "lowercase"]),
)
@hsettings(max_examples=60)
def test_chunker_roundtrip_property(text, token_limit, overlap, tokenizer):
    from neural_search_spark.analysis.chunking import chunk_fixed_tokens

    chunks = chunk_fixed_tokens(
        text, token_limit=token_limit, overlap_rate=0.0, tokenizer=tokenizer
    )
    # zero-overlap concatenation reconstructs the source exactly — the
    # offset-slicing contract (FixedTokenLengthChunker round-trip rule)
    if chunks:
        assert "".join(chunks) == text
    # with overlap, every chunk is still a verbatim substring
    chunks_o = chunk_fixed_tokens(
        text, token_limit=token_limit, overlap_rate=overlap, tokenizer=tokenizer
    )
    for c in chunks_o:
        assert c in text


@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        st.floats(min_value=0.001, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from(["top_k", "max_ratio", "abs_value", "alpha_mass"]),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_prune_partition_law(vec, ptype, ratio):
    from neural_search_spark.search.sparse import prune_vector

    r = int(math.ceil(ratio * len(vec))) if ptype == "top_k" else ratio
    kept, pruned = prune_vector(vec, ptype, r)
    # partition law: kept and pruned are disjoint and cover the vector
    assert set(kept) | set(pruned) == set(vec)
    assert not (set(kept) & set(pruned))
    for t in kept:
        assert kept[t] == vec[t]
    # strategy-specific laws
    if ptype == "max_ratio":
        mx = max(vec.values())
        assert all(v >= r * mx for v in kept.values())
        assert all(v < r * mx for v in pruned.values())
    if ptype == "abs_value":
        assert all(v >= r for v in kept.values())
    if ptype == "top_k":
        assert len(kept) <= r
        if pruned and kept:
            # value-descending cut: every kept value >= every pruned value
            # (equal values split deterministically by token ascending)
            assert min(kept.values()) >= max(pruned.values())


@given(st.text(max_size=300))
@hsettings(max_examples=200)
def test_simple_query_string_never_throws(q):
    from neural_search_spark.search.spec import parse_simple_query_string

    out = parse_simple_query_string(q)  # the defining property: no throw
    assert set(out) == {"should", "must_not"}
    for c in out["should"]:
        assert c["kind"] in ("match", "phrase") and c["terms"]


@given(st.lists(st.floats(min_value=-10, max_value=10), min_size=8, max_size=8))
def test_query_embedding_unit_norm(_ignored):
    # the stand-in embedding is always unit-norm (cosine = dot contract)
    from neural_search_spark.search.neural import query_embedding_stub

    v = query_embedding_stub("some text with tokens " + str(_ignored[0]))
    n = math.sqrt(sum(x * x for x in v))
    assert abs(n - 1.0) < 1e-9 or n == 0.0
