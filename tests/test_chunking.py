"""Chunker parity tests mirroring the reference's chunker unit-test style
(`src/test/java/.../processor/chunker/*Tests.java` semantics)."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.analysis.chunking import (
    chunk_delimiter,
    chunk_fixed_chars,
    chunk_fixed_tokens,
    chunk_table,
)


class TestDelimiter:
    def test_basic_split_keeps_delimiter(self):
        assert chunk_delimiter("a\n\nb\n\nc", "\n\n") == ["a\n\n", "b\n\n", "c"]

    def test_no_delimiter(self):
        assert chunk_delimiter("abc", "\n\n") == ["abc"]

    def test_trailing_delimiter_no_empty_chunk(self):
        assert chunk_delimiter("a\n\n", "\n\n") == ["a\n\n"]

    def test_leading_delimiter(self):
        assert chunk_delimiter("\n\na", "\n\n") == ["\n\n", "a"]

    def test_empty_content(self):
        assert chunk_delimiter("", "\n\n") == []

    def test_empty_delimiter_rejected(self):
        with pytest.raises(ValueError):
            chunk_delimiter("abc", "")

    def test_max_chunk_limit_appends_rest(self):
        # limit 3, one string to chunk: 2 normal chunks then the remainder
        got = chunk_delimiter("a.b.c.d.e", ".", max_chunk_limit=3)
        assert got == ["a.", "b.", "c.d.e"]


class TestFixedTokens:
    def test_offset_slicing_roundtrip(self):
        text = "one two three four five six seven"
        got = chunk_fixed_tokens(text, token_limit=3, overlap_rate=0.0)
        assert got == ["one two three ", "four five six ", "seven"]
        assert "".join(got) == text

    def test_overlap(self):
        text = "a b c d e f"
        # overlap tokens = floor(4*0.5)=2, step=2
        got = chunk_fixed_tokens(text, token_limit=4, overlap_rate=0.5)
        assert got == ["a b c d ", "c d e f"]

    def test_first_chunk_includes_leading_chars(self):
        text = "  lead one two three"
        got = chunk_fixed_tokens(text, token_limit=2)
        assert got[0].startswith("  lead")

    def test_short_text_single_chunk(self):
        assert chunk_fixed_tokens("x y", token_limit=10) == ["x y"]

    def test_empty(self):
        assert chunk_fixed_tokens("", token_limit=10) == []

    def test_invalid_overlap(self):
        with pytest.raises(ValueError):
            chunk_fixed_tokens("a", token_limit=2, overlap_rate=0.6)


class TestFixedChars:
    def test_exact_windows(self):
        assert chunk_fixed_chars("abcdefghij", char_limit=4) == ["abcd", "efgh", "ij"]

    def test_last_chunk_extends_to_end(self):
        # start=0 limit=6 covers 6 of 8; next start=6: 6+6>=8 → to end
        assert chunk_fixed_chars("abcdefgh", char_limit=6) == ["abcdef", "gh"]

    def test_overlap(self):
        # overlap chars = floor(4*0.5)=2, interval=2
        assert chunk_fixed_chars("abcdefg", char_limit=4, overlap_rate=0.5) == [
            "abcd",
            "cdef",
            "efg",
        ]

    def test_short(self):
        assert chunk_fixed_chars("ab", char_limit=10) == ["ab"]


class TestNamedTokenizers:
    """FixedTokenLengthChunker.java:56-64,158-169: the chunker tokenizes
    through any registered word tokenizer (default ``standard``); the
    offset-slicing round-trip rule must hold under every one of them."""

    def test_whitespace_vs_standard_boundaries(self):
        # "a-b" is 2 standard tokens (a@0, b@2) but ONE whitespace token
        text = "a-b c d e"
        std = chunk_fixed_tokens(text, token_limit=2, tokenizer="standard")
        ws = chunk_fixed_tokens(text, token_limit=2, tokenizer="whitespace")
        assert std == ["a-b ", "c d ", "e"]
        assert ws == ["a-b c ", "d e"]

    def test_roundtrip_under_both(self):
        text = "x-ray scan, 42 units total; done now"
        for tok in ("standard", "whitespace", "letter", "lowercase"):
            got = chunk_fixed_tokens(text, token_limit=2, tokenizer=tok)
            assert "".join(got) == text, tok

    def test_letter_tokenizer_breaks_on_digits(self):
        # letter tokens of "ab12cd ef": [ab, cd, ef] — chunk of 2 splits
        # before "ef"; first chunk starts at 0
        got = chunk_fixed_tokens("ab12cd ef gh", token_limit=2, tokenizer="letter")
        assert got == ["ab12cd ", "ef gh"]

    def test_unknown_tokenizer_rejected(self):
        with pytest.raises(ValueError, match="not supported"):
            chunk_fixed_tokens("a b", token_limit=2, tokenizer="thai-typo")

    def test_default_is_standard(self):
        text = "one two three four"
        assert chunk_fixed_tokens(text, token_limit=2) == chunk_fixed_tokens(
            text, token_limit=2, tokenizer="standard"
        )


def test_chunk_table_explodes(spark, tiny_corpus):
    out = chunk_table(tiny_corpus, "content", "docID", "fixed_char_length", char_limit=50)
    row = out.groupBy("docID").agg(F.count("*").alias("n"), F.min("chunk_idx").alias("lo")).collect()
    assert all(r["lo"] == 0 for r in row)
    # re-concatenation preserves content (overlap 0): sha invariant transform-level
    joined = (
        out.groupBy("docID")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")).alias("rebuilt"))
        .join(tiny_corpus.select("docID", "content"), "docID")
    )
    assert joined.where(F.col("rebuilt") != F.col("content")).count() == 0
