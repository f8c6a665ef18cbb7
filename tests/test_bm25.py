"""End-to-end BM25 parity: Spark DataFrame engine vs pure-Python Lucene oracle.

Mirrors the reference IT strategy (SURVEY.md §5): rankings must be exact,
scores within DELTA_FOR_SCORE_ASSERTION = 0.001 (TestUtils.java:43).
"""

import pytest

from neural_search_spark.oracle.bm25 import OracleIndex
from neural_search_spark.search.bm25 import BM25Engine, topk

QUERIES = [
    "import ident0",
    "def uniq_000007",
    "class ident1 ident2 ident3",
    "return self",
    "nonexistent_term_zzz",
    "ident0",  # hottest identifier
    "public void ident4",
]


@pytest.fixture(scope="module")
def engine(spark, tiny_corpus):
    return BM25Engine(spark, tiny_corpus).cache()


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return OracleIndex(dict(zip(tiny_corpus_pdf["docID"], tiny_corpus_pdf["content"])))


def test_stats_match(engine, oracle):
    assert engine.stats.n_docs == oracle.n_docs
    assert abs(engine.stats.avgdl - float(oracle.avgdl)) < 1e-3


@pytest.mark.parametrize("q", QUERIES)
def test_match_topk_rank_identical(engine, oracle, q):
    k = 10
    got = [(r["docID"], r["score"]) for r in topk(engine.match(q), k).collect()]
    want = oracle.topk(__import__("neural_search_spark.analysis.tokenizer", fromlist=["tokenize_text"]).tokenize_text(q), k)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-3, q


def test_all_scores_match(engine, oracle):
    q = "import def class"
    got = {r["docID"]: r["score"] for r in engine.match(q).collect()}
    want = oracle.clause_scores(["import", "def", "class"])
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - float(want[d])) <= 1e-3


def test_sha256_invariant(tiny_corpus):
    from neural_search_spark.corpus import assert_sha256_invariant

    assert_sha256_invariant(tiny_corpus)
