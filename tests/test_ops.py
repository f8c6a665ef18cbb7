"""Secondary operator tests: rerank, sort, search_after, paginate, collapse."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.search.ops import (
    collapse_best_per_field,
    paginate,
    rerank_by_field,
    search_after,
    sort_by_fields,
)


@pytest.fixture(scope="module")
def results(spark):
    rows = [(1, 0.9), (2, 0.8), (3, 0.8), (4, 0.5), (5, 0.1)]
    return spark.createDataFrame(rows, "docID long, score double")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "go", 3.0, "r1"),
        (2, "py", 9.0, "r1"),
        (3, "py", 1.0, "r2"),
        (4, "go", 7.0, "r2"),
        (5, "c", 5.0, "r3"),
    ]
    return spark.createDataFrame(rows, "docID long, lang string, rating double, repo string")


def test_rerank_by_field(results, docs):
    got = rerank_by_field(results, docs, "rating").collect()
    assert [r["docID"] for r in got] == [2, 4, 5, 1, 3]
    assert [r["score"] for r in got] == [9.0, 7.0, 5.0, 3.0, 1.0]


def test_rerank_keeps_previous(results, docs):
    got = rerank_by_field(results, docs, "rating", keep_previous_score=True).collect()
    assert got[0]["previous_score"] == 0.8  # docID 2


def test_sort_by_fields_with_tiebreak(results, docs):
    got = sort_by_fields(results, docs, [("lang", True)], track_scores=True).collect()
    assert [r["docID"] for r in got] == [5, 1, 4, 2, 3]
    assert got[0]["score"] == 0.1


def test_search_after(results, docs):
    s = sort_by_fields(results, docs, [("lang", True)])
    got = search_after(s, [("lang", True)], ["go", 1]).collect()
    assert [r["docID"] for r in got] == [4, 2, 3]


def test_search_after_desc(results, docs):
    s = sort_by_fields(results, docs, [("rating", False)])
    got = search_after(s, [("rating", False)], [7.0, 4]).collect()
    assert [r["docID"] for r in got] == [5, 1, 3]


def test_paginate(results):
    got = paginate(results, 2, 2, pagination_depth=10).collect()
    assert [r["docID"] for r in got] == [3, 4]


def test_paginate_requires_depth():
    with pytest.raises(ValueError):
        paginate(None, 5, 10)


def test_paginate_window_within_depth(results):
    with pytest.raises(ValueError):
        paginate(results, 2, 4, pagination_depth=5)


def test_collapse(results, docs):
    got = collapse_best_per_field(results, docs, "repo").orderBy(F.desc("score")).collect()
    assert {(r["docID"], r["repo"]) for r in got} == {(1, "r1"), (3, "r2"), (5, "r3")}


def test_nested_inner_hits(spark):
    from neural_search_spark.search.ops import nested_inner_hits

    chunks = spark.createDataFrame(
        [
            # doc 1: best chunk is idx 1 (2 term hits)
            (1, 0, "alpha beta"),
            (1, 1, "spark join spark"),  # spark counts twice? no: occurrences of terms
            (2, 0, "join"),
            (3, 0, "nothing here"),
            # doc 4: tie between chunk 0 and 1 -> lowest idx wins
            (4, 0, "spark"),
            (4, 1, "join"),
        ],
        "docID long, chunk_idx int, chunk string",
    )
    out = nested_inner_hits(chunks, ["spark", "join"], k=10).collect()
    got = {(r["docID"]): (r["score"], r["best_chunk_idx"]) for r in out}
    # occurrence count: doc1 chunk1 has spark,join,spark = 3 matches
    assert got[1] == (3, 1)
    assert got[2] == (1, 0)
    assert got[4] == (1, 0)  # tie -> lowest chunk_idx
    assert 3 not in got  # zero-score parents dropped
    # ordering: score desc, docID asc
    assert [r["docID"] for r in out] == [1, 2, 4]


def test_highlight_literal_delimiter_with_regex_metachars(spark):
    """fragment_delim is a LITERAL (oracle uses string_split); regex
    metacharacters like '.' or '|' must not change the split."""
    from neural_search_spark.search.ops import highlight_best_fragment

    corpus = spark.createDataFrame(
        [(1, "alpha beta.gamma spark.delta spark spark")],
        "docID long, content string",
    )
    res = spark.createDataFrame([(1, 1.0)], "docID long, score double")
    got = highlight_best_fragment(res, corpus, ["spark"], fragment_delim=".").collect()
    assert len(got) == 1
    # literal '.' split -> ['alpha beta', 'gamma spark', 'delta spark spark']
    assert got[0]["fragment"] == "delta spark spark"
    assert got[0]["frag_idx"] == 2
    assert got[0]["hits"] == 2
