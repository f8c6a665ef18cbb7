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


def test_collapse_sorted_winner_by_sort_not_score(results, docs):
    """Sorted collapse: group winner = first in the SORT order (rating
    desc), not the best score; final order = the same sort."""
    from neural_search_spark.search.ops import collapse_sorted

    got = collapse_sorted(
        results, docs, "repo", [("rating", False)], track_scores=True
    ).collect()
    # r1: doc 2 (rating 9.0) beats doc 1 (score 0.9 but rating 3.0);
    # r2: doc 4 (rating 7.0) beats doc 3; r3: doc 5
    assert [(r["docID"], r["repo"], r["rating"]) for r in got] == [
        (2, "r1", 9.0), (4, "r2", 7.0), (5, "r3", 5.0),
    ]
    assert [r["score"] for r in got] == [0.8, 0.5, 0.1]
    # without track_scores the score column is dropped
    cols = collapse_sorted(results, docs, "repo", [("rating", False)]).columns
    assert cols == ["docID", "repo", "rating"]


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


def test_collapse_per_clause_differs_from_post_only(spark):
    """Per-sub-query collapse retains a different candidate set than
    post-combination-only collapse (HybridCollapsingTopDocsCollector vs
    coordinator-only): a clause's #2 doc in a group never reaches
    normalization."""
    from neural_search_spark.search.hybrid import hybrid_search
    from neural_search_spark.search.ops import collapse_clause

    docs = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g2")], "docID long, grp string"
    )
    a = spark.createDataFrame([(1, 10.0), (2, 9.0), (3, 1.0)], "docID long, score double")
    b = spark.createDataFrame([(2, 10.0), (3, 5.0)], "docID long, score double")

    post_only = hybrid_search([a, b], "min_max", "arithmetic_mean", k=10, depth=10)
    post_best = collapse_best_per_field(post_only, docs, "grp").collect()
    post_g1 = {r["grp"]: r["docID"] for r in post_best}["g1"]

    pc = [collapse_clause(df, docs, "grp", depth=2) for df in (a, b)]
    per_clause = hybrid_search(pc, "min_max", "arithmetic_mean", k=10, depth=10)
    pc_best = collapse_best_per_field(per_clause, docs, "grp").collect()
    pc_g1 = {r["grp"]: r["docID"] for r in pc_best}["g1"]

    assert post_g1 == 2  # doc2 wins g1 when both clauses count it
    assert pc_g1 == 1  # per-clause collapse drops doc2 from clause A -> doc1 wins


def test_collapse_clause_keeps_best_per_group(spark):
    from neural_search_spark.search.ops import collapse_clause

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], "docID long, grp string"
    )
    scored = spark.createDataFrame(
        [(1, 2.0), (2, 5.0), (3, 1.0), (4, 1.0)], "docID long, score double"
    )
    got = {(r["docID"], r["score"]) for r in collapse_clause(scored, docs, "grp").collect()}
    assert got == {(2, 5.0), (3, 1.0)}  # ties break docID asc
    cut = collapse_clause(scored, docs, "grp", depth=1).collect()
    assert [(r["docID"], r["score"]) for r in cut] == [(2, 5.0)]


def test_hybrid_sort_by_field_tracks_clause_scores(spark, docs):
    from neural_search_spark.search.ops import hybrid_sort_by_field

    a = spark.createDataFrame([(1, 3.0), (2, 1.0)], "docID long, score double")
    b = spark.createDataFrame([(2, 7.0), (5, 2.0)], "docID long, score double")
    got = hybrid_sort_by_field([a, b], docs, [("lang", True)], k=10).collect()
    # order: lang asc (c, go, py), docID asc
    assert [r["docID"] for r in got] == [5, 1, 2]
    row2 = next(r for r in got if r["docID"] == 2)
    assert (row2["clause_0"], row2["clause_1"]) == (1.0, 7.0)
    row5 = next(r for r in got if r["docID"] == 5)
    assert (row5["clause_0"], row5["clause_1"]) == (0.0, 2.0)  # zero-filled
    no_scores = hybrid_sort_by_field([a, b], docs, [("lang", True)], k=10, track_scores=False)
    assert no_scores.columns == ["docID", "lang"]


def test_describe_strings_match_reference_format():
    from neural_search_spark.search.hybrid import (
        describe_combination,
        describe_normalization,
    )

    assert describe_normalization("min_max") == "min_max normalization of:"
    assert (
        describe_normalization("min_max", lower_bounds=[("apply", 1.0), ("clip", 0.5)])
        == "min_max, lower bounds [(apply, 1.0), (clip, 0.5)] normalization of:"
    )
    assert describe_combination("arithmetic_mean") == "arithmetic_mean combination of:"
    assert (
        describe_combination("rrf", [0.4, 0.6])
        == "rrf, weights [0.4, 0.6] combination of:"
    )


def test_with_max_score(spark, results):
    from neural_search_spark.search.ops import with_max_score

    got = with_max_score(results).collect()
    assert all(r["max_score"] == 0.9 for r in got)
    empty = spark.createDataFrame([], "docID long, score double")
    assert with_max_score(empty).collect() == []


def test_rescore_window_combines_and_bounds(spark):
    from neural_search_spark.search.ops import rescore_window

    primary = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0), (4, 7.0)], "docID long, score double"
    )
    secondary = spark.createDataFrame(
        [(3, 100.0), (4, 50.0), (9, 999.0)], "docID long, score double"
    )
    # window=3 cuts doc 4 before rescoring; doc 9 is outside the window
    out = rescore_window(primary, secondary, window_size=3, query_weight=0.5,
                         rescore_query_weight=2.0, k=3).collect()
    got = [(r["docID"], r["score"]) for r in out]
    # doc3: 0.5*8 + 2*100 = 204; doc1: 0.5*10 = 5; doc2: 0.5*9 = 4.5
    assert got == [(3, 204.0), (1, 5.0), (2, 4.5)]
    import pytest

    with pytest.raises(ValueError, match="window_size"):
        rescore_window(primary, secondary, window_size=2, k=5)
