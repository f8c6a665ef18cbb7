"""Round-4 operators: MLT, simple_query_string, regexp, aggregation family
under hybrid, entropy quality, OOV rate, exact-substring dedup spans."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neural_search_spark.search.bm25 import (
    BM25Engine,
    more_like_this_scores,
    regexp_query_scores,
)
from neural_search_spark.search.spec import parse_simple_query_string


def _engine(spark, tiny_corpus):
    return BM25Engine(spark, tiny_corpus).cache()


# -- simple_query_string parser ---------------------------------------------


def test_sqs_parser_atoms():
    p = parse_simple_query_string('table value -slow "part filter"')
    assert p["should"] == [
        {"kind": "match", "terms": ["table"]},
        {"kind": "match", "terms": ["value"]},
        {"kind": "phrase", "terms": ["part", "filter"]},
    ]
    assert p["must_not"] == [["slow"]]


def test_sqs_parser_negated_phrase_and_junk():
    p = parse_simple_query_string('-"bad phrase" ok -- !!')
    assert p["must_not"] == [["bad", "phrase"]]
    assert p["should"] == [{"kind": "match", "terms": ["ok"]}]


def test_sqs_parser_never_throws_on_empty():
    assert parse_simple_query_string("") == {"should": [], "must_not": []}
    assert parse_simple_query_string('""  -') == {"should": [], "must_not": []}


# -- more_like_this -----------------------------------------------------------


def test_mlt_excludes_seed_and_is_deterministic(spark, tiny_corpus):
    eng = _engine(spark, tiny_corpus)
    seed = tiny_corpus.select("docID").orderBy("docID").first()["docID"]
    a = more_like_this_scores(eng, seed, max_query_terms=5, min_term_freq=1, min_doc_freq=2)
    rows = a.orderBy(F.col("score").desc(), "docID").limit(10).collect()
    assert rows, "MLT must find similar docs in a topically-uniform corpus"
    assert all(r["docID"] != seed for r in rows)
    b = more_like_this_scores(eng, seed, max_query_terms=5, min_term_freq=1, min_doc_freq=2)
    assert b.orderBy(F.col("score").desc(), "docID").limit(10).collect() == rows


def test_mlt_empty_when_no_qualifying_terms(spark, tiny_corpus):
    eng = _engine(spark, tiny_corpus)
    seed = tiny_corpus.select("docID").orderBy("docID").first()["docID"]
    # min_term_freq far above any real tf → no interesting terms → no hits
    out = more_like_this_scores(eng, seed, min_term_freq=10_000)
    assert out.count() == 0


# -- regexp query -------------------------------------------------------------


def test_regexp_matches_term_dict_expansion(spark, tiny_corpus):
    eng = _engine(spark, tiny_corpus)
    out = regexp_query_scores(eng, "^def$").collect()
    manual = (
        tiny_corpus.where(F.col("content").rlike(r"(^|[^a-z0-9_])def([^a-z0-9_]|$)"))
        .select("docID")
        .collect()
    )
    assert {r["docID"] for r in out} == {r["docID"] for r in manual}
    assert all(r["score"] == 1.0 for r in out)


# -- entropy / OOV / substring spans -----------------------------------------


def test_entropy_stats_values(spark):
    from neural_search_spark.pipeline.textstats import entropy_stats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # uniform single token: entropy 0
            (2, "a b c d a b c d e f g h"),  # mixed
            (3, ""),  # no tokens: absent
        ],
        "docID long, content string",
    )
    rows = {r["docID"]: r for r in entropy_stats(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["entropy"] == 0.0 and rows[1]["keep"] is False
    r2 = rows[2]
    # 8 distinct over 12 tokens: H = log2(12) - (4*2*log2(2))/12
    expected = math.log2(12) - (8 * 1.0) / 12
    assert abs(r2["entropy"] - round(expected, 4)) < 1e-9
    assert r2["n_tokens"] == 12 and r2["distinct_terms"] == 8
    assert r2["keep"] is True


def test_oov_rates_against_vocab(spark):
    from neural_search_spark.pipeline.textstats import oov_rates

    docs = spark.createDataFrame(
        [(1, "known known strange"), (2, "known"), (3, "alien words only")],
        "docID long, content string",
    )
    vocab = spark.createDataFrame([("known",), ("words",)], "term string")
    rows = {r["docID"]: r for r in oov_rates(docs, vocab).collect()}
    assert rows[1]["n_oov"] == 1 and rows[1]["oov_rate"] == round(1 / 3, 4)
    assert rows[2]["n_oov"] == 0 and rows[2]["oov_rate"] == 0.0
    assert rows[3]["n_oov"] == 2 and rows[3]["oov_rate"] == round(2 / 3, 4)


def test_substring_dup_stats_flags_shared_spans(spark):
    from neural_search_spark.pipeline.dedup import substring_dup_stats

    shared = "one two three four"  # the 4-gram both docs contain
    df = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma"),
            (2, "prefix words " + shared),
            (3, "totally unrelated text body here now"),
            (4, "tiny"),  # shorter than n → zero grams
        ],
        "docID long, content string",
    )
    rows = {r["docID"]: r for r in substring_dup_stats(df, n=4).collect()}
    assert rows[1]["n_dup_grams"] == 1 and rows[2]["n_dup_grams"] == 1
    assert rows[3]["n_dup_grams"] == 0 and rows[3]["dup_fraction"] == 0.0
    assert rows[4]["n_grams"] == 0 and rows[4]["dup_fraction"] == 0.0
    assert rows[1]["dup_fraction"] == round(1 / rows[1]["n_grams"], 4)


# -- aggregation family shapes ------------------------------------------------


def test_top_hits_respects_per_bucket_cut(spark, tiny_corpus):
    from pyspark.sql import Window

    eng = _engine(spark, tiny_corpus)
    scored = eng.match("def class import")
    hits = scored.join(tiny_corpus.select("docID", "lang"), "docID")
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col("docID").asc())
    out = hits.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 2)
    per = out.groupBy("lang").count().collect()
    assert per and all(r["count"] <= 2 for r in per)


def test_significant_terms_jlh_positive_only(spark, tiny_corpus):
    """JLH buckets must all be over-represented (fgPct > bgPct)."""
    from pyspark.sql import Window

    eng = _engine(spark, tiny_corpus)
    hits = eng.match("def class import").join(
        tiny_corpus.select("docID", "lang"), "docID"
    )
    fg = (
        hits.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("fgc"))
        .withColumn("fgt", F.sum("fgc").over(Window.partitionBy()))
    )
    bg = tiny_corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("bgc"))
    n = tiny_corpus.count()
    j = fg.join(bg, "lang")
    fgp = F.col("fgc") / F.col("fgt")
    bgp = F.col("bgc") / F.lit(float(n))
    sig = j.where(fgp > bgp).select(
        "lang", ((fgp - bgp) * (fgp / bgp)).alias("score")
    )
    assert all(r["score"] > 0 for r in sig.collect())
