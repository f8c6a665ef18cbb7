"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

All Spark-side implementations live in :mod:`neural_search_spark`; the
SQL strings are generated next to them (:mod:`neural_search_spark.oracle_sql`)
from the same shared constants (token regex, SmallFloat expression, BM25
formula), so both sides move together.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from neural_search_spark import oracle_sql as osql
from neural_search_spark.corpus import corpus_from_documents
from neural_search_spark.search.bm25 import BM25Engine, topk

# fixed query texts (terms from the synthetic documents vocabulary)
Q_MATCH = "table value spark"
Q_TERM = "spark"
Q_FILTERED = "join merge hash"
FILTER_PRED = "repo = 'src7'"


def _engine(spark: SparkSession, sf_dir: str) -> BM25Engine:
    return BM25Engine(spark, corpus_from_documents(spark, sf_dir), text_col="content", id_col="docID")


def _round_score(df: DataFrame) -> DataFrame:
    return df.select("docID", F.round(F.col("score"), 4).alias("score"))


def q_bm25_match_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _round_score(topk(eng.match(Q_MATCH), 10))


def q_bm25_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _round_score(topk(eng.term(Q_TERM), 10))


def q_bm25_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _round_score(topk(eng.match(Q_FILTERED, filter_expr=FILTER_PRED), 10))


def q_doclen_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.doclens.select(
        "docID", F.col("dl").cast("long").alias("dl"), F.col("dlq").cast("long").alias("dlq")
    )


def q_corpus_adapter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus_from_documents(spark, sf_dir)
    return c.select(
        "docID", "repo", "path", F.col("commit").alias("commit_sha"), "lang", "content_sha256"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_match_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_match_topk": q_bm25_match_topk,
        "bm25_term_topk": q_bm25_term_topk,
        "bm25_filtered_topk": q_bm25_filtered_topk,
        "doclen_quantized": q_doclen_quantized,
        "corpus_adapter": q_corpus_adapter,
    }


def oracle_sql() -> dict[str, str]:
    from neural_search_spark.analysis.tokenizer import tokenize_text

    return {
        "bm25_match_topk": osql.bm25_topk_sql(tokenize_text(Q_MATCH), k=10),
        "bm25_term_topk": osql.bm25_topk_sql([Q_TERM], k=10),
        "bm25_filtered_topk": osql.bm25_topk_sql(
            tokenize_text(Q_FILTERED), k=10, doc_filter=FILTER_PRED
        ),
        "doclen_quantized": osql.doclen_quantized_sql(),
        "corpus_adapter": osql.corpus_adapter_sql(),
    }
