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
from neural_search_spark.search.hybrid import hybrid_raw_sum, hybrid_search

# fixed query texts (terms from the synthetic documents vocabulary)
Q_MATCH = "table value spark"
Q_TERM = "spark"
Q_FILTERED = "join merge hash"
FILTER_PRED = "repo = 'src7'"
HYBRID_CLAUSES = ("table value spark", "join merge hash window")
HYBRID_CLAUSES_3 = ("table value spark", "join merge hash window", "customer stream")
HYBRID_DEPTH = 50


_ENGINES: dict[tuple[int, str], BM25Engine] = {}
_INDEXES: dict[tuple[int, str], "object"] = {}


def _index(spark: SparkSession, sf_dir: str):
    """Compressed block-max index per (session, corpus), built once under
    /tmp and reused — the persisted-index query path."""
    import hashlib
    import os

    from neural_search_spark.index.builder import build_index
    from neural_search_spark.search.wand import BlockMaxIndex

    key = (id(spark), sf_dir)
    if key not in _INDEXES:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        d = os.path.join("/tmp", f"nss_index_{tag}")
        build_index(spark, corpus_from_documents(spark, sf_dir), d, n_shards=8)
        _INDEXES[key] = BlockMaxIndex(spark, d).cache()
    return _INDEXES[key]


def _engine(spark: SparkSession, sf_dir: str) -> BM25Engine:
    """One cached engine per (session, corpus): the index is built once and
    queried many times — the reference's index/query split."""
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        eng = BM25Engine(
            spark, corpus_from_documents(spark, sf_dir), text_col="content", id_col="docID"
        ).cache()
        _ENGINES[key] = eng
    return _ENGINES[key]


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


def q_bm25_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same match query through the compressed block-max index (WAND path);
    must be rank- and score-identical to the DataFrame path, so it shares
    bm25_match_topk's oracle."""
    return _round_score(_index(spark, sf_dir).match_topk(Q_MATCH, k=10))


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


def _hybrid(spark, sf_dir, norm, comb, weights=None, clauses=HYBRID_CLAUSES, k=10):
    eng = _engine(spark, sf_dir)
    clause_dfs = [eng.match(t) for t in clauses]
    out = hybrid_search(
        clause_dfs, norm, comb, weights=weights, k=k, depth=HYBRID_DEPTH
    )
    return _round_score(out)


def q_hybrid_minmax_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid(spark, sf_dir, "min_max", "arithmetic_mean")


def q_hybrid_minmax_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid(spark, sf_dir, "min_max", "arithmetic_mean", weights=[0.3, 0.7])


def q_hybrid_l2_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid(spark, sf_dir, "l2", "harmonic_mean")


def q_hybrid_zscore_geometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid(spark, sf_dir, "z_score", "geometric_mean")


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid(spark, sf_dir, "rrf", "rrf", clauses=HYBRID_CLAUSES_3)


def q_hybrid_agg_by_repo(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    scored = hybrid_raw_sum([eng.match(t) for t in HYBRID_CLAUSES])
    return (
        scored.join(eng.corpus.select(F.col("docID"), "repo"), "docID")
        .groupBy("repo")
        .agg(F.count("*").alias("doc_count"), F.round(F.sum("score"), 4).alias("sum_score"))
        .orderBy("repo")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid BM25 two-clause
    min_max + arithmetic_mean (the reference's default pipeline)."""
    return q_hybrid_minmax_arith(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_match_topk": q_bm25_match_topk,
        "bm25_term_topk": q_bm25_term_topk,
        "bm25_filtered_topk": q_bm25_filtered_topk,
        "bm25_wand_topk": q_bm25_wand_topk,
        "doclen_quantized": q_doclen_quantized,
        "corpus_adapter": q_corpus_adapter,
        "hybrid_minmax_arith": q_hybrid_minmax_arith,
        "hybrid_minmax_weighted": q_hybrid_minmax_weighted,
        "hybrid_l2_harmonic": q_hybrid_l2_harmonic,
        "hybrid_zscore_geometric": q_hybrid_zscore_geometric,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_agg_by_repo": q_hybrid_agg_by_repo,
    }


def oracle_sql() -> dict[str, str]:
    from neural_search_spark.analysis.tokenizer import tokenize_text

    tt = tokenize_text
    h2 = [tt(c) for c in HYBRID_CLAUSES]
    h3 = [tt(c) for c in HYBRID_CLAUSES_3]
    return {
        "bm25_match_topk": osql.bm25_topk_sql(tt(Q_MATCH), k=10),
        "bm25_term_topk": osql.bm25_topk_sql([Q_TERM], k=10),
        "bm25_filtered_topk": osql.bm25_topk_sql(
            tt(Q_FILTERED), k=10, doc_filter=FILTER_PRED
        ),
        "bm25_wand_topk": osql.bm25_topk_sql(tt(Q_MATCH), k=10),
        "doclen_quantized": osql.doclen_quantized_sql(),
        "corpus_adapter": osql.corpus_adapter_sql(),
        "hybrid_minmax_arith": osql.hybrid_topk_sql(h2, "min_max", "arithmetic_mean", depth=HYBRID_DEPTH),
        "hybrid_minmax_weighted": osql.hybrid_topk_sql(
            h2, "min_max", "arithmetic_mean", weights=[0.3, 0.7], depth=HYBRID_DEPTH
        ),
        "hybrid_l2_harmonic": osql.hybrid_topk_sql(h2, "l2", "harmonic_mean", depth=HYBRID_DEPTH),
        "hybrid_zscore_geometric": osql.hybrid_topk_sql(h2, "z_score", "geometric_mean", depth=HYBRID_DEPTH),
        "hybrid_rrf": osql.hybrid_topk_sql(h3, "rrf", "rrf", depth=HYBRID_DEPTH),
        "hybrid_agg_by_repo": osql.hybrid_agg_sql(h2, group_col="repo"),
    }
