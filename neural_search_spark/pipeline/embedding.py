"""text_embedding ingest-processor plumbing with a deterministic stand-in
model.

The reference's ``text_embedding`` processor batches text through an
external dense-embedding model (``processor/TextEmbeddingProcessor.java:40``,
batching in ``processor/InferenceProcessor.java:199-229``). No model runs
in this sandbox, so the MODEL is a clearly-marked deterministic stand-in
while the Spark plumbing is real and tested: schema (``array<float>``
column appended to the doc), fully relational computation (no per-row
Python), L2 normalization, and the same field-map shape (text column in,
embedding column out).

Stand-in model: ``dim(t) = len(t) % n_dims`` bag-of-dims over the
analyzed tokens, L2-normalized — chosen because BOTH Spark and the DuckDB
oracle can compute it exactly (token length is engine-agnostic, unlike
hash functions), so the plumbing is oracle-checked end to end. Swapping
in a real model means replacing :func:`token_dims` with a
``predict_batch_udf``-style Arrow UDF; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neural_search_spark.analysis.tokenizer import tokenize_udf

N_DIMS = 8


def text_embedding_stub(
    corpus: DataFrame,
    text_col: str = "content",
    id_col: str = "docID",
    n_dims: int = N_DIMS,
) -> DataFrame:
    """(docID, embedding array<double>) — the processor's output shape."""
    from neural_search_spark import stats as _stats

    _stats.record_event("text_embedding_executions")
    toks = corpus.select(
        F.col(id_col).alias("docID"),
        F.explode(tokenize_udf(F.col(text_col))).alias("term"),
    )
    counts = toks.groupBy(
        "docID", (F.length("term") % n_dims).cast("int").alias("dim")
    ).agg(F.count("*").cast("double").alias("v"))
    byid = counts.groupBy("docID").agg(
        F.map_from_arrays(F.collect_list("dim"), F.collect_list("v")).alias("m")
    )
    dims = F.array(*[F.coalesce(F.col("m").getItem(i), F.lit(0.0)) for i in range(n_dims)])
    norm = F.sqrt(
        F.aggregate(dims, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    emb = F.transform(dims, lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0)))
    return byid.select("docID", emb.alias("embedding"))


def embedding_long_form(embedded: DataFrame) -> DataFrame:
    """(docID, dim, value) exploded form for oracle comparison."""
    return embedded.select(
        "docID", F.posexplode("embedding").alias("dim", "value")
    ).select("docID", F.col("dim").cast("int").alias("dim"), F.round("value", 6).alias("value"))
