"""Similarity search over an embedding column (array<float>).

Two paths:

- :func:`cosine_topk` — brute-force exact cosine top-k. The dot product
  is an unrolled, left-associated column expression (params.dot_sql), so
  it runs inside whole-stage codegen AND sums in the same order as the
  DuckDB oracle → bit-identical doubles. The query vector is a one-row
  broadcast join; the scan stays a single pass with no shuffle beyond
  the final top-k (TakeOrderedAndProject).
- :func:`ann_lsh_topk` — the scale path: random-hyperplane sign buckets
  (params.HYPERPLANES) prune candidates to the query's bucket before the
  exact cosine. At 100 TB the bucket column is precomputed at ingest and
  the table is partitioned by it, turning a full scan into one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neural_search_spark.pipeline import params as P


def _dot(a, b) -> "F.Column":
    """Sequential left-fold dot product (zip_with + aggregate). IEEE-
    identical to the oracle's unrolled left-associated sum: the 0.0 init
    is exact, every subsequent add happens in the same order. Compact
    enough for whole-stage codegen (the unrolled 64-term expression form
    blows the JVM 64KB method limit and falls back to interpreted)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def plane_dot(vec, plane: list[float]) -> "F.Column":
    hp = F.array(*[F.lit(float(v)) for v in plane])
    return _dot(vec, hp)


def bucket_col(vec) -> "F.Column":
    """Hyperplane sign bucket — same bits as params.bucket_sql."""
    acc = F.lit(0)
    for j in range(P.N_HYPERPLANES):
        acc = acc + F.when(plane_dot(vec, P.HYPERPLANES[j]) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return acc


def _cosine(a: str, b: str) -> "F.Column":
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = P.ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the vector with id `query_id` (excluded).

    Returns (vec_id, score) ordered score desc, vec_id asc.
    """
    q = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    base = emb.where(F.col(id_col) != query_id).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    return (
        base.crossJoin(F.broadcast(q))
        .select("vec_id", P.round4(_cosine("v", "qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_buckets(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, bucket): hyperplane sign-bit bucket per vector."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        bucket_col(vec_col).alias("bucket"),
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_id: int,
    k: int = P.ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the query's LSH bucket.

    Deterministic contract (oracle-checkable): candidates = vectors whose
    bucket equals the query's bucket; rank by cosine desc, vec_id asc.
    """
    b = lsh_buckets(emb, id_col, vec_col)
    q = b.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        b.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .where(F.col("bucket") == F.col("qbucket"))
        .select("vec_id", P.round4(_cosine("v", "qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )
