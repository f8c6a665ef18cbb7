"""Corpus table source (BASELINE.json input_hint: an Iceberg table of
source-code repositories, columns (repo, path, commit, lang, content)).

``read_corpus_table`` resolves, in order:

1. an Iceberg table name (``catalog.db.table``) when the Iceberg Spark
   runtime is on the classpath — partition pruning on ``repo``/``lang``
   and snapshot isolation come for free (SURVEY.md §4: rely on Catalyst +
   Iceberg for partition pruning);
2. a parquet path (this sandbox has no Iceberg runtime jar, so tests and
   benches exercise this branch — the DataFrame lineage downstream is
   identical either way).

The per-row invariant column ``content_sha256`` is added when missing so
every downstream transform can be checked (input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

REQUIRED_COLUMNS = ("repo", "path", "commit", "lang", "content")

#: canonical corpus schema for self-describing-less formats (jsonl/csv):
#: passing an explicit schema avoids Spark's inference pass — a full extra
#: scan of the input at 100 TB — and pins types across engines.
CORPUS_DDL = "repo string, path string, commit string, lang string, content string"


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:  # noqa: BLE001 — any classloader failure means "no"
        return False


def read_corpus_table(
    spark: SparkSession,
    source: str,
    id_col: str = "docID",
    validate: bool = True,
    semantic_field: str | None = None,
    semantic_model_id: str = "stand-in-dense-v1",
) -> DataFrame:
    """Load the corpus as a DataFrame with a stable ``docID``.

    ``source``: an Iceberg table identifier (contains no ``/``), a
    parquet directory/file path, or a ``.jsonl``/``.json``/``.csv`` path
    (common raw-dump interchange formats; read with the pinned
    :data:`CORPUS_DDL` schema — no inference pass — and, for csv,
    RFC-4180 quoting with multiline records so code content with
    newlines/commas round-trips). ``docID`` is derived deterministically
    as ``xxhash64(repo, path, commit)`` when absent — content-addressed,
    so re-ingesting the same snapshot yields identical ids on any
    cluster.

    ``semantic_field``: when set, the column is treated as the reference's
    ``semantic`` field type — the schema gains the derived
    ``<field>_semantic_info`` struct (model metadata + stand-in embedding;
    ``mapper/SemanticFieldMapper.java:378-384``,
    ``mappingtransformer/SemanticMappingTransformer.java``) populated at
    load, exactly :func:`neural_search_spark.mapping.derive_semantic_schema`
    of the base schema.
    """
    low = source.lower()
    if "/" not in source and _has_iceberg(spark):
        df = spark.read.table(source)
    elif low.endswith((".jsonl", ".json")):
        df = spark.read.schema(CORPUS_DDL).json(source)
    elif low.endswith(".csv"):
        df = spark.read.schema(CORPUS_DDL).csv(
            source, header=True, quote='"', escape='"', multiLine=True
        )
    else:
        df = spark.read.parquet(source)
    if validate:
        missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(f"corpus table missing required columns: {missing}")
    if id_col not in df.columns:
        df = df.withColumn(
            id_col, F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
        )
    if "content_sha256" not in df.columns:
        df = df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    if semantic_field is not None:
        from neural_search_spark.mapping import apply_semantic_mapping

        df = apply_semantic_mapping(df, semantic_field, semantic_model_id, id_col=id_col)
    return df
