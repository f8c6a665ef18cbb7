"""Semantic field type — the mapping/schema transformer analog.

The reference's ``semantic`` field type wraps a raw text field and derives
a sibling ``<field>_semantic_info`` object holding model metadata plus the
embedding (and, when chunking is enabled, per-chunk text+embedding pairs):

- ``mapper/SemanticFieldMapper.java:378-384`` — the derived field name is
  ``<leaf field name> + "_semantic_info"`` unless overridden
  (``constants/SemanticFieldConstants.java:37``);
- ``mappingtransformer/SemanticMappingTransformer.java`` — rewrites the
  index mapping at creation time to add that sub-tree;
- ``constants/SemanticInfoFieldConstants.java:25-27`` — child field names
  ``chunks`` / ``embedding``.

The Spark analog transforms a corpus ``StructType`` the same way
(:func:`derive_semantic_schema`) and populates the derived column at
"ingest" with the deterministic stand-in model
(:func:`apply_semantic_mapping`) — swapping in a real model changes only
the embedding expression, never the schema contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

#: SemanticFieldConstants.DEFAULT_SEMANTIC_INFO_FIELD_NAME_SUFFIX
SEMANTIC_INFO_SUFFIX = "_semantic_info"


def semantic_info_field_name(field: str, override: str | None = None) -> str:
    """``SemanticFieldMapper.java:378-384``: explicit name wins, else
    ``<field>_semantic_info``."""
    return override if override else field + SEMANTIC_INFO_SUFFIX


def semantic_info_type(chunking: bool = False) -> StructType:
    """The derived sub-tree: model metadata + embedding (or chunks)."""
    model = StructType(
        [StructField("id", StringType(), False), StructField("type", StringType(), False)]
    )
    emb = ArrayType(DoubleType())
    children = [StructField("model", model, False)]
    if chunking:
        chunk = StructType(
            [StructField("text", StringType(), False), StructField("embedding", emb, False)]
        )
        children.append(StructField("chunks", ArrayType(chunk), True))
    else:
        children.append(StructField("embedding", emb, True))
    return StructType(children)


def derive_semantic_schema(
    schema: StructType,
    field: str,
    semantic_info_field: str | None = None,
    chunking: bool = False,
) -> StructType:
    """Index-creation-time mapping transform: append the
    ``<field>_semantic_info`` struct column to the corpus schema.

    Validation mirrors the mapper: the raw field must exist, and the
    derived name must not collide with an existing column."""
    names = {f.name for f in schema.fields}
    if field not in names:
        raise ValueError(f"semantic field '{field}' not found in schema")
    info_name = semantic_info_field_name(field, semantic_info_field)
    if info_name in names:
        raise ValueError(f"derived semantic-info field '{info_name}' already exists")
    return StructType(
        list(schema.fields) + [StructField(info_name, semantic_info_type(chunking), True)]
    )


def apply_semantic_mapping(
    df: DataFrame,
    field: str,
    model_id: str,
    id_col: str = "docID",
    semantic_info_field: str | None = None,
    model_type: str = "text_embedding",
) -> DataFrame:
    """Ingest-time population of the derived semantic-info column with the
    stand-in dense embedding (docs with no tokens get a null embedding —
    the mapper also skips empty values). The output schema equals
    :func:`derive_semantic_schema` of the input schema up to nullability
    flags (Spark derives those from the expressions; they are advisory)."""
    from neural_search_spark import stats as _stats
    from neural_search_spark.pipeline.embedding import text_embedding_stub

    _stats.record_event("semantic_field_executions")
    info_name = semantic_info_field_name(field, semantic_info_field)
    # validate via the schema transformer (same error surface)
    derive_semantic_schema(df.schema, field, semantic_info_field)
    emb = text_embedding_stub(df, text_col=field, id_col=id_col).select(
        F.col("docID").alias(id_col), F.col("embedding").alias("_emb")
    )
    out = df.join(emb, id_col, "left").withColumn(
        info_name,
        F.struct(
            F.struct(
                F.lit(model_id).alias("id"), F.lit(model_type).alias("type")
            ).alias("model"),
            F.col("_emb").alias("embedding"),
        ),
    )
    return out.drop("_emb")
