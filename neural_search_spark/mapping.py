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

from dataclasses import dataclass

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

#: ``SemanticFieldMapper.TypeParser.SUPPORTED_RAW_FIELD_TYPE``
#: (``mapper/SemanticFieldMapper.java:263-270``): the delegate mappers the
#: semantic field may wrap for its RAW side. The derived semantic-info
#: sub-tree is identical for all of them; the delegate type changes only
#: how direct (non-neural) queries against the raw field behave — see
#: :func:`semantic_raw_query`.
SEMANTIC_RAW_FIELD_TYPES = (
    "text",
    "keyword",
    "match_only_text",
    "wildcard",
    "token_count",
    "binary",
)


@dataclass(frozen=True)
class TargetFieldConfig:
    """Query-time view of a field's mapping — the analog of
    ``query/dto/NeuralQueryTargetFieldConfig.java`` (resolved by
    ``SemanticMappingUtils.getIndexToTargetFieldConfigMapFromIndexMetadata``
    from index metadata; here from the corpus schema + the semantic-info
    column's field METADATA, Spark's schema-attached metadata being the
    natural index-metadata analog)."""

    is_semantic_field: bool
    is_unmapped_field: bool
    search_model_id: str | None = None
    embedding_field_type: str | None = None  # "knn_vector" | "rank_features"
    embedding_field_path: str | None = None
    chunks_path: str | None = None
    chunking_enabled: bool = False
    semantic_field_search_analyzer: str | None = None
    #: the delegate mapper's type (SemanticParameters.rawFieldType;
    #: default text — SemanticFieldMapper.java TypeParser.parse)
    raw_field_type: str = "text"


def target_field_config(
    schema: StructType, field: str, semantic_info_field: str | None = None
) -> TargetFieldConfig:
    """Resolve the :class:`TargetFieldConfig` for ``field`` from a corpus
    schema: unmapped → flagged; mapped but no derived
    ``<field>_semantic_info`` sibling → not semantic (the caller must then
    supply explicit model/embedding arguments, mirroring
    ``NeuralQueryValidationUtil.validateTargetFieldConfig``); semantic →
    embedding path + chunking mode read from the derived sub-tree, model
    id from the column metadata stamped at ingest."""
    names = {f.name: f for f in schema.fields}
    if field not in names:
        return TargetFieldConfig(is_semantic_field=False, is_unmapped_field=True)
    info_name = semantic_info_field_name(field, semantic_info_field)
    if info_name not in names:
        return TargetFieldConfig(is_semantic_field=False, is_unmapped_field=False)
    from pyspark.sql.types import MapType

    info = names[info_name]
    meta = info.metadata or {}
    child_fields = (
        {f.name: f for f in info.dataType.fields}
        if isinstance(info.dataType, StructType)
        else {}
    )
    chunking = "chunks" in child_fields
    if chunking:
        emb_type = child_fields["chunks"].dataType.elementType["embedding"].dataType
    else:
        emb_type = child_fields["embedding"].dataType if "embedding" in child_fields else None
    sparse = isinstance(emb_type, MapType)
    return TargetFieldConfig(
        is_semantic_field=True,
        is_unmapped_field=False,
        search_model_id=meta.get("model_id"),
        embedding_field_type="rank_features" if sparse else "knn_vector",
        embedding_field_path=(
            f"{info_name}.chunks.embedding" if chunking else f"{info_name}.embedding"
        ),
        chunks_path=f"{info_name}.chunks" if chunking else None,
        chunking_enabled=chunking,
        semantic_field_search_analyzer=meta.get("search_analyzer"),
        raw_field_type=meta.get("raw_field_type", "text"),
    )


def semantic_info_field_name(field: str, override: str | None = None) -> str:
    """``SemanticFieldMapper.java:378-384``: explicit name wins, else
    ``<field>_semantic_info``."""
    return override if override else field + SEMANTIC_INFO_SUFFIX


def semantic_info_type(chunking: bool = False, model_kind: str = "dense") -> StructType:
    """The derived sub-tree: model metadata + embedding (or chunks).
    ``model_kind="sparse"`` stores the rank_features analog — a
    ``map<string,float>`` feature vector — under the same ``embedding``
    child name (the reference types the child ``knn_vector`` or
    ``rank_features`` by the model; the name is shared)."""
    from pyspark.sql.types import FloatType, MapType

    model = StructType(
        [StructField("id", StringType(), False), StructField("type", StringType(), False)]
    )
    if model_kind == "dense":
        emb = ArrayType(DoubleType())
    elif model_kind == "sparse":
        emb = MapType(StringType(), FloatType())
    else:
        raise ValueError(f"model_kind must be dense or sparse, got {model_kind!r}")
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
    model_kind: str = "dense",
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
        list(schema.fields)
        + [StructField(info_name, semantic_info_type(chunking, model_kind), True)]
    )


def apply_semantic_mapping(
    df: DataFrame,
    field: str,
    model_id: str,
    id_col: str = "docID",
    semantic_info_field: str | None = None,
    model_type: str = "text_embedding",
    chunking: bool = False,
    chunk_algorithm: str = "delimiter",
    search_analyzer: str | None = None,
    raw_field_type: str = "text",
    **chunk_params,
) -> DataFrame:
    """Ingest-time population of the derived semantic-info column with the
    stand-in embedding (docs with no tokens get a null embedding — the
    mapper also skips empty values). ``model_type`` picks the embedding
    field type the way the reference's model config does
    (``mappingtransformer/SemanticInfoConfigBuilder.java`` — dense model →
    ``knn_vector`` child, sparse model → ``rank_features``):
    ``text_embedding`` stores the dense ``array<double>`` stand-in,
    ``sparse_encoding`` stores the ``map<string,float>`` feature vector
    (weight = term frequency, exact under FeatureField quantization).
    With ``chunking=True`` the field is chunked first
    (``SemanticFieldProcessor`` chains the chunker when the mapping
    enables it) and the derived column holds the per-chunk
    ``(text, embedding)`` array in chunk order; token-less chunks are
    skipped, like empty values at the doc level. The output schema equals
    :func:`derive_semantic_schema` of the input schema up to nullability
    flags (Spark derives those from the expressions; they are advisory),
    and the derived column carries ``{model_id, model_type}`` (plus
    ``search_analyzer`` when the mapping sets one —
    ``SemanticParameters.getSemanticFieldSearchAnalyzer``) in its field
    METADATA — the index-metadata analog
    :func:`target_field_config` resolves at query time."""
    from neural_search_spark import stats as _stats

    _stats.record_event("semantic_field_executions")
    if raw_field_type not in SEMANTIC_RAW_FIELD_TYPES:
        # SemanticFieldMapper.TypeParser.validateRawFieldType
        raise ValueError(
            f"raw_field_type [{raw_field_type}] is not supported; expected one "
            f"of {list(SEMANTIC_RAW_FIELD_TYPES)}"
        )
    sparse = model_type == "sparse_encoding"
    info_name = semantic_info_field_name(field, semantic_info_field)
    # validate via the schema transformer (same error surface)
    derive_semantic_schema(
        df.schema,
        field,
        semantic_info_field,
        chunking=chunking,
        model_kind="sparse" if sparse else "dense",
    )
    meta = {"model_id": model_id, "model_type": model_type}
    if search_analyzer is not None:
        meta["search_analyzer"] = search_analyzer
    if raw_field_type != "text":
        meta["raw_field_type"] = raw_field_type

    def _embed_col(text_col_expr) -> "F.Column":
        """Embedding column for the chosen model kind, NULL for token-less
        values (empty values are skipped by the mapper). Inline — the
        embedding is a pure per-row function, so attaching it needs no
        keyed join: the old (key, embedding) table + docID join cost two
        exchanges and a corpus-content shuffle per mapping application.
        Values are bit-identical to text_embedding_stub /
        sparse_features_from_tf (same arithmetic, same order — see
        embedding_col_udf / sparse_features_col_udf)."""
        from neural_search_spark.pipeline.embedding import (
            embedding_col_udf,
            sparse_features_col_udf,
        )

        if not sparse:
            _stats.record_event("text_embedding_executions")
            return embedding_col_udf()(text_col_expr)
        _stats.record_event("sparse_encoding_executions")
        return sparse_features_col_udf()(text_col_expr)
    if chunking:
        from neural_search_spark.analysis.chunking import chunk_table

        _stats.record_event("semantic_field_chunking_executions")
        chunks = chunk_table(
            df, field, id_col, chunk_algorithm, **chunk_params
        ).select(
            F.col("docID").cast("long").alias("_pid"),
            F.col("chunk_idx"),
            F.col("chunk"),
        )
        # surrogate chunk key for the one-id-column stub; every chunker
        # caps chunk counts far below 100000
        # inline per-chunk embedding: no surrogate key, no chunk join
        chunked = chunks.select(
            "_pid", "chunk_idx", "chunk", _embed_col(F.col("chunk")).alias("embedding")
        ).where(F.col("embedding").isNotNull())  # drop token-less chunks
        per_doc = (
            chunked
            .groupBy("_pid")
            .agg(
                # explicit chunk_idx comparator: the struct holds a MAP on
                # the sparse path, which default struct ordering rejects
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk", "embedding")),
                    lambda a, b: F.when(a["chunk_idx"] < b["chunk_idx"], -1)
                    .when(a["chunk_idx"] > b["chunk_idx"], 1)
                    .otherwise(0),
                ).alias("_raw")
            )
            .select(
                "_pid",
                F.transform(
                    "_raw",
                    lambda c: F.struct(
                        c["chunk"].alias("text"), c["embedding"].alias("embedding")
                    ),
                ).alias("_chunks"),
            )
        )
        out = df.join(
            per_doc, F.col(id_col).cast("long") == F.col("_pid"), "left"
        ).withColumn(
            info_name,
            F.struct(
                F.struct(
                    F.lit(model_id).alias("id"), F.lit(model_type).alias("type")
                ).alias("model"),
                F.col("_chunks").alias("chunks"),
            ).alias(info_name, metadata=meta),
        )
        return out.drop("_pid", "_chunks")
    out = df.withColumn("_emb", _embed_col(F.col(field))).withColumn(
        info_name,
        F.struct(
            F.struct(
                F.lit(model_id).alias("id"), F.lit(model_type).alias("type")
            ).alias("model"),
            F.col("_emb").alias("embedding"),
        ).alias(info_name, metadata=meta),
    )
    return out.drop("_emb")


def semantic_raw_query(engine, raw_field_type: str, query) -> DataFrame:
    """Query the semantic field's RAW side per its delegate mapper type —
    the Spark analog of ``SemanticFieldMapper`` delegating non-neural
    queries to the wrapped mapper (``SemanticFieldMapper.java:263-270``
    delegate set; parsing of the raw value is the delegate's). Returns
    ``(docID, score)``.

    - ``text`` — the engine's analyzed BM25 ``match`` (the default
      delegate; the engine's whole §2.2 lexical surface applies).
    - ``match_only_text`` — freqs and norms are not indexed, so every
      matched term contributes a CONSTANT 1.0 (the repo's documented
      constant-score-rewrite treatment inside bool); score = count of
      distinct query terms present. See
      :func:`neural_search_spark.search.bm25.match_only_text_scores`.
    - ``token_count`` — the indexed value is the ANALYZED token count
      (TokenCountFieldMapper); ``query`` is a numeric range dict
      (``{"gte": a, "lte": b}``), matches score 1.0. The count reuses the
      engine's doc-length artifact — at 100 TB this is the same persisted
      per-doc statistic, no extra scan.
    - ``keyword`` — exact whole-value equality, constant 1.0.
    - ``wildcard`` — whole-value ``*``/``?`` glob, constant 1.0.
    - ``binary`` — stored, not searchable (BinaryFieldMapper): raises.
    """
    from pyspark.sql import functions as F

    if raw_field_type not in SEMANTIC_RAW_FIELD_TYPES:
        raise ValueError(f"raw_field_type [{raw_field_type}] is not supported")
    if raw_field_type == "text":
        return engine.match(query)
    if raw_field_type == "match_only_text":
        from neural_search_spark.search.bm25 import match_only_text_scores

        return match_only_text_scores(engine, query)
    if raw_field_type == "token_count":
        cond = F.lit(True)
        if "gte" in query:
            cond = cond & (F.col("dl") >= int(query["gte"]))
        if "lte" in query:
            cond = cond & (F.col("dl") <= int(query["lte"]))
        return engine.doclens.where(cond).select(
            "docID", F.lit(1.0).alias("score")
        )
    if raw_field_type == "keyword":
        return engine.corpus.where(F.col(engine.text_col) == query).select(
            F.col(engine.id_col).alias("docID"), F.lit(1.0).alias("score")
        )
    if raw_field_type == "wildcard":
        import re

        # (?s): the whole VALUE is the match target (keyword-family
        # semantics), so the glob must cross newlines inside it
        rx = "(?s)^" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in query
        ) + "$"
        return engine.corpus.where(F.col(engine.text_col).rlike(rx)).select(
            F.col(engine.id_col).alias("docID"), F.lit(1.0).alias("score")
        )
    raise ValueError("binary raw field is stored only, not searchable")
