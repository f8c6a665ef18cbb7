"""Inverted-index build job: corpus → compressed block-max postings.

Layout written under ``out_dir``:

- ``postings/shard=S/*.parquet`` — one row per (term, shard):
  ``(term, df, doc_bytes, tf_bytes, blk_last, blk_maxtf, blk_mindlq,
  blk_docend, blk_tfend)`` (parallel block-metadata arrays; see
  :mod:`neural_search_spark.index.codec`).
- ``doclens/shard=S/*.parquet`` — ``(docID, dl, dlq)`` per doc.
- ``stats.json`` — ``{n_docs, total_tokens, n_shards, block_size}``.
- ``manifest.jsonl`` — per-partition lineage: one line per completed unit
  ``{stage, shards, rows, terms, bytes, wall_s}`` — the checkpoint/resume
  record mandated by BASELINE.json north_rule.

Shuffle strategy (the north_star contract): postings rows are grouped by
the composite key ``(term, shard)`` where ``shard = xxhash64(docID) %
n_shards``. The shard component IS the explicit salt: a skewed token
('import', 'def', …) splits into ``n_shards`` independent reduce groups
instead of hot-spotting one reducer, and — because the salt is a pure
function of docID — every term's sub-list for shard S covers the same
document subset, so query-time top-k runs shard-local with a cheap global
merge (the reference's shard model,
``search/collector/HybridTopScoreDocCollector.java`` per-shard heaps).

Resume: the build loops over shard batches; a batch whose shards are all
present in the manifest is skipped. Stage A (tokenize → raw postings
checkpoint, partitioned by shard) runs once and is itself a manifest
stage; stage B re-reads only the batch's shard directories (partition
pruning), so a restart never re-tokenizes completed work.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from neural_search_spark.analysis.tokenizer import term_freqs_udf
from neural_search_spark.index.codec import BLOCK_SIZE, encode_posting_list
from neural_search_spark.index.smallfloat import quantize_length_np

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("df", LongType(), False),
        StructField("doc_bytes", BinaryType(), False),
        StructField("tf_bytes", BinaryType(), False),
        StructField("blk_last", ArrayType(LongType()), False),
        StructField("blk_maxtf", ArrayType(IntegerType()), False),
        StructField("blk_mindlq", ArrayType(IntegerType()), False),
        StructField("blk_docend", ArrayType(IntegerType()), False),
        StructField("blk_tfend", ArrayType(IntegerType()), False),
    ]
)


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> list[dict]:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_manifest(out_dir: str, entry: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(entry) + "\n")


def _encode_factory(block_size: int):
    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """One group = one (term, shard): sort by docID, compress."""
        order = np.argsort(pdf["docID"].to_numpy(), kind="stable")
        d = pdf["docID"].to_numpy()[order]
        t = pdf["tf"].to_numpy()[order]
        q = pdf["dlq"].to_numpy()[order]
        doc_b, tf_b, blocks = encode_posting_list(d, t, q, block_size=block_size)
        last, maxtf, mindlq, docend, tfend = (list(x) for x in zip(*blocks))
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "shard": [int(pdf["shard"].iloc[0])],
                "df": [int(d.size)],
                "doc_bytes": [doc_b],
                "tf_bytes": [tf_b],
                "blk_last": [last],
                "blk_maxtf": [maxtf],
                "blk_mindlq": [mindlq],
                "blk_docend": [docend],
                "blk_tfend": [tfend],
            }
        )

    return encode_group


def raw_postings(corpus: DataFrame, n_shards: int, text_col: str = "content", id_col: str = "docID") -> DataFrame:
    """corpus → (docID, shard, term, tf, dl, dlq): tokenize once, carry the
    doc length with every posting row so the encoder never joins doclens
    (at 10^12 docs that join would be a second full shuffle)."""

    @F.pandas_udf(IntegerType())
    def _quant(dl: pd.Series) -> pd.Series:
        return pd.Series(quantize_length_np(dl.to_numpy()), dtype="int32")

    base = corpus.select(
        F.col(id_col).alias("docID"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        term_freqs_udf(F.col(text_col)).alias("_tf"),
    ).select(
        "docID",
        "shard",
        F.col("_tf.dl").alias("dl"),
        F.explode(F.col("_tf.tf_map")).alias("term", "tf"),
    )
    return base.withColumn("dlq", _quant(F.col("dl")))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    text_col: str = "content",
    id_col: str = "docID",
    shard_batch: int | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume) the compressed index; returns summary metrics."""
    os.makedirs(out_dir, exist_ok=True)
    done = read_manifest(out_dir) if resume else []
    done_stage_a = any(e["stage"] == "raw" for e in done)
    done_shards = {s for e in done if e["stage"] == "postings" for s in e["shards"]}

    raw_dir = os.path.join(out_dir, "_postings_raw")
    t0 = time.perf_counter()

    if not done_stage_a:
        rp = raw_postings(corpus, n_shards, text_col, id_col)
        rp.write.partitionBy("shard").mode("overwrite").parquet(raw_dir)
        # doclens: distinct per doc, cheap projection of the same raw rows
        spark.read.parquet(raw_dir).groupBy("docID", "shard").agg(
            F.first("dl").alias("dl"), F.first("dlq").alias("dlq")
        ).select("docID", "dl", "dlq", "shard").write.partitionBy("shard").mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "doclens"))
        dstats = (
            spark.read.parquet(os.path.join(out_dir, "doclens"))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("tot"))
            .collect()[0]
        )
        stats = {
            "n_docs": int(dstats["n"]),
            "total_tokens": int(dstats["tot"] or 0),
            "n_shards": n_shards,
            "block_size": block_size,
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        nrows = spark.read.parquet(raw_dir).count()
        _append_manifest(
            out_dir,
            {
                "stage": "raw",
                "shards": list(range(n_shards)),
                "rows": nrows,
                "wall_s": round(time.perf_counter() - t0, 3),
            },
        )

    encode = _encode_factory(block_size)
    batch = shard_batch or n_shards
    pending = [s for s in range(n_shards) if s not in done_shards]
    for i in range(0, len(pending), batch):
        shards = pending[i : i + batch]
        tb = time.perf_counter()
        src = spark.read.parquet(raw_dir).where(F.col("shard").isin(shards))
        out = src.groupBy("term", "shard").applyInPandas(encode, POSTINGS_SCHEMA)
        # dynamic partition overwrite: a crash-retried batch rewrites its own
        # shard directories instead of appending duplicates
        out.write.partitionBy("shard").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(os.path.join(out_dir, "postings"))
        built = (
            spark.read.parquet(os.path.join(out_dir, "postings"))
            .where(F.col("shard").isin(shards))
            .agg(F.count("*").alias("terms"), F.sum("df").alias("postings"))
            .collect()[0]
        )
        _append_manifest(
            out_dir,
            {
                "stage": "postings",
                "shards": shards,
                "terms": int(built["terms"]),
                "rows": int(built["postings"] or 0),
                "wall_s": round(time.perf_counter() - tb, 3),
            },
        )

    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    stats["build_wall_s"] = round(time.perf_counter() - t0, 3)
    return stats
