"""Structured Streaming ingestion → incremental index maintenance.

The reference has no streaming surface (SURVEY.md §2.9 — ingest is the
REST bulk path); the north rule mandates *resumable batch* builds. This
module is the Spark-native continuous-ingestion path layered ON TOP of
that batch contract: a corpus stream (file source over the landing
directory, Kafka, Iceberg CDC, …) drives
:func:`neural_search_spark.index.builder.update_index` once per
micro-batch via ``foreachBatch``.

Why ``foreachBatch`` and not a stateful streaming operator: the index
update is a multi-output transactional job (raw postings + doclens +
docmap + compressed postings + manifest) with its own content-identity
skip — exactly the "arbitrary batch logic per micro-batch" case
``foreachBatch`` exists for. Exactly-once composition: Structured
Streaming checkpoints the source offsets; ``update_index`` is idempotent
(content-sha diff — replaying a batch finds nothing dirty), so
at-least-once delivery converges to the correct index.

Scale notes: each micro-batch touches only the shards containing dirty
docs (at 10^12 files a batch of one repo re-encodes a handful of (term,
shard) groups); batch cadence = trigger interval; the docID must be
stable across retries (content-addressed ``xxhash64(repo, path, commit)``
from ``sources/corpus_source.py`` qualifies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stream_index_updates(
    corpus_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "content",
    id_col: str = "docID",
    trigger_available_now: bool = True,
    query_name: str = "index-ingest",
):
    """Start (and return) a streaming query that keeps the index at
    ``out_dir`` up to date with ``corpus_stream``.

    Each micro-batch is applied with ``mode="upsert"`` — a batch is a
    delta, so docs absent from it are untouched; deletions at 100 TB come
    through an explicit tombstone feed or a periodic ``mode="sync"``
    reconciliation over the full table, not the stream. Duplicate docIDs
    within one batch keep the lexicographically-greatest sha
    deterministically (last-writer-wins needs an event-time column, which
    the corpus shape does not carry).
    """
    from neural_search_spark.index.builder import update_index

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # deterministic intra-batch dedup by docID
        deduped = (
            batch_df.withColumn("_sha", F.sha2(F.col(text_col), 256))
            .withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy(id_col).orderBy(F.desc("_sha"))),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn", "_sha")
        )
        update_index(
            spark, deduped, out_dir, text_col=text_col, id_col=id_col, mode="upsert"
        )

    writer = (
        corpus_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
