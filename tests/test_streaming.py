"""Structured Streaming ingest → incremental index maintenance.

Contract: after the stream drains, the index equals a fresh batch build
of the accumulated corpus state (the same equivalence the batch
update_index test pins), and replaying content (at-least-once delivery)
is a no-op thanks to the content-sha skip.
"""

import os

import numpy as np

from neural_search_spark.corpus import synthetic_code_corpus_pdf
from neural_search_spark.index.builder import build_index, read_manifest, update_index
from neural_search_spark.search.wand import BlockMaxIndex
from neural_search_spark.streaming.ingest import stream_index_updates


def _rows(df):
    return [(r["docID"], r["score"]) for r in df.collect()]


def _drain(spark, stream_dir, schema, index_dir, checkpoint):
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    q = stream_index_updates(stream, index_dir, checkpoint)
    q.awaitTermination(120)


def test_stream_updates_match_batch_rebuild(spark, tmp_path):
    base = synthetic_code_corpus_pdf(n_rows=120, seed=21)
    index_dir = str(tmp_path / "sidx")
    build_index(spark, spark.createDataFrame(base), index_dir, n_shards=4, block_size=16)

    stream_dir = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)
    schema = spark.createDataFrame(base).schema

    # micro-batch 1: 2 new docs + 1 changed doc
    import hashlib

    import pandas as pd

    b1_new = synthetic_code_corpus_pdf(n_rows=2, seed=77)
    b1_new["docID"] = [20001, 20002]
    changed = base[base["docID"] == 9].copy()
    changed["content"] = "import ident1 streamed_token_one"
    b1 = pd.concat([b1_new, changed], ignore_index=True)
    b1["content_sha256"] = [hashlib.sha256(c.encode()).hexdigest() for c in b1["content"]]
    spark.createDataFrame(b1, schema=schema).write.mode("append").parquet(stream_dir)
    _drain(spark, stream_dir, schema, index_dir, checkpoint)

    # micro-batch 2: another new doc
    b2 = synthetic_code_corpus_pdf(n_rows=1, seed=88)
    b2["docID"] = [20003]
    spark.createDataFrame(b2, schema=schema).write.mode("append").parquet(stream_dir)
    _drain(spark, stream_dir, schema, index_dir, checkpoint)

    # expected state: base with doc 9 changed, plus the 3 streamed docs
    final = pd.concat([base[base["docID"] != 9], b1, b2], ignore_index=True)
    d2 = str(tmp_path / "full")
    build_index(spark, spark.createDataFrame(final, schema=schema), d2, n_shards=4, block_size=16)

    for q in ["import ident1", "streamed_token_one", "def uniq_000001", "import"]:
        got = _rows(BlockMaxIndex(spark, index_dir).match_topk(q, k=10))
        want = _rows(BlockMaxIndex(spark, d2).match_topk(q, k=10))
        assert [x[0] for x in got] == [x[0] for x in want], q
        np.testing.assert_allclose(
            [x[1] for x in got], [x[1] for x in want], rtol=0, atol=1e-9
        )

    # upsert mode: docs absent from a batch were NOT removed
    assert any(d == 0 for d, _ in _rows(BlockMaxIndex(spark, index_dir).match_topk("import", k=1000)))

    man = read_manifest(index_dir)
    assert sum(1 for e in man if e.get("stage") == "update") >= 2


def test_upsert_replay_is_noop(spark, tmp_path):
    """At-least-once delivery: replaying already-applied content finds
    nothing dirty (the content-sha inference-skip), so exactly-once
    composition holds without sink-side transactions."""
    base = synthetic_code_corpus_pdf(n_rows=60, seed=31)
    d = str(tmp_path / "ridx")
    build_index(spark, spark.createDataFrame(base), d, n_shards=4, block_size=16)
    replay = base.head(10)
    summary = update_index(spark, spark.createDataFrame(replay), d, mode="upsert")
    assert summary == {"added": 0, "removed": 0, "changed": 0, "shards": []}


def test_upsert_never_removes(spark, tmp_path):
    base = synthetic_code_corpus_pdf(n_rows=60, seed=32)
    d = str(tmp_path / "uidx")
    build_index(spark, spark.createDataFrame(base), d, n_shards=4, block_size=16)
    # a delta with ONE new doc: sync would remove the other 59; upsert must not
    delta = synthetic_code_corpus_pdf(n_rows=1, seed=99)
    delta["docID"] = [30001]
    summary = update_index(spark, spark.createDataFrame(delta), d, mode="upsert")
    assert summary["added"] == 1 and summary["removed"] == 0
    import json

    with open(os.path.join(d, "stats.json")) as f:
        assert json.load(f)["n_docs"] == 61


def test_windowed_doc_stats_watermark(spark, tmp_path):
    """Append-mode windowed stats: watermark-passed windows emit exactly
    once; a late event behind the watermark is dropped."""
    from datetime import datetime

    from neural_search_spark.streaming.analytics import start_windowed_doc_stats

    stream_dir = str(tmp_path / "evt")
    ckpt = str(tmp_path / "evt_ckpt")
    out_dir = str(tmp_path / "evt_out")
    os.makedirs(stream_dir)
    schema = "event_time timestamp, docID long, content string"

    def t(mm, ss):
        return datetime(2026, 1, 1, 10, mm, ss)

    def drain():
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        q = start_windowed_doc_stats(stream, ckpt, output_dir=out_dir)
        q.awaitTermination(120)

    def emitted():
        return {
            r["window_start"].minute: (r["n_docs"], r["total_tokens"])
            for r in spark.read.parquet(out_dir).collect()
        }

    b1 = [
        (t(0, 10), 1, "alpha beta gamma"),      # window 10:00
        (t(0, 40), 2, "alpha beta"),            # window 10:00
        (t(1, 10), 3, "one two three four"),    # window 10:01
        (t(9, 0), 4, "late watermark driver"),  # advances watermark past 10:01
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(stream_dir)
    drain()
    rows = emitted()
    assert rows[0] == (2, 5)
    assert rows[1] == (1, 4)
    assert 9 not in rows  # newest window not yet past the watermark

    # micro-batch 2: an event far behind the watermark -> dropped (the
    # checkpoint carries the watermark across the restart)
    b2 = [(t(0, 50), 5, "too late to count")]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(stream_dir)
    drain()
    assert emitted() == rows  # nothing new emitted, late event discarded


def test_streaming_dedup_filter_keeps_first(spark, tmp_path):
    """Stateful keep-first dedup across micro-batches: within a batch the
    smallest docID wins; across batches (and replays) state suppresses
    previously-seen content."""
    from neural_search_spark.streaming.analytics import streaming_dedup_filter

    stream_dir = str(tmp_path / "dd")
    ckpt = str(tmp_path / "dd_ckpt")
    out_dir = str(tmp_path / "dd_out")
    os.makedirs(stream_dir)
    schema = "docID long, content string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        q = (
            streaming_dedup_filter(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [(3, "alpha"), (1, "alpha"), (2, "beta")]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(stream_dir)
    drain()
    got = {(r["docID"], ) for r in spark.read.parquet(out_dir).collect()}
    assert {d for d, in got} == {1, 2}  # smallest docID per sha kept

    # batch 2: replayed content + one new doc
    b2 = [(9, "alpha"), (5, "gamma")]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(stream_dir)
    drain()
    kept = sorted(r["docID"] for r in spark.read.parquet(out_dir).collect())
    assert kept == [1, 2, 5]  # 9 suppressed by state
