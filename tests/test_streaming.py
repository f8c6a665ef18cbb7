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


def test_session_window_stream_matches_batch(spark, tmp_path):
    """The declarative session_window plan is mode-agnostic: run it as a
    real stream (two micro-batches, a session SPANNING the batch
    boundary, complete-mode memory sink) and as a batch over the same
    rows — identical sessions, including the cross-batch merge."""
    from datetime import datetime

    from neural_search_spark.streaming.sessions import session_window_stats

    stream_dir = str(tmp_path / "sw")
    ckpt = str(tmp_path / "sw_ckpt")
    os.makedirs(stream_dir)
    schema = "event_id long, ts timestamp, user_id long, value double"

    def t(hh, mm):
        return datetime(2026, 1, 1, hh, mm, 0)

    b1 = [(1, t(10, 0), 1, 1.0), (2, t(10, 10), 1, 2.0), (3, t(10, 0), 2, 5.0)]
    b2 = [(4, t(10, 20), 1, 3.0), (5, t(11, 30), 2, 7.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(stream_dir)
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        session_window_stats(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("select * from sess_complete").collect()
    )
    want = sorted(
        tuple(r)
        for r in session_window_stats(
            spark.createDataFrame(b1 + b2, schema), gap_minutes=30
        ).collect()
    )
    assert got == want
    # the cross-batch merge happened: user 1's three events are ONE session
    u1 = [r for r in got if r[0] == 1]
    assert len(u1) == 1 and u1[0][3] == 3


def test_sessionize_stateful_semantics(spark, tmp_path):
    """Custom stateful sessionization: terminal-event close, max-events
    cap (reached ACROSS a micro-batch boundary — state carried), and
    event-time-timeout flush of open sessions, all checked against the
    independent pure-Python fold."""
    from datetime import datetime

    from neural_search_spark.streaming.sessions import (
        sessionize_fold_reference,
        sessionize_stateful,
    )

    stream_dir = str(tmp_path / "st")
    ckpt = str(tmp_path / "st_ckpt")
    out_dir = str(tmp_path / "st_out")
    os.makedirs(stream_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def t(hh, mm, d=1):
        return datetime(2026, 1, d, hh, mm, 0)

    b1 = [
        (1, t(10, 0), 1, "view"), (2, t(10, 5), 1, "view"),
        (3, t(10, 0), 2, "view"), (4, t(10, 2), 2, "logout"),   # terminal
        (5, t(10, 0), 3, "view"), (6, t(10, 1), 3, "view"),
        (7, t(10, 2), 3, "view"),                                # cap (3)
        (8, t(10, 3), 3, "view"),                                # reopens
    ]
    b2 = [
        (9, t(10, 20), 1, "view"),        # merges -> n=3 -> cap, cross-batch
        (10, t(11, 30), 1, "view"),       # new open session
        (11, t(0, 0, d=2), 99, "view"),   # sentinel: advances the watermark
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(stream_dir)
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessionize_stateful(
            stream, gap_minutes=30, max_events=3, terminal_types=("logout",)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = [
        (r["user_id"], r["session_start"], r["session_end_ts"], r["n_events"],
         r["end_reason"])
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] != 99
    ]
    rows = [
        (uid, eid, etype, ts.timestamp())
        for (eid, ts, uid, etype) in b1 + b2
        if uid != 99
    ]
    want = sessionize_fold_reference(
        rows, gap_minutes=30, max_events=3, terminal_types=("logout",)
    )
    # sessions (sans reason) must match exactly; reasons: terminal/cap are
    # deterministic, gap vs timeout may differ by watermark timing
    assert sorted((u, s, e, n) for u, s, e, n, _ in emitted) == sorted(
        (u, s, e, n) for u, s, e, n, _ in want
    )
    want_reasons = {(u, s): r for u, s, e, n, r in want}
    for u, s, e, n, r in emitted:
        wr = want_reasons[(u, s)]
        if wr in ("terminal", "cap"):
            assert r == wr, (u, s, r, wr)
        else:
            assert r in ("gap", "timeout"), (u, s, r)
