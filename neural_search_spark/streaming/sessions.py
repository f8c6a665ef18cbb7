"""Session-window analytics: the Spark-native gap-sessionization path
(batch ≡ streaming by construction) plus a custom stateful operator for
session semantics ``session_window`` cannot express.

The reference has no streaming surface (SURVEY.md §2.9 — ingest is the
REST bulk path); this module extends the engine's Structured-Streaming
side (:mod:`neural_search_spark.streaming.analytics`) with the remaining
canonical stateful shape: per-user inactivity sessions over the events
stream.

Two tiers, deliberately:

1. :func:`session_window_stats` — the *declarative* path. Spark's
   built-in ``F.session_window`` (merge-on-overlap gap windows) is a
   Catalyst-native aggregation: whole-stage-codegen'd in batch, and in
   streaming it runs on the session-window state store with watermark
   eviction. The SAME function body serves both modes — the batch run is
   the DuckDB-oracled registry key (``stream_sessionize_batch``), the
   streaming run is pinned equal to it in ``tests/test_streaming.py``.
   Boundary contract (matches Spark's implementation): an event whose
   timestamp is **strictly less than** previous-event-time + gap merges
   into the open session; a gap of exactly ``gap`` starts a NEW session
   (oracle twin uses ``gap_s >= gap*60``). ``session_end`` is
   last-event-time + gap, per Spark's definition.
2. :func:`sessionize_stateful` — the *imperative* path via
   ``applyInPandasWithState`` (Arrow-batched, event-time timeout), for
   the semantics the declarative window can't express: **terminal event
   types** (an explicit end-of-session event closes the session at that
   event) and a **max-events cap** (a session force-splits after
   ``max_events`` rows). Both are running-restart conditions — the split
   point depends on the previous split point — so they are not
   expressible as a window function over a fixed key; this is exactly
   the custom-stateful-operator case (SURVEY.md §2.9). Gated by pytest
   against an independent pure-Python fold (non-SQL-expressible by
   design, so no DuckDB oracle key).

Scale notes (100 TB / unbounded stream):

- both paths shuffle ONCE on ``user_id``; state is per open session per
  user (a few scalars), evicted by the watermark (declarative) or the
  event-time timeout (stateful). No corpus-sized state, no driver
  collection.
- the stateful fold sorts each user's micro-batch slice in Python —
  bounded by per-user-per-trigger volume, not corpus size; Arrow
  delivers each key group as a whole so there is no per-row Python
  dispatch.
- skewed users (bot traffic) are the classic hazard: the declarative
  path inherits AQE skew handling on the shuffle; the stateful path's
  per-key cost is linear in that key's batch slice either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neural_search_spark.pipeline import params as P


def session_window_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    time_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Per-user gap sessions via the built-in ``session_window``:
    ``(user_id, session_start, session_end, n_events, total_value)``.

    Mode-agnostic: in batch this is a plain (codegen'd) aggregation; on a
    streaming DataFrame pass ``watermark_delay`` so append-mode emission
    and state eviction are bounded (complete mode needs no watermark).
    ``session_end`` is ``max(ts) + gap`` — Spark's session close time,
    i.e. the instant the inactivity timeout would have fired.
    """
    base = events
    if watermark_delay is not None:
        base = base.withWatermark(time_col, watermark_delay)
    agg = base.groupBy(
        F.col(user_col),
        F.session_window(F.col(time_col), f"{gap_minutes} minutes").alias("session"),
    ).agg(
        F.count("*").alias("n_events"),
        P.round4(F.sum("value")).alias("total_value"),
    )
    return agg.select(
        F.col(user_col),
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events",
        "total_value",
    )


def sessionize_stateful(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    max_events: int | None = None,
    terminal_types: tuple[str, ...] = (),
    time_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful sessionization (streaming):
    ``(user_id, session_start, session_end_ts, n_events, end_reason)``.

    A session CLOSES when (checked in this order, per event):

    - the inter-event gap is ``>= gap_minutes`` (``end_reason='gap'`` —
      same boundary contract as :func:`session_window_stats`);
    - the event's type is in ``terminal_types`` — the event itself is the
      LAST event of its session (``end_reason='terminal'``);
    - the session has reached ``max_events`` rows
      (``end_reason='cap'``).

    Open sessions are flushed by an event-time timeout ``gap`` past the
    last event (``end_reason='timeout'``) — fires when the watermark
    passes that instant, so the caller must set a watermark upstream.
    ``session_end_ts`` is the LAST EVENT's timestamp (not +gap): for
    terminal/cap closes there is no inactivity interval to add, so the
    contract differs from the declarative path by design.

    Events within one micro-batch are folded in ``(ts, event_id)`` order;
    state carried across batches is one open-session tuple per user.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", DoubleType()),  # epoch seconds
            StructField("session_end_ts", DoubleType()),
            StructField("n_events", LongType()),
            StructField("end_reason", StringType()),
        ]
    )
    # open session: (start_epoch, last_epoch, n_events)
    state_schema = StructType(
        [
            StructField("start", DoubleType()),
            StructField("last", DoubleType()),
            StructField("n", LongType()),
        ]
    )
    gap_s = float(gap_minutes) * 60.0
    terminal = frozenset(terminal_types)
    cap = int(max_events) if max_events is not None else None

    def _fold(key, pdfs, state: GroupState):
        import pandas as pd

        uid = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [start],
                    "session_end_ts": [last],
                    "n_events": [n],
                    "end_reason": ["timeout"],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["_ep", "event_id"], kind="mergesort")
        cur = state.get if state.exists else None  # (start, last, n)
        closed: list[tuple[float, float, int, str]] = []
        for ep, etype in zip(rows["_ep"].to_numpy(), rows["event_type"]):
            ep = float(ep)
            if cur is not None and ep - cur[1] >= gap_s:
                closed.append((*cur, "gap"))
                cur = None
            if cur is None:
                cur = (ep, ep, 1)
            else:
                cur = (cur[0], ep, cur[2] + 1)
            if etype in terminal:
                closed.append((*cur, "terminal"))
                cur = None
            elif cap is not None and cur[2] >= cap:
                closed.append((*cur, "cap"))
                cur = None
        if cur is not None:
            state.update(cur)
            # event-time timeout: fires when the watermark passes last+gap.
            # Spark rejects a timeout at-or-behind the current watermark
            # (possible when this key's data arrives late relative to
            # other keys), so clamp to watermark+1ms — the flush then
            # fires on the next watermark advance, which is the earliest
            # legal instant anyway.
            ts_ms = max(
                int((cur[1] + gap_s) * 1000), state.getCurrentWatermarkMs() + 1
            )
            state.setTimeoutTimestamp(ts_ms)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end_ts": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "end_reason": [c[3] for c in closed],
                }
            )

    prepped = events_stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type"),
        # the watermark-tagged event-time column must survive projection
        # for EventTimeTimeout to resolve; _ep is its epoch-seconds twin
        F.col(time_col),
        F.col(time_col).cast("timestamp").cast("double").alias("_ep"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_fold_reference(
    rows: list[tuple[int, int, str, float]],
    gap_minutes: int = 30,
    max_events: int | None = None,
    terminal_types: tuple[str, ...] = (),
) -> list[tuple[int, float, float, int, str]]:
    """Independent pure-Python reference for :func:`sessionize_stateful`
    (the pytest twin — the semantics are not SQL-expressible because the
    split points are a running restart condition). Input rows are
    ``(user_id, event_id, event_type, epoch_s)`` in any order; output is
    the closed-session list ``(user_id, start, end_ts, n, reason)`` with
    still-open sessions reported as ``reason='timeout'`` (what the
    stream's timeout flush would eventually emit).
    """
    gap_s = float(gap_minutes) * 60.0
    by_user: dict[int, list[tuple[float, int, str]]] = {}
    for uid, eid, etype, ep in rows:
        by_user.setdefault(int(uid), []).append((float(ep), int(eid), etype))
    out: list[tuple[int, float, float, int, str]] = []
    for uid in sorted(by_user):
        cur = None
        for ep, _eid, etype in sorted(by_user[uid]):
            if cur is not None and ep - cur[1] >= gap_s:
                out.append((uid, cur[0], cur[1], cur[2], "gap"))
                cur = None
            cur = (ep, ep, 1) if cur is None else (cur[0], ep, cur[2] + 1)
            if etype in terminal_types:
                out.append((uid, cur[0], cur[1], cur[2], "terminal"))
                cur = None
            elif max_events is not None and cur[2] >= max_events:
                out.append((uid, cur[0], cur[1], cur[2], "cap"))
                cur = None
        if cur is not None:
            out.append((uid, cur[0], cur[1], cur[2], "timeout"))
    return out
