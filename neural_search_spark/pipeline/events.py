"""Event-stream batch analytics over the ``events`` table.

The large-scale companions to the streaming operators
(:mod:`neural_search_spark.streaming.analytics`): the same event-time
logic expressed as batch plans over the persisted event log — tumbling
windows, gap-based sessionization, and JSON property extraction. All
three are pure built-in column expressions / partitioned window
functions:

- :func:`window_agg` — one groupBy shuffle on (window, type); at 100 TB
  the event log is date-partitioned so the shuffle is per-partition.
- :func:`sessionize` — the canonical gap-session assignment: a lag +
  cumulative-sum window PARTITIONED BY user (never a global sort), then
  one groupBy per (user, session). State per task = one partition of
  users.
- :func:`json_prop_stats` — ``get_json_object`` runs JVM-side; at scale
  a real pipeline materializes hot properties to columns at ingest, but
  the ad-hoc path must exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from neural_search_spark.pipeline import params as P

SESSION_GAP_MIN = 30


def window_agg(events: DataFrame, window_duration: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, sum_value, n_users): tumbling
    event-time windows × type."""
    return (
        events.groupBy(
            F.window("ts", window_duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            P.round4(F.sum("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_id, session_start, n_events, duration_sec):
    gap-based sessions — a new session starts when a user's inter-event
    gap exceeds ``gap_minutes``. session_id is the per-user ordinal
    (starting at 1); duration is last−first event in seconds.
    """
    # TIMESTAMP_NTZ needs the two-step cast; only *differences* of the
    # epoch values are used, so the session-timezone offset cancels
    ep = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = ep - F.lag(ep).over(w)
    new_sess = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn(
        "session_id", F.sum(new_sess).over(w).cast("long")
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            P.round4(F.max(ep) - F.min(ep)).alias("duration_sec"),
        )
    )


def value_percentiles(
    events: DataFrame, probs: tuple = (0.5, 0.95, 0.99)
) -> DataFrame:
    """(event_type, p50, p95, p99): EXACT interpolated percentiles of
    ``value`` per type (Spark's ``percentile``; same linear-interpolation
    definition as DuckDB ``quantile_cont`` — the oracle-able contract).
    At 100 TB the approximate path swaps in ``percentile_approx``
    unchanged; exact is kept here because the cross-engine gate needs a
    deterministic definition."""
    aggs = [
        P.round4(F.expr(f"percentile(value, {p!r})")).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return events.groupBy("event_type").agg(*aggs)


def json_prop_stats(events: DataFrame, prop: str = "k") -> DataFrame:
    """(event_type, n_with_prop, avg_prop): extract an integer property
    from the ``props`` JSON column and aggregate per type."""
    v = F.get_json_object(F.col("props"), f"$.{prop}").cast("long")
    return (
        events.select("event_type", v.alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n_with_prop"), P.round4(F.avg("v")).alias("avg_prop"))
    )


def funnel(events: DataFrame, steps: list[str], window_us: int | None = None) -> DataFrame:
    """(step_idx, step, users): ordered conversion funnel — a user reaches
    step i when their FIRST occurrence of ``steps[i]`` strictly after
    their step-(i-1) time exists — strict microsecond-timestamp
    comparison, the ClickHouse ``windowFunnel(strictly_increasing)``
    contract: same-microsecond events never chain. ``window_us`` bounds
    the whole chain to within that many microseconds of the step-0 time
    (anchored at the user's FIRST step-0 occurrence — a deterministic
    simplification of windowFunnel's sliding anchor).

    Plan: ONE shuffle. Every per-step "first occurrence after the
    previous step" is a conditional ``min`` window over the same
    ``partitionBy(user_id)``, so Catalyst plans a single exchange on
    user_id followed by chained window passes that reuse its
    partitioning; the final per-step count is a tiny aggregate over one
    row per user. No self-joins — an L-step funnel over 100 TB of events
    still moves the events exactly once.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # integer microsecond key (exact in BIGINT on both engines — a
    # double epoch*1e9 fold would pass 2^53 and silently drop tie-breaks)
    key = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id")
    df = events.withColumn("_k", key)
    prev = None
    for i, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("_k") > F.col(prev))
            if window_us is not None:
                cond = cond & (F.col("_k") <= F.col("_t0") + F.lit(int(window_us)))
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col("_k"))).over(w))
        prev = f"_t{i}"
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.sum(F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_c{i}")
            for i in range(len(steps))
        ]
    )
    # one posexplode over the single counts row (a union of per-step
    # selects would embed — and recompute — the aggregate once per step)
    names = F.array(*[F.lit(s) for s in steps])
    return counts.select(
        F.posexplode(F.array(*[F.col(f"_c{i}") for i in range(len(steps))])).alias(
            "step_idx", "users"
        )
    ).select(
        F.col("step_idx").cast("int").alias("step_idx"),
        F.element_at(names, F.col("step_idx") + 1).alias("step"),
        "users",
    )


def retention(events: DataFrame, horizon_days: int = 3) -> DataFrame:
    """(cohort, d, users): classic cohort retention (the ClickHouse
    ``retention``/cohort-analysis shape) — cohort = a user's first event
    day; ``users`` = distinct users with any event exactly ``d`` days
    after their cohort day, 0 ≤ d ≤ horizon. d=0 is the cohort size.

    Scale shape: one user-keyed min-aggregation (cohort assignment), one
    distinct-(user, day) projection, a user-keyed equi-join (both sides
    hash-partition on user_id — a single co-located exchange pair), then a
    tiny (cohort, d) groupBy. No windows, no self-joins over raw events."""
    first = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    active = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        active.join(first, "user_id")
        .withColumn("d", F.datediff("day", "cohort"))
        .where((F.col("d") >= 0) & (F.col("d") <= int(horizon_days)))
        .groupBy("cohort", "d")
        .agg(F.countDistinct("user_id").cast("long").alias("users"))
        .orderBy("cohort", "d")
    )


def date_histogram(events: DataFrame) -> DataFrame:
    """(day, event_type, doc_count, sum_value): the OpenSearch
    ``date_histogram`` (calendar_interval=day) with a terms sub-agg on the
    event type — calendar buckets, unlike :func:`window_agg`'s fixed
    epoch-aligned tumbling windows. One groupBy on (day, type); at 100 TB
    the event log is date-partitioned so the bucket key equals the
    partition key and the shuffle is partition-local."""
    return (
        events.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def daily_anomalies(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """(event_type, day, doc_count, zscore) — days whose event count is a
    z-score outlier WITHIN its event type (the ops-side anomaly sweep over
    the same calendar-day buckets as :func:`date_histogram`). Population
    stddev (DuckDB ``stddev_pop``-compatible), z quantized round6 BEFORE
    the |z| ≥ threshold gate so boundary days cannot flip between
    engines; reported z rounds to 4.

    Scale shape: the daily-count table is O(types × days) — tiny even for
    a 100 TB raw log — so the per-type window runs over a few thousand
    rows; the only corpus-sized work is the same single groupBy as the
    histogram."""
    daily = events.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    w = Window.partitionBy("event_type")
    mu = F.avg("doc_count").over(w)
    sd = F.stddev_pop("doc_count").over(w)
    z = F.when(sd > 0, (F.col("doc_count") - mu) / sd).otherwise(F.lit(0.0))
    return (
        daily.select(
            "event_type",
            "day",
            "doc_count",
            F.round(z, 4).alias("zscore"),
            F.abs(F.round(z, 6)).alias("_az"),
        )
        .where(F.col("_az") >= float(z_threshold))
        .select("event_type", "day", "doc_count", "zscore")
        .orderBy("event_type", "day")
    )
