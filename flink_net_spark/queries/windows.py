"""Event-time windowing — SURVEY.md §2.7 (batch-oracle form).

The reference's window assigners:
  - TumblingEventTimeWindows.Of(size[, offset]) — start formula
    ``ts - (ts - offset + size) % size`` (TimeWindow.GetWindowStartWithOffset,
    FlinkDotNet/FlinkDotNet.Core.Abstractions/Windowing/TimeWindow.cs:75-95)
  - SlidingEventTimeWindows.Of(size, slide[, offset]) — one window per slide
    covering ts (Core.Api/Windowing/SlidingEventTimeWindows.cs:7-48)
  - session windows: absent in the reference (only merge scaffolding,
    Trigger.cs:61-93) — Spark's ``session_window`` is our superset.

Spark's ``window()`` struct column has identical epoch-aligned semantics
(end-exclusive, ``MaxTimestamp == End-1``), so the DuckDB oracle is plain
epoch-millis bucket arithmetic.  Window boundaries are emitted as BIGINT
epoch-ms so cross-engine timestamp encodings can't skew the value hash.

The same ``window()``/``session_window()`` calls run unchanged on a
streaming DataFrame with ``withWatermark`` — see flink_net_spark.streaming.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_net_spark.queries import query
from flink_net_spark.tables import load_table

HOUR_MS = 3_600_000
HALF_HOUR_MS = 1_800_000


@query(
    "window_tumbling_hourly",
    oracle=f"""
    SELECT (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start_ms, event_type
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window ≙ TumblingEventTimeWindows.Of(1h).
    Keyed by event_type ≙ KeyBy + WindowedStream.Aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start_ms", "event_type")
    )


@query(
    "window_tumbling_offset",
    oracle=f"""
    SELECT ((epoch_ms(ts) - 900000) // {HOUR_MS}) * {HOUR_MS} + 900000 AS window_start_ms,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY window_start_ms
    """,
)
def window_tumbling_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window with a 15-minute offset ≙
    TumblingEventTimeWindows.Of(size, offset) (TimeWindow.cs:75-95);
    Spark's ``startTime`` parameter has the same shift semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_millis(F.col("window.start")).alias("window_start_ms"), "n_events")
        .orderBy("window_start_ms")
    )


@query(
    "window_sliding",
    oracle=f"""
    SELECT window_start_ms, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
        SELECT UNNEST([((epoch_ms(ts) // {HALF_HOUR_MS}) - k) * {HALF_HOUR_MS}
                       for k in [0, 1]]) AS window_start_ms,
               value
        FROM events
    )
    GROUP BY window_start_ms
    ORDER BY window_start_ms
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window size=1h slide=30m ≙ SlidingEventTimeWindows.Of —
    each event lands in size/slide = 2 windows
    (SlidingEventTimeWindows.cs:7-48)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # sum (not avg): values carry 2 decimals, so the true sum is a multiple
        # of 0.01 and ROUND(..., 2) can never land on a cross-engine rounding
        # tie — a rounded avg (sum/count) can and did (73.91375 exactly).
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.unix_millis(F.col("window.start")).alias("window_start_ms"), "n_events", "sum_value")
        .orderBy("window_start_ms")
    )


@query(
    "window_session",
    oracle="""
    WITH ev AS (
        -- µs-truncated ts (round-14 ADVICE sweep): order by the same µs
        -- values Spark sees, never raw ns.
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    marked AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR epoch_ms(ts) - LAG(epoch_ms(ts))
                         OVER (PARTITION BY user_id ORDER BY ts) >= 7200000
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
    ),
    sess AS (
        SELECT user_id, ms,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ms)           AS session_start_ms,
           MAX(ms) + 7200000 AS session_end_ms,
           COUNT(*)          AS n_events
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_ms
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 2h gap, keyed by user — superset of the reference
    (its merge scaffolding never fired, Trigger.cs:61-93).  Session end =
    last event + gap; a gap exactly equal to the timeout starts a new
    session on both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "2 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
        )
        .orderBy("user_id", "session_start_ms")
    )


@query(
    "window_global_reduce",
    oracle="""
    SELECT event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def window_global_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalWindows + Reduce ≙ all-elements-per-key aggregation
    (GlobalWindows.cs:10-65; IReduceOperator.cs:9): in batch a global window
    is simply the whole keyed input."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "window_tumbling_daily_users",
    oracle="""
    SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_start_ms,
           COUNT(DISTINCT user_id) AS active_users,
           COUNT(*)                AS n_events
    FROM events
    GROUP BY 1
    ORDER BY day_start_ms
    """,
)
def window_tumbling_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling window with a distinct aggregate (DAU-style rollup)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day"))
        .agg(F.countDistinct("user_id").alias("active_users"), F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_millis(F.col("window.start")).alias("day_start_ms"), "active_users", "n_events")
        .orderBy("day_start_ms")
    )


@query(
    "window_count_per_key",
    oracle="""
    WITH ev AS (
        -- µs-truncated ts (round-14 ADVICE sweep): the (ts, event_id)
        -- chunk order must tie-break exactly where Spark's µs ts does.
        SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
    ),
    ordered AS (
        SELECT user_id, value,
               CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 5
                    AS BIGINT) AS window_idx
        FROM ev
    )
    SELECT user_id, window_idx,
           COUNT(*)             AS n_in_window,
           ROUND(SUM(value), 2) AS sum_value
    FROM ordered
    GROUP BY user_id, window_idx
    HAVING COUNT(*) = 5
    ORDER BY user_id, window_idx
    """,
)
def window_count_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key COUNT window ≙ Flink's ``countWindow(5)`` — GlobalWindows +
    a purging count trigger (Core.Api/Windowing/GlobalWindows.cs:10-65 with
    a custom Trigger, DefaultTriggers.cs:46-52 being the never-firing
    default).  Spark has no count-based assigner, so the window index is
    derived: events are ordered deterministically per key (ts, event_id —
    arrival order in the reference) and chunked by ``(row_number-1) / 5``;
    only FULL windows emit, matching Flink's fire-on-Nth-element semantics
    (the trailing partial pane never fires).

    Scale: one hash shuffle on user_id + an in-partition sort — the same
    shape as any keyed window; no global sort.  The streaming twin of this
    firing pattern is the count-trigger test in tests/test_stateful.py.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "value",
            ((F.row_number().over(w) - 1) / 5).cast("bigint").alias("window_idx"),
        )
        .groupBy("user_id", "window_idx")
        .agg(F.count(F.lit(1)).alias("n_in_window"), F.round(F.sum("value"), 2).alias("sum_value"))
        .filter(F.col("n_in_window") == 5)
        .orderBy("user_id", "window_idx")
    )


@query(
    "window_session_dynamic_gap",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_id,
               epoch_ms(ts) + CASE WHEN event_type = 'purchase'
                                   THEN 14400000 ELSE 3600000 END AS end_ms
        FROM events
    ),
    marked AS (
        SELECT user_id, ms, end_ms, event_id,
               CASE WHEN ms >= COALESCE(MAX(end_ms) OVER (
                        PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sess AS (
        SELECT user_id, ms, end_ms,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ms)     AS session_start_ms,
           MAX(end_ms) AS session_end_ms,
           COUNT(*)    AS n_events
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_ms
    """,
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (Flink's
    ``SessionWindowTimeGapExtractor`` shape): a purchase keeps the session
    alive 4 hours, anything else 1 hour.  Spark's ``session_window`` takes
    a gap COLUMN, so each event contributes the interval
    ``[ts, ts + gap(event))`` and overlapping intervals merge — the oracle
    replays the same interval-union with a running-max-end
    gaps-and-islands pass (order ties broken by event_id; the union is
    order-insensitive, ties only affect the walk, not the islands).

    Scale: identical plan shape to static session windows — hash shuffle on
    the key, in-partition merge; the dynamic gap is a per-row expression,
    not extra state.
    """
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("4 hours")).otherwise(F.lit("1 hour"))
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
        )
        .orderBy("user_id", "session_start_ms")
    )


# --------------------------------------------------------------------------
# Time-series gap filling with last-observation-carried-forward.
# --------------------------------------------------------------------------
@query(
    "window_gap_fill_locf",
    oracle=f"""
    WITH b AS (
        SELECT MIN(epoch_ms(ts) // {HOUR_MS}) AS h0,
               MAX(epoch_ms(ts) // {HOUR_MS}) AS h1
        FROM events
    ),
    grid AS (
        SELECT g.h AS h, t.event_type
        FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS h) g,
             (SELECT DISTINCT event_type FROM events) t
    ),
    act AS (
        SELECT epoch_ms(ts) // {HOUR_MS} AS h, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
        FROM events GROUP BY 1, 2
    )
    SELECT g.h * {HOUR_MS}                       AS hour_ms,
           g.event_type                          AS event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT)      AS n_events,
           COALESCE(last_value(a.sv IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS sum_value_locf,
           (a.n IS NULL)                         AS is_gap
    FROM grid g LEFT JOIN act a ON a.h = g.h AND a.event_type = g.event_type
    ORDER BY hour_ms, event_type
    """,
)
def window_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: densify the hourly grid per key and fill
    observation gaps by last-observation-carried-forward — the gap-fill /
    ``time_bucket_gapfill`` primitive of time-series stores, composed from
    sequence-explode + left join + an IGNORE NULLS running window.  The
    emitted ``is_gap`` flag keeps interpolated rows distinguishable from
    observed ones (the audit downstream forecasting jobs need).

    Scale: the grid is (time-range x key-cardinality) — bounded by the
    calendar and the key domain, never the corpus; it generates map-side
    from one 2-value bounds row (broadcast).  The actuals aggregate with
    map-side combine on (hour, key); the LOCF window partitions per key,
    so carry-forward runs parallel across keys with no global sort."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        F.expr(f"MIN(unix_millis(ts) div {HOUR_MS})").alias("h0"),
        F.expr(f"MAX(unix_millis(ts) div {HOUR_MS})").alias("h1"),
    )
    types = e.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(b))
        .select("event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    )
    act = (
        e.groupBy(
            F.expr(f"unix_millis(ts) div {HOUR_MS}").alias("h"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    return (
        grid.join(act, ["h", "event_type"], "left")
        .select(
            (F.col("h") * HOUR_MS).alias("hour_ms"),
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(
                F.last("sv", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("sum_value_locf"),
            F.col("n").isNull().alias("is_gap"),
        )
        .orderBy("hour_ms", "event_type")
    )


# --------------------------------------------------------------------------
# Rolling 3-sigma outlier flags in exact integer arithmetic.
# --------------------------------------------------------------------------
OUTLIER_FRAME = 20  # trailing history rows per key
OUTLIER_MIN_N = 10  # warm-up: no verdict until this much history
OUTLIER_K = 3  # sigma multiplier


@query(
    "window_outlier_3sigma",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(ROUND(value * 1000, 0) AS BIGINT) AS v,
               -- µs-truncated (round-14 ADVICE sweep): frame membership
               -- is order-sensitive, so the sort key must match Spark's.
               CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    w AS (
        SELECT event_id, event_type, v,
               COUNT(v) OVER f            AS n,
               SUM(v) OVER f              AS s,
               SUM(v * v) OVER f          AS s2
        FROM ev
        WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {OUTLIER_FRAME} PRECEDING AND 1 PRECEDING)
    ),
    flags AS (
        SELECT event_id, event_type,
               (n * v - s) * (n * v - s) >
                   {OUTLIER_K * OUTLIER_K} * (n * s2 - s * s) AS is_anom
        FROM w
        WHERE n >= {OUTLIER_MIN_N}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                       AS n_eval,
           CAST(SUM(CASE WHEN is_anom THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_anom,
           CAST(SUM(CASE WHEN is_anom THEN event_id ELSE 0 END) AS BIGINT)
                                                          AS sum_anom_ids
    FROM flags
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def window_outlier_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-key 3-sigma outlier detection with ZERO floating point —
    the streaming-telemetry anomaly primitive (flag a reading that sits
    more than k·sigma from its own trailing-window mean) in exact integer
    cross-multiplication: (v - s/n)² > k²·(s2/n - (s/n)²) is multiplied
    through by n² to (n·v - s)² > k²·(n·s2 - s²), so the verdict is a
    BIGINT comparison both engines evaluate identically — no sqrt, no
    division, no epsilon.

    The frame is the {OUTLIER_FRAME} PRECEDING..1 PRECEDING trailing rows
    per user (the point itself excluded — self-inclusion dilutes the
    deviation it is testing), with a {OUTLIER_MIN_N}-row warm-up before
    any verdict.  int64 bound: |n·v| ≤ {OUTLIER_FRAME}·v_max keeps the
    squared term safe while v_max ≤ ~2^27 milli-units (~134k units);
    wider-ranged measures shift to centi-units first.

    Scale: one user-keyed shuffle, per-key sorted frames of constant
    depth — Spark's running-window frame keeps O(frame) state per key, so
    memory is flat no matter how long each key's history grows, and keys
    distribute freely across executors.  The output is the per-class
    audit summary (counts + anomalous-id checksum), constant-width."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(ROUND(value * 1000, 0) AS BIGINT)").alias("v"),
        "ts",
    )
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-OUTLIER_FRAME, -1)
    )
    w = ev.select(
        "event_id",
        "event_type",
        "v",
        F.count("v").over(f).alias("n"),
        F.sum("v").over(f).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(f).alias("s2"),
    )
    flags = w.filter(F.col("n") >= OUTLIER_MIN_N).select(
        "event_id",
        "event_type",
        (
            (F.col("n") * F.col("v") - F.col("s"))
            * (F.col("n") * F.col("v") - F.col("s"))
            > OUTLIER_K * OUTLIER_K
            * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
        ).alias("is_anom"),
    )
    return (
        flags.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(F.when(F.col("is_anom"), 1).otherwise(0)).alias("n_anom"),
            F.sum(F.when(F.col("is_anom"), F.col("event_id")).otherwise(0)).alias(
                "sum_anom_ids"
            ),
        )
        .orderBy("event_type")
    )


WEEK_MS_RET = 604_800_000


@query(
    "window_cohort_retention",
    oracle=f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(epoch_ms(ts) // {WEEK_MS_RET} AS BIGINT) AS week
        FROM events
    ),
    coh AS (
        SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT c.cohort_week,
           uw.week - c.cohort_week        AS weeks_since,
           CAST(COUNT(*) AS BIGINT)       AS n_users,
           CAST(SUM(uw.user_id) AS BIGINT) AS sum_user_ids
    FROM uw JOIN coh c USING (user_id)
    GROUP BY c.cohort_week, weeks_since
    ORDER BY cohort_week, weeks_since
    """,
)
def window_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    grouped by their FIRST active week (the cohort), counted in every
    subsequent week they return, emitted as (cohort, weeks_since,
    n_users) — each cohort row read across is its retention curve.

    Pure integer set algebra: epoch-week bucketing, per-user min, one
    distinct-activity join — deterministic at any parallelism, plus a
    user-id checksum so the driver hash pins WHICH users retained, not
    just how many.

    Scale: the distinct (user, week) collapse and the per-user min are
    both user-keyed partial aggregations (one shuffle, map-side
    combined); the cohort join is hash equi on user_id and the final agg
    is bounded by cohorts × weeks — calendar-sized, not corpus-sized."""
    uw = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                f"CAST(unix_millis(ts) div {WEEK_MS_RET} AS BIGINT)"
            ).alias("week"),
        )
        .distinct()
    )
    coh = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(coh, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").alias("sum_user_ids"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "window_gap_fill_interp",
    oracle=f"""
    WITH b AS (
        SELECT MIN(epoch_ms(ts) // {HOUR_MS}) AS h0,
               MAX(epoch_ms(ts) // {HOUR_MS}) AS h1
        FROM events
    ),
    grid AS (
        SELECT g.h AS h, t.event_type
        FROM (SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b))) AS h) g,
             (SELECT DISTINCT event_type FROM events) t
    ),
    act AS (
        SELECT epoch_ms(ts) // {HOUR_MS} AS h, event_type,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS sv
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT g.h, g.event_type, a.n, a.sv,
               last_value(a.h  IGNORE NULLS) OVER back AS ph,
               last_value(a.sv IGNORE NULLS) OVER back AS pv,
               first_value(a.h  IGNORE NULLS) OVER fwd AS nh,
               first_value(a.sv IGNORE NULLS) OVER fwd AS nv
        FROM grid g LEFT JOIN act a ON a.h = g.h AND a.event_type = g.event_type
        WINDOW back AS (PARTITION BY g.event_type ORDER BY g.h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd  AS (PARTITION BY g.event_type ORDER BY g.h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT h * {HOUR_MS}                        AS hour_ms,
           event_type,
           CAST(COALESCE(n, 0) AS BIGINT)       AS n_events,
           CAST(CASE WHEN n IS NOT NULL THEN sv
                     WHEN ph IS NULL OR nh IS NULL THEN NULL
                     ELSE pv * (nh - ph) + (nv - pv) * (h - ph)
                END AS BIGINT)                  AS interp_num,
           CAST(CASE WHEN n IS NOT NULL THEN 1
                     WHEN ph IS NULL OR nh IS NULL THEN NULL
                     ELSE nh - ph END AS BIGINT) AS interp_den,
           (n IS NULL)                          AS is_gap
    FROM j
    ORDER BY hour_ms, event_type
    """,
)
def window_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill by LINEAR INTERPOLATION — the companion to
    ``window_gap_fill_locf`` for metrics where carry-forward lies (rates,
    gauges): a gap hour between observations (h_p, v_p) and (h_n, v_n)
    takes the time-weighted value v_p + (v_n − v_p)·(h − h_p)/(h_n − h_p).

    Cross-engine exactness: the interpolated value is emitted as an EXACT
    RATIONAL — ``interp_num`` = v_p·(h_n−h_p) + (v_n−v_p)·(h−h_p) over
    ``interp_den`` = h_n−h_p, both BIGINTs in price cents × hours —
    because a materialized quotient would hit the signed trunc-vs-floor
    division divergence (Spark div truncates, DuckDB // floors) exactly
    when a series DECREASES.  Division is deferred to presentation;
    observed hours carry (sv, 1); edge gaps (no neighbor on one side)
    stay NULL rather than inventing a value.

    Scale: identical to LOCF — the grid is calendar × key-domain bounded,
    the actuals aggregate map-side, and BOTH interpolation neighbors come
    from one per-key sort feeding two window frames (backward last +
    forward first, IGNORE NULLS); no self-join, no range join."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        F.expr(f"MIN(unix_millis(ts) div {HOUR_MS})").alias("h0"),
        F.expr(f"MAX(unix_millis(ts) div {HOUR_MS})").alias("h1"),
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(b)).select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h")
    )
    act = e.groupBy(
        F.expr(f"unix_millis(ts) div {HOUR_MS}").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("sv"),
    )
    base = Window.partitionBy("event_type").orderBy("h")
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    # explicit aliases: grid.event_type and act.event_type share lineage
    # (both derive from e), so attribute-based drop/select after the join
    # is ambiguous — gap rows must keep the GRID's key, never act's NULL
    act2 = act.select(
        F.col("h").alias("ah"), F.col("event_type").alias("at"), "n", "sv"
    )
    j = (
        grid.join(
            act2,
            (F.col("h") == F.col("ah")) & (F.col("event_type") == F.col("at")),
            "left",
        )
        .select("h", "event_type", "n", "sv", "ah")
        .withColumn("ph", F.last("ah", ignorenulls=True).over(back))
        .withColumn("pv", F.last("sv", ignorenulls=True).over(back))
        .withColumn("nh", F.first("ah", ignorenulls=True).over(fwd))
        .withColumn("nv", F.first("sv", ignorenulls=True).over(fwd))
    )
    return j.select(
        (F.col("h") * HOUR_MS).alias("hour_ms"),
        "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN n IS NOT NULL THEN sv"
            "          WHEN ph IS NULL OR nh IS NULL THEN NULL"
            "          ELSE pv * (nh - ph) + (nv - pv) * (h - ph)"
            "     END AS BIGINT)"
        ).alias("interp_num"),
        F.expr(
            "CAST(CASE WHEN n IS NOT NULL THEN 1"
            "          WHEN ph IS NULL OR nh IS NULL THEN NULL"
            "          ELSE nh - ph END AS BIGINT)"
        ).alias("interp_den"),
        F.col("n").isNull().alias("is_gap"),
    ).orderBy("hour_ms", "event_type")


# --------------------------------------------------------------------------
# Exact rolling median per key (round-14).
# --------------------------------------------------------------------------
ROLLMED_FRAME = 20  # trailing rows per key (frame = 20 PRECEDING..CURRENT)


@query(
    "window_rolling_median",
    oracle=f"""
    WITH ev AS (
        -- µs-truncated ts (the round-14 ordering discipline)
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v, event_type
        FROM events
    ),
    w AS (
        SELECT event_type,
               list_sort(list(v) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLLMED_FRAME} PRECEDING AND CURRENT ROW))
                   AS vals
        FROM ev
    ),
    m AS (
        SELECT event_type,
               CAST(vals[(len(vals) + 1) // 2] AS BIGINT) AS med_cents
        FROM w
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)   AS n_rows,
           CAST(SUM(med_cents) AS BIGINT) AS sum_med_cents,
           CAST(MIN(med_cents) AS BIGINT) AS min_med_cents,
           CAST(MAX(med_cents) AS BIGINT) AS max_med_cents
    FROM m
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median per key — the robust-baseline telemetry
    primitive (a median absolute-level that outliers cannot drag, the
    companion to window_outlier_3sigma's deviation test).  Spark has NO
    native percentile window over a ROWS frame, so the median is computed
    the portable way BOTH engines can replay bit-for-bit: collect the
    trailing {ROLLMED_FRAME}+1-row frame as an array, sort it, take the
    nearest-rank lower-middle element ((n+1) div 2, 1-indexed) — exact
    BIGINT cents, no interpolation, no float tie.

    Scale: one user-keyed shuffle + one in-partition sort shared by the
    frame window (the standard keyed-window shape); per-row state is the
    O(frame)-element array, CONSTANT in corpus size — the same memory
    bound as any running window, paid per row only inside the sort
    buffer.  Output is the bounded per-class rollup (count + checksum +
    extrema of the medians), so any wrong median anywhere moves a sum."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("v"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLLMED_FRAME, Window.currentRow)
    )
    med = F.expr(
        "CAST(element_at(array_sort(vals), CAST((size(vals) + 1) div 2 AS INT))"
        " AS BIGINT)"
    )
    return (
        ev.withColumn("vals", F.collect_list("v").over(w))
        .withColumn("med_cents", med)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("med_cents").cast("long").alias("sum_med_cents"),
            F.min("med_cents").cast("long").alias("min_med_cents"),
            F.max("med_cents").cast("long").alias("max_med_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact CUSUM changepoint per key (round-14).
# --------------------------------------------------------------------------


@query(
    "window_cusum_changepoint",
    oracle="""
    WITH ev AS (
        -- µs-truncated ts (the round-14 ordering discipline)
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        FROM events
    ),
    pre AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               SUM(v) OVER w AS prefix,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
               SUM(v) OVER (PARTITION BY user_id) AS total,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    st AS (
        SELECT user_id, n, k, ms,
               ABS(n * prefix - k * total) AS stat,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ABS(n * prefix - k * total) DESC,
                                           k) AS rn
        FROM pre
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           n,
           k                        AS cp_k,
           CAST(ms AS BIGINT)       AS cp_ts_ms,
           CAST(stat AS BIGINT)     AS cusum_max
    FROM st WHERE rn = 1
    ORDER BY user_id
    """,
)
def window_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT CUSUM changepoint per key (Page 1954; the at-most-one-change
    estimator): the most likely mean-shift position in each user's value
    series is argmax_k |n·prefix_k − k·total| — the centered cumulative
    sum |Σ_{i≤k}(vᵢ − μ)| cross-multiplied by n so everything stays in
    BIGINTs (no μ division, no float drift; ties break to the EARLIEST
    k).  The drift/regime-change telemetry primitive that complements the
    rolling 3σ flags (pointwise outliers) and the KS drift test
    (distribution-level, unlocalized) with a LOCALIZED shift estimate.

    int64 bound: |n·prefix| ≤ n²·max_cents — safe while per-key series
    stay under ~2·10⁷ rows at 4-decimal-dollar values; longer series
    shift cents right first.

    Scale: ONE user-keyed shuffle; the prefix/count/total/rank windows
    all share the same partition (Spark collapses them into one sort
    pass), state per key is a running (sum, count) pair, and keys
    distribute freely — the same shape as every keyed window here.
    Output is one row per key."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("user_id")
    pre = ev.select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        F.sum("v").over(w).alias("prefix"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long")
        .alias("k"),
        F.sum("v").over(wk).alias("total"),
        F.count(F.lit(1)).over(wk).cast("long").alias("n"),
    )
    st = pre.select(
        "user_id",
        "n",
        "k",
        "ms",
        F.abs(F.col("n") * F.col("prefix") - F.col("k") * F.col("total")).alias(
            "stat"
        ),
    )
    wr = Window.partitionBy("user_id").orderBy(F.desc("stat"), "k")
    return (
        st.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "n",
            F.col("k").alias("cp_k"),
            F.col("ms").cast("long").alias("cp_ts_ms"),
            F.col("stat").cast("long").alias("cusum_max"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Exact truncated EWMA per key (round-15).
# --------------------------------------------------------------------------
EWMA_LAGS = 8  # truncation depth; alpha = 1/2 => weight 2^(LAGS-1-i) for lag i


def _ewma_lag_sql(w: str) -> str:
    return " + ".join(
        f"COALESCE(LAG(v, {i}) OVER {w}, 0) * {1 << (EWMA_LAGS - 1 - i)}"
        for i in range(EWMA_LAGS)
    )


@query(
    "window_ewma_halflife",
    oracle=f"""
    WITH ev AS (
        -- µs-truncated ts (the round-14 ordering discipline)
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        FROM events
    ),
    ew AS (
        SELECT event_type,
               {_ewma_lag_sql("w")} AS ewma_scaled
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)          AS n_rows,
           CAST(SUM(ewma_scaled) AS BIGINT)  AS sum_ewma_scaled,
           CAST(MIN(ewma_scaled) AS BIGINT)  AS min_ewma_scaled,
           CAST(MAX(ewma_scaled) AS BIGINT)  AS max_ewma_scaled
    FROM ew
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def window_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT exponentially-weighted moving average per key, α = 1/2
    (one-step half-life), TRUNCATED at {EWMA_LAGS} lags — the smoothing
    primitive telemetry/monitoring pipelines pair with the rolling median
    and the 3σ outlier test (pandas ``ewm(halflife=1)``, Prometheus-style
    smoothing), made engine-exact the fixed-point way: α = 1/2 makes lag
    i's weight the INTEGER 2^({EWMA_LAGS}-1-i), so the smoothed value is
    a pure BIGINT dot product — no float recurrence, no summation-order
    hazard, identical on any parallelism.  The value is deliberately
    emitted SCALED by the 2^{EWMA_LAGS}-1 weight mass (never divided):
    division is the consumer's choice, exactness is the engine's job.
    Truncation error vs the infinite recurrence is < 1 part in
    2^{EWMA_LAGS} of the weight mass — below the cents quantum for this
    corpus — and the truncation is part of the operator contract, not a
    silent cap.

    Scale: ONE user-keyed shuffle + one in-partition sort shared by all
    {EWMA_LAGS} LAG frames (Catalyst collapses same-spec window
    functions into one Window op); per-row state is the O(lags) ring the
    window executor keeps, constant in corpus size.  Output is the
    bounded per-class rollup (count + checksum + extrema), so any wrong
    smoothed value anywhere moves a sum."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ewma = sum(
        F.coalesce(F.lag("v", i).over(w), F.lit(0))
        * F.lit(1 << (EWMA_LAGS - 1 - i))
        for i in range(EWMA_LAGS)
    )
    return (
        ev.withColumn("ewma_scaled", ewma)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("ewma_scaled").cast("long").alias("sum_ewma_scaled"),
            F.min("ewma_scaled").cast("long").alias("min_ewma_scaled"),
            F.max("ewma_scaled").cast("long").alias("max_ewma_scaled"),
        )
        .orderBy("event_type")
    )
