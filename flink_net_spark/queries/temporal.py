"""Temporal join operators: as-of join and conversion funnel.

The brief's canonical "operator Spark lacks" examples — an as-of join has no
built-in DataFrame verb (Spark 4 has no ASOF JOIN), so it is re-expressed as
a composition of existing ops: union both sides into one frame and take the
running ``last`` of the right-side timestamp over an event-time window — ONE
shuffle on the key, no per-row probe, no range-join explosion.  DuckDB's
native ``ASOF JOIN`` is the oracle, so the composition is verified against a
first-class implementation of the semantics.

(The reference has no temporal-join surface at all; its only join is an
interface without a runtime — IJoinFunction.cs:18-28.  These are
engine-native extensions, SURVEY.md §2.6 "absent" row.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_net_spark.queries import query
from flink_net_spark.tables import load_table

WEEK_MS = 7 * 24 * 3_600_000


@query(
    "join_asof",
    oracle="""
    -- CAST(ts AS TIMESTAMP) truncates DuckDB's ns to the same µs Spark
    -- sees (load_table's ns div 1000) so the ASOF comparison can never
    -- diverge on a sub-µs-distinct pair (round-14 ADVICE sweep).
    SELECT v.event_id, v.user_id,
           CAST(epoch_ms(v.ts) AS BIGINT) AS ts_ms,
           CAST(epoch_ms(c.ts) AS BIGINT) AS asof_click_ms
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND v.ts >= c.ts
    ORDER BY v.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every 'view' event picks the most recent 'click' by the
    same user at-or-before its timestamp.

    Scalable shape: instead of a range join (quadratic per key) or a
    per-row lookup, both sides stack into ONE frame partitioned by user and
    sorted by (ts, right-before-left); the running
    ``last(click_ts, ignorenulls)`` over rows-unbounded-preceding IS the
    as-of match.  Cost: one shuffle on user_id + one sort — the same plan
    shape at any scale, and the sort is within-partition (no global sort).
    Equal timestamps match (right sorts first at a tie).  Only the matched
    TIMESTAMP is emitted, so duplicate right rows at the same (user, ts)
    cannot make the result ambiguous."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    is_right = F.col("event_type") == "click"
    stacked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_right, F.col("ts")).alias("rts"),
        F.when(is_right, 0).otherwise(1).alias("side"),  # right first on tie
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stacked.withColumn("asof_ts", F.last("rts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.unix_millis("asof_ts").alias("asof_click_ms"),
        )
        .orderBy("event_id")
    )


@query(
    "funnel_conversion",
    oracle=f"""
    WITH ev AS (
        -- µs-truncated ts (round-14 ADVICE sweep): the >= step comparison
        -- must see the same µs values Spark does.
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    first_signup AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM ev
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    converted AS (
        SELECT DISTINCT f.user_id
        FROM first_signup f
        JOIN ev p
          ON p.user_id = f.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= f.signup_ts
         AND epoch_ms(p.ts) - epoch_ms(f.signup_ts) <= {WEEK_MS}
    )
    SELECT CAST((SELECT COUNT(*) FROM first_signup) AS BIGINT) AS n_signup_users,
           CAST((SELECT COUNT(*) FROM converted) AS BIGINT)    AS n_converted
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users whose first signup is followed by a purchase
    within 7 days.  The time-bounded step join is a LEFT-SEMI join with a
    range residual on the (already aggregated) first-signup frame — the
    fact table shuffles once per step on user_id and only user_ids flow
    between steps; an N-step funnel chains N semi joins on the same key
    (one co-partitioned shuffle series, AQE-planned)."""
    ev = load_table(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = first_signup.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("signup_ts"))
        & (
            F.unix_millis("p_ts") - F.unix_millis("signup_ts") <= WEEK_MS
        ),
        "left_semi",
    )
    return first_signup.agg(
        F.count(F.lit(1)).alias("n_signup_users")
    ).crossJoin(F.broadcast(converted.agg(F.count(F.lit(1)).alias("n_converted"))))


@query(
    "pattern_absence_timeout",
    oracle="""
    SELECT c.user_id,
           COUNT(*) AS n_unanswered_clicks,
           CAST(MIN(epoch_ms(c.ts)) AS BIGINT) AS first_unanswered_ms
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id
          AND p.event_type = 'purchase'
          AND epoch_ms(p.ts) >= epoch_ms(c.ts)
          AND epoch_ms(p.ts) <  epoch_ms(c.ts) + 3600000
      )
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
)
def pattern_absence_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP absence pattern (the timeout-alert shape: A happened and B did
    NOT follow within the horizon): clicks with no purchase by the same
    user in the next hour.  The streaming form of this is a per-key
    event-time timer that fires when the deadline passes unanswered
    (≙ ITimerService.cs:11 — covered by the applyInPandasWithState timer
    tests); the batch form is a time-bounded LEFT ANTI join, which is the
    exact negation of stream_stream_interval_join's match set.

    Scale: equi-key anti join on user_id with a residual time predicate —
    one keyed shuffle, state bounded by the horizon in the streaming form.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    unanswered = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.unix_millis("p_ts") >= F.unix_millis("c_ts"))
        & (F.unix_millis("p_ts") < F.unix_millis("c_ts") + 3_600_000),
        "left_anti",
    )
    return (
        unanswered.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_unanswered_clicks"),
            F.min(F.unix_millis("c_ts")).alias("first_unanswered_ms"),
        )
        .orderBy("user_id")
    )


RANGE_JOIN_WINDOW_DAYS = 7
_RJ_MONTH_START, _RJ_MONTH_END = "1996-03-01", "1996-04-01"


@query(
    "join_range_bucketed",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT)          AS n_shipped,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL {RANGE_JOIN_WINDOW_DAYS} DAY
    WHERE o.o_orderdate >= TIMESTAMP '{_RJ_MONTH_START}'
      AND o.o_orderdate < TIMESTAMP '{_RJ_MONTH_END}'
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join at scale: for each March-1996 order,
    count global shipments inside its 7-day fulfilment window.

    Spark has no IEJoin — a naive ``ON point BETWEEN lo AND hi`` plans as
    BroadcastNestedLoop (quadratic).  The scale path COARSE-BUCKETS time:
    each interval explodes into the weekly buckets it overlaps (≤2 here —
    ceil(window/bucket)+1 in general, a small constant), each point maps to
    exactly one bucket, and the join becomes an EQUI-join on the bucket id
    refined by the exact range predicate.  Buckets partition the timeline,
    so a (point, interval) match lands in exactly one bucket — no dedup
    pass needed.  Cost: one hash shuffle on the bucket id over rows
    replicated ×(buckets-per-interval); never quadratic, and AQE sees an
    ordinary equi-join it can size.  (Same trick generalises to interval
    overlap joins; bucket width tunes replication vs selectivity.)"""
    bucket_s = RANGE_JOIN_WINDOW_DAYS * 86_400  # bucket width = window width
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_RJ_MONTH_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_RJ_MONTH_END).cast("timestamp"))
        )
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("lo_s"),
            (
                F.unix_timestamp("o_orderdate")
                + F.lit(RANGE_JOIN_WINDOW_DAYS * 86_400)
            ).alias("hi_s"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("lo_s") / bucket_s).cast("long"),
                    ((F.col("hi_s") - 1) / bucket_s).cast("long"),
                )
            ),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.unix_timestamp("l_shipdate").alias("ship_s"),
        F.col("l_quantity"),
    ).withColumn("bucket", (F.col("ship_s") / bucket_s).cast("long"))
    return (
        o.join(
            li,
            (o.bucket == li.bucket)
            & (F.col("ship_s") >= F.col("lo_s"))
            & (F.col("ship_s") < F.col("hi_s")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "cdc_scd2_versions",
    oracle="""
    WITH ev AS (
        -- µs-truncate: Spark sees ns→µs integer-div timestamps (load_table),
        -- so the oracle must sort on the SAME precision — a sub-µs-distinct
        -- event pair would otherwise order differently cross-engine
        -- (round-12 ADVICE; DuckDB NS→TIMESTAMP cast truncates like div 1000)
        SELECT user_id, event_type AS status,
               CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
    ),
    ch AS (
        SELECT user_id, status, ts, event_id,
               LAG(status) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
        FROM ev
    ),
    v AS (
        SELECT user_id, status, ts,
               CAST(ROW_NUMBER() OVER w AS BIGINT)      AS version_no,
               LEAD(ts) OVER w                          AS next_ts
        FROM ch
        WHERE prev IS NULL OR prev <> status
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(user_id AS BIGINT)        AS user_id,
           version_no,
           status,
           CAST(epoch_ms(ts) AS BIGINT)   AS valid_from_ms,
           CAST(epoch_ms(next_ts) AS BIGINT) AS valid_to_ms,
           next_ts IS NULL                AS is_current
    FROM v
    ORDER BY user_id, version_no
    """,
)
def cdc_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream — the
    CDC companion to ``stream_cdc_upsert_snapshot`` (which keeps only the
    LATEST state): collapse consecutive duplicate states per key (a true
    SCD2 opens a version only when the tracked attribute CHANGES), then
    stamp each surviving change with [valid_from, valid_to) from the next
    change's timestamp, version numbers, and an is_current flag — the
    standard warehouse dimension-history build (Kimball type 2).

    Determinism: the per-key order is the total (ts, event_id) order, so
    lag-dedup, version numbering, and interval stamping are all exact;
    timestamps leave as epoch-ms BIGINTs (the module discipline), the
    open interval as a NULL valid_to + is_current marker.

    Scale: ONE user-keyed shuffle — the lag filter, row_number, and lead
    all share the same (partition, order) spec, which Spark collapses
    into a single sort + Window pass; state per key is one row of
    look-behind/ahead.  At 100 TB this is the canonical merge-on-read
    CDC compaction shape: keys distribute freely, nothing is global."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("status"), "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id", "status", "ts", "event_id", F.lag("status").over(w).alias("prev")
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
    v = ch.select(
        "user_id",
        "status",
        "ts",
        F.row_number().over(w).cast("long").alias("version_no"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return v.select(
        F.col("user_id").cast("long").alias("user_id"),
        "version_no",
        "status",
        F.expr("CAST(unix_millis(ts) AS BIGINT)").alias("valid_from_ms"),
        F.expr("CAST(unix_millis(next_ts) AS BIGINT)").alias("valid_to_ms"),
        F.col("next_ts").isNull().alias("is_current"),
    ).orderBy("user_id", "version_no")


@query(
    "join_asof_nearest",
    oracle="""
    -- µs-truncated ts on both sides (round-14 ADVICE sweep: match
    -- Spark's ns-div-1000 µs timestamps in every ordering/comparison).
    WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click'),
    back AS (
        SELECT v.event_id, v.user_id, v.ts, c.ts AS bts
        FROM v ASOF LEFT JOIN c
          ON v.user_id = c.user_id AND v.ts >= c.ts
    ),
    fwd AS (
        SELECT v.event_id, c.ts AS fts
        FROM v ASOF LEFT JOIN c
          ON v.user_id = c.user_id AND v.ts <= c.ts
    )
    SELECT b.event_id,
           CAST(b.user_id AS BIGINT)      AS user_id,
           CAST(epoch_ms(b.ts) AS BIGINT) AS ts_ms,
           CAST(epoch_ms(CASE
               WHEN f.fts IS NULL THEN b.bts
               WHEN b.bts IS NULL THEN f.fts
               WHEN epoch_ms(b.ts) - epoch_ms(b.bts)
                    <= epoch_ms(f.fts) - epoch_ms(b.ts) THEN b.bts
               ELSE f.fts END) AS BIGINT) AS nearest_click_ms
    FROM back b JOIN fwd f ON f.event_id = b.event_id
    ORDER BY b.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event as-of join — every 'view' picks the 'click' by the
    same user closest in time in EITHER direction (ties go backward),
    the sensor-alignment semantic (pandas ``merge_asof
    direction='nearest'``) that neither Spark nor the reference has a
    verb for.

    Composition: the ``join_asof`` stacked-frame trick run BOTH ways over
    the same user-keyed sort — running ``last`` over the preceding frame
    gives the backward candidate, running ``first`` over the following
    frame the forward candidate, and a constant-width projection picks
    the nearer.  A same-instant click is the backward candidate at
    distance zero (right sorts before left on ties), so the pick is
    total with no double-count.

    Scale: identical to join_asof — ONE shuffle on user_id, one
    within-partition sort feeding both window directions (same spec, two
    frames), no range-join explosion, no per-row probe; the same plan at
    any corpus size."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    is_right = F.col("event_type") == "click"
    stacked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_right, F.col("ts")).alias("rts"),
        F.when(is_right, 0).otherwise(1).alias("side"),
    )
    base = Window.partitionBy("user_id").orderBy("ts", "side")
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return (
        stacked.withColumn("bts", F.last("rts", ignorenulls=True).over(back))
        .withColumn("fts", F.first("rts", ignorenulls=True).over(fwd))
        .filter(F.col("event_type") == "view")
        .select(
            "event_id",
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_millis("ts").alias("ts_ms"),
            F.expr(
                "CAST(CASE"
                " WHEN fts IS NULL THEN unix_millis(bts)"
                " WHEN bts IS NULL THEN unix_millis(fts)"
                " WHEN unix_millis(ts) - unix_millis(bts)"
                "      <= unix_millis(fts) - unix_millis(ts)"
                " THEN unix_millis(bts)"
                " ELSE unix_millis(fts) END AS BIGINT)"
            ).alias("nearest_click_ms"),
        )
        .orderBy("event_id")
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH ev AS (
        -- µs-truncate for cross-engine sort parity (see cdc_scd2_versions)
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
    ),
    ch AS (
        SELECT user_id, event_type AS status, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM ev
    ),
    ver AS (
        SELECT user_id, status, ts AS valid_from,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                   AS version_no
        FROM ch WHERE prev IS NULL OR prev <> status
    ),
    pur AS (
        SELECT event_id, user_id, ts FROM ev
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id,
           CAST(p.user_id AS BIGINT)      AS user_id,
           CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
           v.status                       AS status_at_purchase,
           v.version_no                   AS version_no
    FROM pur p
    ASOF LEFT JOIN ver v
      ON p.user_id = v.user_id AND p.ts >= v.valid_from
    ORDER BY p.event_id
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-CORRECT dimension join — the feature-store primitive
    that keeps training data leak-free (Feast/Tecton's `point_in_time_
    join`): every purchase picks the SCD2 status version that was valid
    AT its timestamp, never a later one.  Composes ``cdc_scd2_versions``
    (the version build: lag-dedup of the per-user status stream) with the
    ``join_asof`` stacked-frame match against version START times — a
    version valid at t is the last version starting at-or-before t, so no
    interval predicate and no range-join explosion is needed.

    Determinism: version rows sort before purchases at an equal
    timestamp (side 0 < 1), so a purchase that IS its user's first event
    matches the version it opened — valid_from inclusive, the standard
    SCD2 convention — and the (ts, side, version) order is total.

    Scale: the version build and the match share ONE user-keyed shuffle
    and one within-partition sort (the stacked frame carries both row
    kinds); state per key is a single running (status, version) pair.
    This is the shape that survives a 100 TB fact table: fact rows never
    join against an exploded interval set, they ride the same keyed sort
    the dimension history already needs."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("event_type").alias("status"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ver = (
        ev.select(
            "user_id", "status", "ts", "event_id",
            F.lag("status").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
        .select(
            "user_id",
            "status",
            F.col("ts").alias("vts"),
            F.row_number().over(w).cast("long").alias("version_no"),
        )
    )
    pur = ev.filter(F.col("status") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    stacked = ver.select(
        "user_id",
        F.col("vts").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct("status", "version_no").alias("vrec"),
        F.lit(0).alias("side"),
    ).unionByName(
        pur.select(
            "user_id",
            "ts",
            "event_id",
            F.lit(None)
            .cast("struct<status:string,version_no:bigint>")
            .alias("vrec"),
            F.lit(1).alias("side"),
        )
    )
    # (ts, side) alone is not a total key: two versions opened at one
    # (user, µs) instant would make last(vrec) nondeterministic (round-12
    # ADVICE — impossible on the current corpus, guarded anyway).
    # version_no orders same-instant versions (latest wins, the SCD2
    # convention); event_id orders same-instant purchases (side-1 rows,
    # where vrec/version_no is NULL and ties on it).
    m = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.col("vrec.version_no"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stacked.withColumn("cur", F.last("vrec", ignorenulls=True).over(m))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_millis("ts").alias("ts_ms"),
            F.col("cur.status").alias("status_at_purchase"),
            F.col("cur.version_no").alias("version_no"),
        )
        .orderBy("event_id")
    )


OVERLAP_BUCKET_DAYS = 14  # >= the widest right-side interval


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey,
               epoch(o_orderdate)                    AS lo_a,
               epoch(o_orderdate) + 7 * 86400        AS hi_a
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_RJ_MONTH_START}'
          AND o_orderdate <  TIMESTAMP '{_RJ_MONTH_END}'
    ),
    b AS (
        SELECT epoch(l_shipdate)                                  AS lo_b,
               epoch(l_shipdate) + (1 + l_orderkey % 14) * 86400  AS hi_b,
               l_quantity
        FROM lineitem
    )
    SELECT a.o_orderkey,
           CAST(COUNT(*) AS BIGINT)          AS n_overlap,
           CAST(SUM(b.l_quantity) AS BIGINT) AS sum_qty
    FROM a JOIN b
      ON a.lo_a < b.hi_b AND b.lo_b < a.hi_a
    GROUP BY a.o_orderkey
    ORDER BY a.o_orderkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join (interval × interval, the general form of
    ``join_range_bucketed``'s point-in-interval): for each March-1996
    order's 7-day fulfilment window, count the shipment TRANSIT WINDOWS
    ([l_shipdate, +1..14 days) — width varies per row) that overlap it.
    The overlap predicate lo_a < hi_b AND lo_b < hi_a has no equi-key, so
    a naive join plans as BroadcastNestedLoop (quadratic).

    Scale path — coarse buckets with OWNER-BUCKET dedup: each interval
    explodes into the {OVERLAP_BUCKET_DAYS}-day buckets it covers (≤ 2
    per side here; ceil(width/bucket)+1 in general), the join becomes an
    EQUI-join on the bucket id refined by the exact overlap predicate,
    and — because two overlapping intervals can share SEVERAL buckets —
    each pair is counted exactly once by keeping only the bucket that
    contains max(lo_a, lo_b): both intervals contain that instant (it is
    below both hi's by the overlap predicate), so its bucket is on both
    explode lists, and it is unique per pair.  No distinct pass, no
    double counting; AQE sees an ordinary equi-join.  (DuckDB's native
    IEJoin is the oracle, so the bucket composition is verified against a
    first-class range-join implementation.)

    Determinism: all arithmetic in exact epoch seconds (integer div for
    bucket ids, nonnegative epochs → trunc = floor both engines)."""
    W = OVERLAP_BUCKET_DAYS * 86_400
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_RJ_MONTH_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_RJ_MONTH_END).cast("timestamp"))
        )
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("lo_a"),
            (F.unix_timestamp("o_orderdate") + 7 * 86_400).alias("hi_a"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"lo_a div {W}"), F.expr(f"(hi_a - 1) div {W}")
                )
            ),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.unix_timestamp("l_shipdate").alias("lo_b"),
            (
                F.unix_timestamp("l_shipdate")
                + (1 + F.col("l_orderkey") % 14) * 86_400
            ).alias("hi_b"),
            "l_quantity",
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"lo_b div {W}"), F.expr(f"(hi_b - 1) div {W}")
                )
            ),
        )
    )
    return (
        o.join(
            li,
            (o.bucket == li.bucket)
            & (F.col("lo_a") < F.col("hi_b"))
            & (F.col("lo_b") < F.col("hi_a"))
            & (o.bucket == F.expr(f"greatest(lo_a, lo_b) div {W}")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


# -- as-of join with a match tolerance (round-15) ---------------------------
ASOF_TOLERANCE_MS = 1_800_000  # 30 min lookback cap


@query(
    "join_asof_tolerance",
    oracle=f"""
    -- CAST(ts AS TIMESTAMP) truncates DuckDB's ns to the same µs Spark
    -- sees (the round-14 ordering discipline).  Tolerance composes with
    -- plain ASOF: the most recent click is the closest one, so if IT
    -- falls outside the window no earlier click can fall inside —
    -- asof-then-filter IS most-recent-within-tolerance.
    SELECT v.event_id, v.user_id,
           CAST(epoch_ms(v.ts) AS BIGINT) AS ts_ms,
           CASE WHEN epoch_ms(v.ts) - epoch_ms(c.ts) <= {ASOF_TOLERANCE_MS}
                THEN CAST(epoch_ms(c.ts) AS BIGINT) END AS asof_click_ms,
           CASE WHEN epoch_ms(v.ts) - epoch_ms(c.ts) <= {ASOF_TOLERANCE_MS}
                THEN CAST(epoch_ms(v.ts) - epoch_ms(c.ts) AS BIGINT) END
               AS lag_ms
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND v.ts >= c.ts
    ORDER BY v.event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH A LOOKBACK TOLERANCE (pandas ``merge_asof(...,
    tolerance=...)``, kdb ``wj``, QuestDB ``ASOF JOIN ... TOLERANCE`` —
    the attribution-window shape: a click only explains a view within 30
    minutes): every 'view' picks the most recent same-user 'click'
    at-or-before it, but the match is kept ONLY if it lies within
    {ASOF_TOLERANCE_MS} ms; stale matches report NULL, and the matched
    lag rides the row.

    Tolerance composes with the stacked-frame as-of (join_asof): the
    running ``last(click_ts, ignorenulls)`` is the NEAREST preceding
    click, so one post-predicate implements the window — no second join,
    no range join.  Cost is IDENTICAL to join_asof: one user_id shuffle +
    one within-partition sort, the same plan at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    is_right = F.col("event_type") == "click"
    stacked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_right, F.col("ts")).alias("rts"),
        F.when(is_right, 0).otherwise(1).alias("side"),  # right first on tie
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lag = F.unix_millis("ts") - F.unix_millis("asof_ts")
    in_tol = lag <= ASOF_TOLERANCE_MS
    return (
        stacked.withColumn("asof_ts", F.last("rts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.when(in_tol, F.unix_millis("asof_ts")).alias("asof_click_ms"),
            F.when(in_tol, lag).alias("lag_ms"),
        )
        .orderBy("event_id")
    )
