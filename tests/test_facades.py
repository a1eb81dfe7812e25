"""DataStream / TableEnvironment / job-control facade tests (SURVEY §2.3,
§2.12, §2.14) — the user API a reference migrant would reach for first."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_net_spark.datastream import StreamExecutionEnvironment
from flink_net_spark.jobs import JobClient, JobManager, MetricsRecorder
from flink_net_spark.sinks import memory_sink
from flink_net_spark.sources import replay_table_as_stream
from flink_net_spark.sql import TableEnvironment
from flink_net_spark.streaming import tumbling
from flink_net_spark.tables import load_table
from tests.conftest import SF_DIR


def test_datastream_batch_pipeline(spark):
    """map → filter → key_by → reduce, batch mode, vs plain DataFrame."""
    env = StreamExecutionEnvironment(spark)
    ev = load_table(spark, SF_DIR, "events")
    out = (
        env.from_dataframe(ev)
        .map(user=F.col("user_id") % 10, etype=F.upper("event_type"), value=F.col("value"))
        .filter(F.col("value") > 10)
        .key_by("user", "etype")
        .reduce(n=F.count(F.lit(1)), total=F.round(F.sum("value"), 2))
    )
    truth = (
        ev.filter(F.col("value") > 10)
        .groupBy((F.col("user_id") % 10).alias("user"), F.upper("event_type").alias("etype"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    assert sorted(map(tuple, out.df.collect())) == sorted(map(tuple, truth.collect()))


def test_datastream_windowed_stream(spark):
    env = StreamExecutionEnvironment(spark)
    ev = load_table(spark, SF_DIR, "events")
    out = (
        env.from_dataframe(ev)
        .key_by("event_type")
        .window(tumbling("ts", "1 day"))
        .aggregate(n=F.count(F.lit(1)))
    )
    assert out.df.count() == ev.groupBy(F.window("ts", "1 day"), "event_type").count().count()


def test_datastream_watermark_assignment(spark):
    """≙ WatermarkStrategy.BoundedOutOfOrderness / ForMonotonousTimestamps
    via the facade (WatermarkManager.cs:210-275): both strategies must plant
    an EventTimeWatermark node on the plan; in batch mode the watermark is
    metadata-only so results are unchanged."""
    env = StreamExecutionEnvironment(spark)
    ev = load_table(spark, SF_DIR, "events")
    bounded = env.from_dataframe(ev).assign_timestamps_and_watermarks("ts", "30 minutes")
    mono = env.from_dataframe(ev).assign_timestamps_and_watermarks("ts")
    for ds in (bounded, mono):
        # parsed plan: the analyzer strips EventTimeWatermark on batch inputs
        plan = ds.df._jdf.queryExecution().logical().toString()
        assert "EventTimeWatermark" in plan
    assert bounded.df.count() == ev.count()


def test_datastream_shuffle_modes(spark):
    """≙ ShuffleMode Forward/Broadcast/Rescale/Hash (ShuffleMode.cs:4-10)
    as facade verbs: rescale must stay narrow (Coalesce, no exchange),
    rebalance must be a round-robin exchange, partition_by must be a hash
    exchange on the key — asserted on the physical plan, not hoped."""
    import contextlib
    import io

    env = StreamExecutionEnvironment(spark)
    ev = load_table(spark, SF_DIR, "events")

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    wide = env.from_dataframe(ev.repartition(8)).df  # start wide so 2 is a shrink
    rescaled = plan_of(env.from_dataframe(wide).rescale(2).df)
    assert "Coalesce" in rescaled

    rebalanced = plan_of(env.from_dataframe(ev).rebalance(8).df)
    assert "RoundRobinPartitioning" in rebalanced or "roundrobinpartitioning" in rebalanced.lower()

    keyed = plan_of(env.from_dataframe(ev).partition_by(8, "user_id").df)
    assert "hashpartitioning(user_id" in keyed.lower()

    # row preservation: redistribution must never change the data
    assert env.from_dataframe(ev).rescale(2).df.count() == ev.count()

    # rebalance() with no arg targets spark.sql.shuffle.partitions (the
    # documented default — DataFrame.repartition has no no-arg form)
    noarg = env.from_dataframe(ev).rebalance()
    assert "roundrobinpartitioning" in plan_of(noarg.df).lower()
    expected = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert noarg.df.rdd.getNumPartitions() == expected

    # rescale UP must actually redistribute (coalesce would silently no-op)
    small = env.from_dataframe(ev.coalesce(1))
    grown = small.rescale(4)
    assert grown.df.rdd.getNumPartitions() == 4
    assert grown.df.count() == ev.count()


def test_datastream_flatmap_union(spark):
    env = StreamExecutionEnvironment(spark)
    a = env.from_elements([("x y",)], "s STRING").flat_map("w", F.split("s", " "))
    b = env.from_elements([("z q",)], "s STRING").flat_map("w", F.split("s", " "))
    words = sorted(r.w for r in a.union(b).df.select("w").collect())
    assert words == ["q", "x", "y", "z"]


def test_stress_pipeline_shape_via_facade(spark, tmp_path):
    """The reference's flagship E2E through OUR user API: stream source →
    map → key_by → count → sink, exact-count invariant + metrics listener
    (≙ stress_test_passed_output.txt:85-104 + IFlinkMetrics)."""
    rec = MetricsRecorder().attach(spark)
    try:
        env = StreamExecutionEnvironment(spark)
        src = replay_table_as_stream(
            spark, SF_DIR, "events", str(tmp_path / "stage"), n_chunks=6, max_files_per_trigger=2
        )
        writer = (
            env.from_dataframe(src)
            .with_column("k", F.col("user_id") % 16)
            .key_by("k")
            .reduce(n=F.count(F.lit(1)))
            .add_sink(lambda df: memory_sink(df, "facade_counts", mode="complete"))
            .option("checkpointLocation", str(tmp_path / "ck"))
        )
        job = JobClient(writer.start())
        assert job.status()["is_active"]
        job.await_termination(0.5)
        job.query.processAllAvailable()
        # JobManager sees it while active
        assert any(j.job_id == job.job_id for j in JobManager(spark).list_jobs())
        job.stop()

        truth = load_table(spark, SF_DIR, "events").count()
        got = spark.table("facade_counts").agg(F.sum("n")).first()[0]
        assert got == truth
        # listener observed every input row exactly once
        import time

        deadline = time.time() + 10
        while time.time() < deadline and rec.total_input_rows(job.job_id) < truth:
            time.sleep(0.25)
        assert rec.total_input_rows(job.job_id) == truth
        assert job.job_id in rec.started
    finally:
        rec.detach(spark)


def test_table_environment_sql(spark):
    env = StreamExecutionEnvironment(spark)
    t_env = TableEnvironment.create(env)
    t_env.register_table("orders_t", load_table(spark, SF_DIR, "orders"))
    assert "orders_t" in t_env.list_tables()
    # full SQL (ORDER BY + join + subquery) — BasicSqlParser couldn't
    df = t_env.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders_t
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_t)
        GROUP BY o_orderstatus ORDER BY n DESC
        """
    )
    rows = df.collect()
    assert rows and rows[0].n >= rows[-1].n
    ds = t_env.to_datastream("orders_t")
    assert ds.df.count() == load_table(spark, SF_DIR, "orders").count()
    assert t_env.drop_table("orders_t")


def test_rebalance_no_arg_and_rescale_grow(spark):
    """ADVICE r4 regressions pinned: rebalance() with no argument must
    target the session's shuffle-partition count (repartition has no no-arg
    form), and rescale(n) with n ABOVE the current partition count must
    actually grow (coalesce alone would silently no-op)."""
    env = StreamExecutionEnvironment(spark)
    ev = load_table(spark, SF_DIR, "events")

    out = env.from_dataframe(ev).rebalance().df
    expected = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert out.rdd.getNumPartitions() == expected

    narrow = ev.coalesce(2)
    grown = env.from_dataframe(narrow).rescale(8).df
    assert grown.rdd.getNumPartitions() == 8
