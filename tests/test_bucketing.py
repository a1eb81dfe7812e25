"""Batch layout sinks: partition pruning and exchange-free bucketed joins.

The 100 TB claims these tests pin down:
  - a filter on a partition column must become a PartitionFilter (directory
    pruning), not a row filter;
  - two tables bucketed identically on the join key must sort-merge join
    with ZERO Exchange nodes — the shuffle was pre-paid at write time.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from flink_net_spark.sinks import write_bucketed, write_partitioned
from flink_net_spark.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    p = _plan(back)
    assert "PartitionFilters" in p and "event_type" in p.split("PartitionFilters", 1)[1].split("\n")[0]
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_bucketed_join_no_exchange(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(o, "o_b", str(tmp_path / "o_b"), ["o_orderkey"], 8, ["o_orderkey"])
    try:
        # force a non-broadcast join so the bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = _plan(joined)
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        # and it computes the right thing
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_compact_parquet_flat_and_partitioned(spark, tmp_path):
    """Compaction must cut the file count toward ceil(disk/target), keep
    every row bit-identical, and preserve a partitioned directory layout."""
    from flink_net_spark.sinks import compact_parquet

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", F.col("value")
    )
    n_rows = ev.count()

    # flat layout: fragment into many tiny files first
    flat = str(tmp_path / "flat")
    ev.repartition(64).write.parquet(flat)
    before = sum(1 for f in __import__("pathlib").Path(flat).rglob("*.parquet"))
    assert before >= 32
    n_after = compact_parquet(spark, flat, target_file_bytes=1 << 30)
    assert n_after == 1, n_after
    back = spark.read.parquet(flat)
    assert back.count() == n_rows
    assert back.agg(F.sum(F.hash("event_id", "event_type"))).first()[0] == ev.agg(
        F.sum(F.hash("event_id", "event_type"))
    ).first()[0]

    # partitioned layout: structure must survive, pruning must still work
    part = str(tmp_path / "part")
    ev.repartition(16).write.partitionBy("event_type").parquet(part)
    compact_parquet(spark, part, target_file_bytes=1 << 30,
                    partition_cols=["event_type"])
    import os
    assert any(d.startswith("event_type=") for d in os.listdir(part)), os.listdir(part)
    back2 = spark.read.parquet(part)
    assert back2.count() == n_rows


def test_compact_parquet_crash_recovery(spark, tmp_path):
    """The crash-safety envelope, point by point (round-6; ADVICE r5):
    (a) crash BEFORE the swap (staging written, path untouched) — rerun
    compacts normally; (b) crash BETWEEN the two swap renames (data parked
    at ._precompact, nothing at path) — rerun restores the backup first,
    then compacts; (c) crash AFTER the swap but before cleanup (new data
    at path AND backup present) — rerun raises instead of silently
    deleting either copy."""
    import os
    import shutil

    from flink_net_spark.sinks import compact_parquet

    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    n_rows = ev.count()

    def fresh(name: str) -> str:
        p = str(tmp_path / name)
        ev.repartition(8).write.parquet(p)
        return p

    # (a) staging leftover, source intact
    p = fresh("a")
    ev.repartition(2).write.parquet(p + "._compacting")
    assert compact_parquet(spark, p, target_file_bytes=1 << 30) == 1
    assert spark.read.parquet(p).count() == n_rows
    assert not os.path.exists(p + "._compacting") or not os.listdir(
        p + "._compacting"
    )

    # (b) the non-atomic window: path renamed away, staging ready — a crash
    # right between os.rename(path, backup) and os.rename(staging, path)
    p = fresh("b")
    ev.repartition(1).write.parquet(p + "._compacting")
    os.rename(p, p + "._precompact")
    assert not os.path.exists(p)
    assert compact_parquet(spark, p, target_file_bytes=1 << 30) == 1
    assert spark.read.parquet(p).count() == n_rows
    assert not os.path.exists(p + "._precompact")

    # (c) both live: post-swap, pre-cleanup crash — must refuse
    p = fresh("c")
    shutil.copytree(p, p + "._precompact")
    try:
        compact_parquet(spark, p, target_file_bytes=1 << 30)
        raise AssertionError("expected RuntimeError on leftover backup")
    except RuntimeError as ex:
        assert "._precompact" in str(ex) or "precompact" in str(ex), ex
    # both copies untouched by the refusal
    assert spark.read.parquet(p).count() == n_rows
    assert spark.read.parquet(p + "._precompact").count() == n_rows
