"""Streaming core — SURVEY.md §2.7/§2.8: window assigners + watermarks.

Window-assigner parity (same epoch-aligned start formula
``ts - (ts - offset + size) % size`` as TimeWindow.GetWindowStartWithOffset,
FlinkDotNet/FlinkDotNet.Core.Abstractions/Windowing/TimeWindow.cs:75-95;
end-exclusive, MaxTimestamp == End-1 ≙ Spark's half-open window struct):

  - ``tumbling(ts, size[, offset])``  ≙ TumblingEventTimeWindows.Of
    (Core.Api/Windowing/TumblingEventTimeWindows.cs:29-80)
  - ``sliding(ts, size, slide[, offset])`` ≙ SlidingEventTimeWindows.Of
    (Core.Api/Windowing/SlidingEventTimeWindows.cs:7-48)
  - ``session(ts, gap)`` — superset; the reference only scaffolds merging
    (Trigger.cs:61-93, TimeWindow.Cover)
  - ``global_window()`` ≙ GlobalWindows.cs:10 — in batch, the whole keyed
    input; in streaming, custom firing via the stateful harness
    (flink_net_spark.streaming.stateful).

Watermark parity:
  - ``with_bounded_out_of_orderness(df, ts, delay)`` ≙
    MonotonicWatermarkGenerator (wm = max seen ts − delay,
    Core.Abstractions/Windowing/IWatermarkGenerator.cs:15-36) and
    WatermarkStrategy.BoundedOutOfOrderness
    (Core/Windowing/WatermarkManager.cs:210-275).  Spark advances the
    watermark per micro-batch (≙ PeriodicWatermarkGenerator) and aligns
    multi-input watermarks by min (``multipleWatermarkPolicy=min`` ≙
    WatermarkManager min-alignment, WatermarkManager.cs:55-62).
  - AllowedLateness (WindowedStream.cs:55-63): Spark keeps window state
    until wm > end + delay, i.e. lateness is folded into the watermark
    delay; rows later than that are dropped (same terminal behavior, no
    side output — parity with the reference, which never implemented side
    outputs either, IProcessWindowFunction.cs:9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(ts: str | Column, size: str, offset: str | None = None) -> Column:
    """Tumbling event-time window ≙ TumblingEventTimeWindows.Of(size[, offset])."""
    if offset is None:
        return F.window(ts, size)
    return F.window(ts, size, size, offset)


def sliding(ts: str | Column, size: str, slide: str, offset: str | None = None) -> Column:
    """Sliding event-time window ≙ SlidingEventTimeWindows.Of(size, slide)."""
    if offset is None:
        return F.window(ts, size, slide)
    return F.window(ts, size, slide, offset)


def session(ts: str | Column, gap: str | Column) -> Column:
    """Session window with static or dynamic (per-row Column) gap."""
    return F.session_window(ts, gap)


def with_bounded_out_of_orderness(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Event-time watermark: wm = max(ts) − delay per micro-batch.

    ≙ MonotonicWatermarkGenerator(outOfOrderness) — IWatermarkGenerator.cs:15-36.
    """
    return df.withWatermark(ts_col, delay)


def for_monotonous_timestamps(df: DataFrame, ts_col: str) -> DataFrame:
    """≙ WatermarkStrategy.ForMonotonousTimestamps — zero lateness bound
    (WatermarkManager.cs:210-275); Spark needs a nonzero duration, 0 seconds
    expresses the same contract."""
    return df.withWatermark(ts_col, "0 seconds")


_DUR_UNITS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _dur_seconds(dur: str) -> int:
    n, unit = dur.strip().split()
    return int(n) * _DUR_UNITS[unit.lower()]


def with_allowed_lateness(
    df: DataFrame, ts_col: str, out_of_orderness: str, lateness: str
) -> DataFrame:
    """≙ WindowedStream.AllowedLateness(Time) (Core.Api/Streaming/
    WindowedStream.cs:55-63): keep window state past the watermark so late
    events still update their pane.

    Spark folds lateness into the watermark delay: a window's state lives
    until wm > window_end + delay, so delay = out_of_orderness + lateness
    gives the same retention contract.  Semantic delta vs the reference
    (documented, not fought): the watermark itself advances more slowly, so
    on-time panes also emit later in append mode; in update mode emission
    timing is unchanged.  Rows later than the combined bound are dropped
    with no side output — parity, the reference never implemented side
    outputs either (IProcessWindowFunction.cs:9).
    """
    total = _dur_seconds(out_of_orderness) + _dur_seconds(lateness)
    return df.withWatermark(ts_col, f"{total} seconds")
