"""Rich operator lifecycle — SURVEY.md §2.3 rich variants.

The reference's rich operators add ``Open(IRuntimeContext)``/``Close`` hooks
around per-record calls for expensive per-task setup (connections, lookup
tables, model loads): ``IRichMapOperator``
(FlinkDotNet/FlinkDotNet.Core.Abstractions/Operators/IRichMapOperator.cs:11),
``IRichFlatMapOperator`` (IRichFlatMapOperator.cs:10), ``IRichFilterOperator``
(IRichFilterOperator.cs:9), with the lifecycle contract in
``IOperatorLifecycle`` (IOperatorLifecycle.cs:9) and task metadata in
``IRuntimeContext`` (Context/IRuntimeContext.cs:13-85).

Spark-first mapping: the unit of task-local lifecycle is the PARTITION, not
the record.  ``rich_map_in_pandas`` wraps ``mapInPandas`` so ``open()`` runs
once per task before the first Arrow batch and ``close()`` after the last —
the setup cost amortizes over the whole partition instead of paying
per-record, and the data path stays Arrow-vectorized.  FlatMap and Filter are
the same shape: ``process`` may return more or fewer rows than it received.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


class RuntimeContext:
    """≙ IRuntimeContext (the subset meaningful under Spark: task metadata).

    State accessors live on the streaming side (``streaming.stateful``);
    here the context carries partition identity for logging/sharding.
    """

    def __init__(self, partition_id: int, attempt_number: int):
        self.partition_id = partition_id
        self.attempt_number = attempt_number


class RichFunction:
    """≙ IRichMapOperator / IRichFlatMapOperator / IRichFilterOperator.

    Subclass and override:
      - ``open(ctx)``  — once per task, before any data (≙ Open)
      - ``process(pdf)`` — an Arrow batch in, a DataFrame out; return fewer
        rows for Filter semantics, more for FlatMap
      - ``close()`` — once per task, after the last batch (≙ Close); runs
        even if ``process`` raised
    """

    def open(self, ctx: RuntimeContext) -> None:  # noqa: A003
        pass

    def process(self, pdf: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError

    def close(self) -> None:
        pass


def rich_map_in_pandas(
    df: DataFrame, factory: Callable[[], RichFunction], schema: str
) -> DataFrame:
    """Run a ``RichFunction`` over every partition with open/close lifecycle.

    ``factory`` (not an instance) ships to executors so each task constructs
    its own function object — no accidentally-shared driver state, matching
    the reference's per-subtask operator instantiation
    (LocalStreamExecutor.cs:171-188).
    """
    from flink_net_spark.session import ship_package_to_executors

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        ctx = RuntimeContext(
            partition_id=tc.partitionId() if tc else -1,
            attempt_number=tc.attemptNumber() if tc else 0,
        )
        fn = factory()
        fn.open(ctx)
        try:
            for pdf in batches:
                out = fn.process(pdf)
                if out is not None and len(out):
                    yield out
        finally:
            fn.close()

    ship_package_to_executors(df.sparkSession)
    return df.mapInPandas(gen, schema)
