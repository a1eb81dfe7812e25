"""Async egress stage — bulk external calls with retry/timeout policy.

Reference parity: ``AsyncEgressProcessingStage`` (the reference's canonical
5-stage pipeline, Core.Api/Pipeline/IngressAndEgressStages.cs:269-546) makes
async calls to an external service per record batch, with bounded
concurrency, retry-with-backoff, and a per-call timeout.

Spark-first shape: external I/O inside a streaming plan belongs in an
Arrow-batched ``mapInPandas`` — each pandas chunk is one BULK request (the
scalable way to talk to a service from 1000 executors: thousands of
row-sized RPCs per partition would melt both sides).  Concurrency comes from
partition parallelism, not per-record futures; retry and deadline are
per-chunk client policy.  At 100 TB the stage is embarrassingly parallel and
its throughput is governed by ``batch_rows`` × partitions ÷ service latency.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame


class TransientEgressError(Exception):
    """A retryable failure from the external service (5xx, throttle, ...)."""


class EgressDeadlineExceeded(Exception):
    """The bulk call ran past ``EgressPolicy.timeout_ms`` (client deadline)."""


@dataclass
class EgressPolicy:
    """Retry/timeout/bulk-size policy ≙ the reference's egress stage config
    (retry count + timeout on IngressAndEgressStages.cs:269-546)."""

    max_retries: int = 2
    backoff_ms: int = 0  # deterministic tests keep this at 0
    timeout_ms: int = 30_000
    batch_rows: int = 10_000  # bulk request size (Arrow chunk re-slicing)


class AsyncEgressStage:
    """Bulk external-call operator: ``call(chunk, attempt) -> pd.DataFrame``.

    ``call`` performs ONE bulk request for a pandas chunk and returns the
    response rows (any row count — enrichments are usually 1:1, but 1:N
    expansions are legal).  ``TransientEgressError`` triggers a retry up to
    ``policy.max_retries``; a call that exceeds ``policy.timeout_ms`` raises
    ``EgressDeadlineExceeded`` and is retried the same way (deadline = a
    transient fault, exactly the reference's timeout-then-retry path).
    """

    def __init__(
        self,
        call: Callable[[pd.DataFrame, int], pd.DataFrame],
        response_schema: str,
        policy: EgressPolicy | None = None,
    ) -> None:
        self.call = call
        self.response_schema = response_schema
        self.policy = policy or EgressPolicy()

    def _call_once(self, chunk: pd.DataFrame, attempt: int) -> pd.DataFrame:
        t0 = time.monotonic()
        out = self.call(chunk, attempt)
        if (time.monotonic() - t0) * 1000.0 > self.policy.timeout_ms:
            raise EgressDeadlineExceeded(
                f"bulk call took longer than {self.policy.timeout_ms}ms"
            )
        return out

    def _call_with_retry(self, chunk: pd.DataFrame) -> pd.DataFrame:
        last: Exception | None = None
        for attempt in range(self.policy.max_retries + 1):
            try:
                return self._call_once(chunk, attempt)
            except (TransientEgressError, EgressDeadlineExceeded) as exc:
                last = exc
                if self.policy.backoff_ms:
                    time.sleep(self.policy.backoff_ms / 1000.0 * (2**attempt))
        raise last  # retries exhausted -> fail the task (Spark retries it)

    def transform(self, df: DataFrame) -> DataFrame:
        policy = self.policy
        call_with_retry = self._call_with_retry

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for start in range(0, len(pdf), policy.batch_rows):
                    chunk = pdf.iloc[start : start + policy.batch_rows]
                    if len(chunk):
                        yield call_with_retry(chunk)

        return df.mapInPandas(gen, schema=self.response_schema)
