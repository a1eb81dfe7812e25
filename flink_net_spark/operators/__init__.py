"""Operator harnesses: rich lifecycle, skew handling, UDAFs, multimodal, egress.

Modules:
    rich         — open/process/close lifecycle operators (per-partition init)
                   on Arrow-batched mapInPandas
    skew         — salted aggregation/join for hot keys (KeyGen load-awareness)
    udaf         — IAggregateOperator-style custom aggregates on applyInPandas
    multimodal   — opaque binary payload columns + typed metadata structs,
                   decode/feature-extract as Arrow-batched mapInPandas
    async_egress — bulk external calls with retry/backoff/deadline policy
                   (the reference's AsyncEgressProcessingStage shape)
"""

from flink_net_spark.operators import (  # noqa: F401
    async_egress,
    multimodal,
    rich,
    skew,
    udaf,
)
