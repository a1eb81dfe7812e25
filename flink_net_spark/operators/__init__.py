"""Training-data-pipeline operators: multimodal payloads and custom UDAFs.

Modules:
    multimodal — opaque binary payload columns + typed metadata structs,
                 decode/feature-extract as Arrow-batched mapInPandas
    udaf       — IAggregateOperator-style custom aggregates on applyInPandas
"""

from flink_net_spark.operators import multimodal, udaf  # noqa: F401
