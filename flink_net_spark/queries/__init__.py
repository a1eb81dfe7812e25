"""Query registry: the SURVEY.md §2 operator inventory, runnable.

Every implemented operator/capability registers here as a named query:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine under test)
  - an equivalent ANSI-SQL string DuckDB can run on the same parquet views
    (the correctness oracle), or ``None`` for genuinely non-SQL-expressible
    operators (custom stateful streaming etc. — driver then does a weaker
    rows-only check).

Column names are aliased identically on both sides: the driver's comparator
sorts columns by name before value-hashing.

Float discipline: aggregate/derived doubles are rounded (2-6 dp) on BOTH
sides so bit-level summation-order differences between engines can't flip
the hash.  Timestamps are emitted as epoch millis (BIGINT) for the same
reason.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}
# Machine-readable per-query metadata.  ``scale_safe=False`` marks queries
# that are deliberately O(n²)/driver-bounded GROUND-TRUTH shapes (oracles for
# an approximate scale path) — bench harnesses, samplers, and plan audits
# consult this instead of hand-maintained exclusion lists.
META: dict[str, dict] = {}


def query(
    name: str, oracle: str | None = None, *, scale_safe: bool = True
) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query (and its DuckDB oracle SQL) under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        META[name] = {"scale_safe": scale_safe}
        return fn

    return deco


# Importing the modules populates the registry.
from flink_net_spark.queries import relational  # noqa: E402,F401
from flink_net_spark.queries import windows  # noqa: E402,F401
from flink_net_spark.queries import text  # noqa: E402,F401
from flink_net_spark.queries import dedup  # noqa: E402,F401
from flink_net_spark.queries import similarity  # noqa: E402,F401
from flink_net_spark.queries import streaming_queries  # noqa: E402,F401
from flink_net_spark.queries import llm_ops  # noqa: E402,F401
from flink_net_spark.queries import harness_ops  # noqa: E402,F401
from flink_net_spark.queries import tpch_extra  # noqa: E402,F401
from flink_net_spark.queries import pipeline_ops  # noqa: E402,F401
from flink_net_spark.queries import temporal  # noqa: E402,F401
from flink_net_spark.queries import graph  # noqa: E402,F401

# The driver's hard CORRECTNESS gate hash-checks only the first
# ``DRIVER_WINDOW`` registered queries.  Import order alone would fill that
# window entirely with batch-relational/window queries (the round-5 verdict's
# top finding: streaming/dedup/ANN/text/curation/multimodal — the engine's
# whole purpose — never got a driver-grade correctness row).  Interleave the
# registry round-robin across source modules so the window spans every
# family, with the flagship q1_pricing_summary kept first (entry() contract).
DRIVER_WINDOW = 50

# Bumped to the head of their module's queue so the driver window is
# guaranteed to contain one canonical representative per family even as
# modules grow (the round-5 verdict's named picks).  With rotation (below)
# these only decide order WITHIN the already-driver-checked remainder.
_WINDOW_PRIORITY = [
    "stream_keyed_exact_count",
    "dedup_minhash_lsh",
    "sim_ann_lsh",
    "text_gopher_filters",
    "curation_end_to_end",
    "mm_decode_stats",
    "join_asof",
    "emb_quantize_int8",
]


def _driver_checked() -> set[str]:
    """Names that already have at least one ALL-GREEN driver-grade
    CORRECTNESS row — rows_match, schema_match, hash_match all true and
    ``err`` null — across the committed CORRECTNESS_r*.json files at the
    repo root.  The window rotates toward queries without green driver
    evidence each round (round-6 verdict #4, tightened per round-8 verdict
    #2: rotate on GREEN, not on SEEN) so a failed or errored row — e.g. a
    hash mismatch, or a pre-oracle ``err: no_oracle`` row — re-enters the
    window until it actually passes.  Absent files (fresh clone) → empty
    set → the original priority interleave."""
    import glob as _glob
    import json as _json
    import os as _os

    root = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    seen: set[str] = set()
    for path in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = _json.load(f)
            for nm, row in rows.items():
                if not isinstance(row, dict):
                    continue
                if (
                    row.get("rows_match") is True
                    and row.get("schema_match") is True
                    # Oracle-less queries record hash_match null with a
                    # rows-only check; treat a clean rows+schema row with no
                    # error as green for them, but require hash_match True
                    # whenever the driver computed one.
                    and row.get("hash_match") in (True, None)
                    and row.get("err") is None
                ):
                    seen.add(nm)
        except Exception:  # pragma: no cover - a malformed artifact never breaks import
            pass
    return seen


def _interleave_families() -> None:
    by_mod: dict[str, list[str]] = {}
    for nm, fn in QUERIES.items():
        by_mod.setdefault(fn.__module__, []).append(nm)
    prio = {nm: i for i, nm in enumerate(_WINDOW_PRIORITY)}
    checked = _driver_checked()
    # Per-module queue: never-driver-checked first (rotation), then the
    # canonical priority picks, then original registration order.  The
    # round-robin across modules below preserves family spread either way.
    queues = [
        sorted(
            names,
            key=lambda nm: (nm in checked, prio.get(nm, len(prio)), names.index(nm)),
        )
        for names in by_mod.values()
    ]
    order = ["q1_pricing_summary"]
    taken = set(order)

    def take(q: list[str], want_unchecked: bool) -> str | None:
        for idx, nm in enumerate(q):
            if nm in taken:
                continue
            if want_unchecked and nm in checked:
                continue
            q.pop(idx)
            return nm
        return None

    # Phase 1 — family coverage: one pick per module (heads are
    # never-checked-first, so these rotate too where the module has any).
    for q in queues:
        nm = take(q, want_unchecked=False)
        if nm is not None:
            order.append(nm)
            taken.add(nm)
    # Phase 2 — rotation: ALL remaining never-driver-checked queries,
    # round-robin across modules, so the window fills with fresh evidence
    # rather than re-proving last round's 50.
    progressed = True
    while progressed:
        progressed = False
        for q in queues:
            nm = take(q, want_unchecked=True)
            if nm is not None:
                order.append(nm)
                taken.add(nm)
                progressed = True
    # Phase 3 — the already-checked remainder, round-robin.
    progressed = True
    while progressed:
        progressed = False
        for q in queues:
            nm = take(q, want_unchecked=False)
            if nm is not None:
                order.append(nm)
                taken.add(nm)
                progressed = True
    assert len(order) == len(QUERIES)
    for d in (QUERIES, ORACLES, META):
        reordered = {nm: d[nm] for nm in order if nm in d}
        d.clear()
        d.update(reordered)


_interleave_families()

__all__ = ["QUERIES", "ORACLES", "query", "DRIVER_WINDOW"]
