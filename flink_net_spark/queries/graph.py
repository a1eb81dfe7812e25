"""Iterative graph analytics over relational edge lists (SURVEY.md §7 ph. 6).

The reference has no graph surface at all, but a training-data engine needs
link analysis: near-dup group resolution (``dedup_resolve_groups``) is
min-label propagation, and corpus-curation ranking (which sources/documents
sit central in a citation/co-occurrence graph — the "PageRank quality
signal" CommonCrawl pipelines use for seed weighting) is power iteration on
the link matrix.  This module adds the power-iteration half as a
first-class, oracle-gated operator.

Cross-engine determinism: ranks are exact fixed-point integers (1e-6
units), every transfer is ``rank div degree`` (integer division, truncating
— identical in Spark ``div`` and DuckDB ``//`` for the nonnegative values
here), and each step sums integers — order-independent at any parallelism,
so Spark and DuckDB agree bit-for-bit with no float summation hazard (the
``emb_kmeans_iterate`` / ``emb_pca_power`` fixed-point discipline applied
to link analysis).

Scale design (the Pregel/GraphX shape): the graph lives as an edge
DataFrame; one iteration = one equi-join of edges(src) with the rank frame
(node-keyed shuffle) plus one groupBy(dst) aggregation (second shuffle) —
contributions combine map-side, so the reduce volume is one row per node.
Nothing is ever collected; iteration count is a fixed constant, so the
lineage stays bounded without checkpointing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_net_spark.queries import query
from flink_net_spark.tables import load_table, scoped_persist

# Fixed-point PageRank parameters.  Damping 0.85 as the exact integer pair
# (85, 100); rank unit 1e-6.  With N nodes total rank mass stays <= N * 1e6,
# so the hot sum `85 * SUM(contrib)` is int64-safe while N < ~1e11 nodes —
# far beyond a 100 TB corpus' key cardinality.
PAGERANK_ITERS = 4
PAGERANK_TELEPORT_E6 = 150_000  # (1 - 0.85) * 1e6, exact
PAGERANK_TOPK = 100


def _duck_pagerank_oracle() -> str:
    """Unrolled chained-CTE oracle: r0..r{ITERS} computed with the exact
    integer recurrence the Spark loop runs."""
    ctes = [
        # bipartite part<->supplier edges from lineitem, both directions;
        # node encoding 2*partkey / 2*suppkey+1 keeps the id spaces disjoint
        # e and deg are referenced by every unrolled iteration step; DuckDB
        # inlines CTEs per reference, so force one execution each
        """e AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
                                CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem)
            UNION ALL
            SELECT dst, src FROM (
                SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
                                CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem)
        )""",
        "deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)",
    ]
    for i in range(PAGERANK_ITERS):
        ctes.append(
            f"""r{i + 1} AS (
            SELECT d.node,
                   CAST({PAGERANK_TELEPORT_E6} + (85 * COALESCE(s.s, 0)) // 100
                        AS BIGINT) AS r
            FROM deg d
            LEFT JOIN (
                SELECT e.dst AS node, SUM(rd.r // rd.deg) AS s
                FROM e
                JOIN (SELECT r.node, r.r, g.deg
                      FROM r{i} r JOIN deg g ON g.node = r.node) rd
                  ON rd.node = e.src
                GROUP BY e.dst
            ) s ON s.node = d.node
        )"""
        )
    return f"""
    WITH {','.join(ctes)}
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
           node // 2            AS key,
           d.deg                AS deg,
           r.r                  AS rank_e6
    FROM r{PAGERANK_ITERS} r JOIN deg d USING (node)
    ORDER BY rank_e6 DESC, node
    LIMIT {PAGERANK_TOPK}
    """


@query("graph_pagerank", oracle=_duck_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the part<->supplier co-purchase graph —
    {PAGERANK_ITERS} power-iteration steps of r' = 0.15 + 0.85 * M r on the
    bipartite edge list derived from lineitem, entirely in exact 1e-6
    integer units (Page et al. 1999; the GraphX/Pregel message-passing
    shape re-expressed as DataFrame join + groupBy).

    Graph: distinct (l_partkey, l_suppkey) pairs, both directions, node ids
    2*partkey / 2*suppkey+1 (disjoint spaces, no collision).  Bidirectional
    edges mean every node in the degree frame both sends and receives, so
    there are no dangling-mass corrections to disagree on; the LEFT
    JOIN + COALESCE guards the recurrence anyway.

    Determinism: each step is `teleport + (85 * sum(r div deg)) div 100` —
    integer division truncates identically in Spark (`div`) and DuckDB
    (`//`), and the per-destination SUM is an integer sum, order-independent
    at any parallelism (the module-header discipline).

    Output: top-{PAGERANK_TOPK} nodes by final rank with a total tie-break
    (rank DESC, node) so the LIMIT frontier is deterministic.  Spark
    executes orderBy+limit as TakeOrderedAndProject — per-partition
    partial top-k then a driver merge of k-row heads, never a global sort.

    Scale: the edge frame is persisted once and reused by all
    {PAGERANK_ITERS} iterations; per iteration the shuffles are the
    rank-to-src equi-join and the groupBy(dst) partial-combined sum — both
    keyed on node ids, both linear in edges.  Rank state is one BIGINT per
    node.  At 1000 executors this is exactly GraphX's PageRank traffic
    pattern minus the vertex-cut optimization (which pays off only past
    ~1e9-degree skew; AQE skew-split covers the hot-node case here)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_partkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # deg is referenced twice per iteration plus once at the tail; persist it
    # so the groupBy isn't re-evaluated per reference (exchange reuse covers
    # identical subplans only within one stage graph, not across AQE replans)
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .persist()
    )
    r = deg.select("node", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(PAGERANK_ITERS):
        rd = r.join(deg, "node").select(
            F.col("node").alias("src"), F.expr("r div deg").alias("share")
        )
        s = (
            edges.join(rd, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        r = deg.join(s, "node", "left").select(
            "node",
            (
                F.lit(PAGERANK_TELEPORT_E6)
                + F.expr("(85 * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("r"),
        )
    out = (
        r.join(deg, "node")
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node div 2").alias("key"),
            F.col("deg").cast("long").alias("deg"),
            F.col("r").alias("rank_e6"),
        )
        .orderBy(
            F.desc("rank_e6"), F.expr("key * 2 + if(kind = 'supplier', 1, 0)")
        )
        .limit(PAGERANK_TOPK)
    )
    return scoped_persist(out, edges, deg)
