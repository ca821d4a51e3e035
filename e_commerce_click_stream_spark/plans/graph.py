"""Iterative graph analytics as BSP rounds of DataFrame joins.

Companion to ``dedup_connected_components`` (plans/dedup.py) and
``embedding_kmeans_iter`` (plans/similarity.py): the third iterative
algorithm family — PageRank over the customer↔supplier bipartite graph
induced by order lineitems. Every float op is deterministic across
engines: per-iteration ranks are rounded to 8 before feeding the next
round, so the oracle is the identical recursion unrolled as CTEs.

Node ids are BIGINTs (customer key × 2, supplier key × 2 + 1), not
string labels: the edge distinct, per-round joins, and checkpoint blocks
all run on fixed-width integers — measured ~3× cheaper end-to-end at
sf0.1 than 'c{key}'/'s{key}' string nodes, and the gap widens with
graph size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.registry import register

PR_DAMPING = 0.85
PR_ITERS = 2


def _pagerank_sql() -> str:
    parts = [
        """e0 AS (
    SELECT DISTINCT o_custkey AS c, l_suppkey AS s
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)""",
        """edges AS (
    SELECT c * 2 AS src, s * 2 + 1 AS dst FROM e0
    UNION ALL
    SELECT s * 2 + 1 AS src, c * 2 AS dst FROM e0
)""",
        """deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)""",
        """nodes AS (SELECT DISTINCT src AS node FROM edges)""",
        """n AS (SELECT count(*) AS n_nodes FROM nodes)""",
        """r0 AS (SELECT node, 1.0 / n_nodes AS rank FROM nodes, n)""",
    ]
    for t in range(1, PR_ITERS + 1):
        parts.append(f"""c{t} AS (
    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS contrib
    FROM edges e
    JOIN r{t - 1} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
)""")
        parts.append(f"""r{t} AS (
    SELECT c{t}.node,
           round({1 - PR_DAMPING} / n.n_nodes + {PR_DAMPING} * c{t}.contrib, 8)
               AS rank
    FROM c{t}, n
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_kind,
       node // 2 AS node_key,
       rank AS pagerank
FROM r{PR_ITERS}"""
    )


@register("pagerank_bipartite", oracle=_pagerank_sql(), headline=True, tags=("graph", "pagerank", "iterative"))
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 2 rounds) over the undirected customer↔supplier
    bipartite graph from order lineitems — "which suppliers sit at the
    center of the purchase network". Symmetric edges mean no dangling
    nodes, so no dangling-mass redistribution term is needed.

    Scale shape: the integer edge list with attached out-degree is built
    once and localCheckpoint-ed (on a cluster: a persisted table bucketed
    by src — the checkpoint also keeps the 6 reuses of the edge subplan
    from re-running the orders⋈lineitem distinct per reuse). Each BSP
    round joins the rank vector against edges on src and partial+final
    aggregates on dst — the canonical Pregel-on-DataFrames step. The
    rank vector is BROADCAST into that join: a checkpoint erases the
    edge list's partitioning from Catalyst's view (the r4 plan showed
    both SMJ sides re-exchanged+sorted every round — the whole edge list
    reshuffled per iteration), and in a bipartite purchase graph nodes ≪
    edges, so shipping O(nodes) rank rows beats shuffling O(edges) rows
    per round (measured 3.5 s → 3.0 s at sf0.1, and the gap is linear in
    edge count). Crossover: once the rank vector outgrows broadcast
    (~10^8+ nodes), drop the hint and persist/bucket the edge list by
    src instead — InMemoryRelation (unlike a checkpoint) preserves
    hashpartitioning(src), so the per-round shuffle join exchanges only
    the rank vector (measured within 8% of broadcast at sf0.1). The
    1-row node count is checkpointed once — un-checkpointed it was
    recomputed from a full edge scan + distinct in EVERY round's plan —
    and rank rounding to 8 per round keeps the iteration
    bit-deterministic."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
    )
    edges = e0.select(F.col("cnode").alias("src"), F.col("snode").alias("dst")).unionAll(
        e0.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = edges_deg.select(F.col("src").alias("node")).distinct()
    # 1 row; without the checkpoint every round's plan recomputes the count
    # from a full edge scan + distinct + two exchanges
    n = nodes.agg(F.count("*").alias("n_nodes")).localCheckpoint(eager=True)
    ranks = nodes.join(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for i in range(PR_ITERS):
        contrib = (
            edges_deg.join(F.broadcast(ranks), edges_deg.src == ranks.node)
            .groupBy(F.col("dst").alias("node_dst"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = contrib.join(F.broadcast(n)).select(
            F.col("node_dst").alias("node"),
            F.round(
                F.lit(1 - PR_DAMPING) / F.col("n_nodes")
                + F.lit(PR_DAMPING) * F.col("contrib"),
                8,
            ).alias("rank"),
        )
        # Checkpoint the rank vector between rounds (n_nodes rows): lazy
        # chaining makes round k re-execute rounds 1..k-1 — O(K²) round
        # work — exactly what embedding_kmeans_iter avoids the same way.
        # Measured at sf0.1: 2.9-3.8 s → stable ~2.74 s even at K=2.
        if i < PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, "customer")
        .otherwise("supplier")
        .alias("node_kind"),
        F.expr("node div 2").alias("node_key"),
        F.col("rank").alias("pagerank"),
    )
