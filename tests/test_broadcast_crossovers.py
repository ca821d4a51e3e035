"""Exercise the documented broadcast→bucketed crossovers (VERDICT r5 #6).

``pagerank_bipartite`` and ``graph_triangle_count`` ship broadcast-hinted
plans (the right shape while the rank vector / edge list fits a broadcast)
with a documented fallback for the 10^8+-node regime. These tests run each
fallback for real and pin both properties the docstrings claim:

- PARITY: the bucketed shape returns exactly the rows of the broadcast
  shape (so flipping the flag at scale is purely a physical decision);
- PLAN: the fallback's physical plan has the promised structure —
  pagerank's per-round join reads the edge list from a pre-partitioned
  InMemoryRelation and exchanges only the rank vector; triangle-count's
  closing join is a ShuffledHashJoin (wedges hashed and probed, never
  sort-merge-sorted — the sort is what OOM'd at sf0.1).
"""

from __future__ import annotations

from e_commerce_click_stream_spark.plans.graph import (
    graph_triangle_count,
    pagerank_bipartite,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pagerank_bucketed_edges_matches_broadcast(spark):
    base = _rows(pagerank_bipartite(spark, SF_SMOKE))
    try:
        bucketed_df = pagerank_bipartite(spark, SF_SMOKE, bucketed_edges=True)
        plan = _plan(bucketed_df)
        assert _rows(bucketed_df) == base
        tree = plan.split("\n\n")[0]
        # the audited plan covers the FINAL round (earlier rounds sit behind
        # the rank checkpoint): the per-round join must be a shuffle-hash
        # join fed by the cached pre-partitioned edge list (the cached
        # relation's *build* plan is displayed inside InMemoryTableScan, so
        # its internal joins/exchanges appear in the text but execute once —
        # assertions target the live segment only)
        assert "ShuffledHashJoin" in tree
        assert "InMemoryTableScan" in tree
        assert "CartesianProduct" not in tree
    finally:
        spark.catalog.clearCache()  # drop the persisted edge list


def test_triangle_bucketed_close_matches_broadcast(spark):
    base = _rows(graph_triangle_count(spark, SF_SMOKE))
    bucketed_df = graph_triangle_count(spark, SF_SMOKE, bucketed_close=True)
    plan = _plan(bucketed_df)
    assert _rows(bucketed_df) == base
    tree = plan.split("\n\n")[0]
    # the closing probe is hashed, never sorted (the wedge-generation
    # self-join above it may legitimately sort-merge — it reads the
    # checkpointed oriented list twice; only the wedge STREAM must never
    # be sorted, and a ShuffledHashJoin is exactly that)
    assert "ShuffledHashJoin" in tree
    assert "CartesianProduct" not in tree


def test_pagerank_edge_checkpoint_level_size_derived(spark):
    """VERDICT r13 #5: the edge-checkpoint storage level derives from
    input size vs the session pool — small inputs keep MEMORY_AND_DISK's
    latency, inputs whose worst-case edge relation would pin more than
    PR_STORAGE_CAP_FRAC of the unified pool disk-back (the x10-probe OOM
    shape). Pins the chooser at both extremes on the live session, the
    monotone boundary itself, and that the sf0.001 run lands on the
    in-memory side (the latency-reclaim this change exists for)."""
    from pyspark.storagelevel import StorageLevel

    from e_commerce_click_stream_spark.plans.graph import (
        PR_EDGE_ROW_BYTES,
        PR_STORAGE_CAP_FRAC,
        _edge_checkpoint_level,
    )

    assert _edge_checkpoint_level(spark, 1_000) == StorageLevel.MEMORY_AND_DISK_DESER
    assert _edge_checkpoint_level(spark, 10**13) == StorageLevel.DISK_ONLY

    # boundary with 1% tolerance, not fit/fit+1 (ADVICE r14 #5: this
    # float arithmetic can land the cap exactly on a row multiple on
    # some heaps, flipping an exact fit+1 assertion host-dependently)
    heap = spark.sparkContext._jvm.Runtime.getRuntime().maxMemory()
    frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    pool = frac * (heap - 300 * 1024 * 1024)
    fit = int(PR_STORAGE_CAP_FRAC * pool / (2 * PR_EDGE_ROW_BYTES))
    assert (
        _edge_checkpoint_level(spark, int(fit * 0.99))
        == StorageLevel.MEMORY_AND_DISK_DESER
    )
    assert _edge_checkpoint_level(spark, int(fit * 1.01) + 1) == StorageLevel.DISK_ONLY

    from e_commerce_click_stream_spark.io import table

    n_li = table(spark, SF_SMOKE, "lineitem").count()
    assert _edge_checkpoint_level(spark, n_li) == StorageLevel.MEMORY_AND_DISK_DESER
