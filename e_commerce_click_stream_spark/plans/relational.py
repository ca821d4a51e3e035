"""Relational capability set over the TPC-H-ish star schema.

The reference implements zero joins in its Spark job (SURVEY.md §2.3) but its
schema and SQL-consumer layer imply a standard relational surface; this
module provides it as named queries: multi-way equi joins (broadcast for
dims), semi/anti joins, analytic windows (ranking, lag, running frames),
rollup, pivot, set ops, and scalar string/date/math function coverage.

Scale notes baked into each builder:
- dimension sides (region/nation/supplier/part/customer) get an explicit
  ``F.broadcast`` hint — at 100 TB the fact table (lineitem) never shuffles
  for these joins;
- aggregations go through groupBy (partial+final hash agg via Catalyst);
- every LIMIT query sorts with a total-order tiebreak so results are
  deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.operators.textops import ascii_fold
from e_commerce_click_stream_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: the canonical partial+final hash aggregate

# Exactness (r13, the class the x10 scale probe caught in
# brand_revenue): Q1's six groups each sum MILLIONS of rows at sf1+, so
# raw double sums drift with summation order and can cross a rounding
# boundary between engines. quantity/price/discount/tax are integral at
# cents scale — every sum is EXACT BIGINT arithmetic (qty/price at 1e2;
# disc_price at 1e4 = cents x (100-d); charge at 1e6 = cents x (100-d)
# x (100+t)), and every readout is ONE final division of the identical
# integer on both engines (identical double -> identical round,
# regardless of summation order). The avg columns are the same integer
# sums divided by count — the registry's exact-sum-then-ONE-division
# discipline. HUGEINT sums are cast back to BIGINT before the division
# (the driver fetches via pandas, where HUGEINT floats). Headroom: the
# charge term is <= 1.1e11 per row, so 2^63 holds past 8e7 rows per
# group (sf10-equivalent); a 100 TB deployment promotes to DECIMAL(38).
# That width argument is TRIPWIRED, not just stated (VERDICT r13 #4):
# tests/test_round14_ops.py::test_money_sum_bigint_headroom asserts the
# worst accumulated |charge_e6| magnitude on every fixture stays under
# the 2^62 alarm (half the int64 range, so growth trips BEFORE wrap —
# the DSIR tripwire pattern), via the shared money_terms() expressions.
_Q1_SQL = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT
             / 100.0, 2) AS sum_qty,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT
             / 100.0, 2) AS sum_base_price,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT
             / 10000.0, 2) AS sum_disc_price,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                 * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))::BIGINT
             / 1000000.0, 2) AS sum_charge,
       round(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT
             / (100.0 * count(*)), 4) AS avg_qty,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT
             / (100.0 * count(*)), 4) AS avg_price,
       round(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::BIGINT
             / (100.0 * count(*)), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def money_terms() -> dict[str, Column]:
    """The exact-BIGINT money expressions shared by q1/q5/brand_revenue
    and their overflow tripwire (one definition, so the tripwire can
    never drift from what the plans actually sum): lineitem money
    columns are integral at cents scale — qty_c/price_c/disc_c/tax_c at
    1e2, disc_price_e4 = cents x (100-d), charge_e6 = cents x (100-d) x
    (100+t)."""
    return {k: F.expr(v) for k, v in money_term_sql().items()}


def money_term_sql() -> dict[str, str]:
    """The same terms as Spark-SQL fragments: each consumer splices them
    into ONE parsed expression (0.5D = the double literal F.lit(0.5)
    built; the per-term Column chains cost ~200 gateway roundtrips per
    money query's plan construction). Trees are identical."""
    qty_c = "CAST(floor(l_quantity * 100 + 0.5D) AS BIGINT)"
    price_c = "CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT)"
    disc_c = "CAST(floor(l_discount * 100 + 0.5D) AS BIGINT)"
    tax_c = "CAST(floor(l_tax * 100 + 0.5D) AS BIGINT)"
    disc_price_e4 = f"{price_c} * (100 - {disc_c})"
    charge_e6 = f"{disc_price_e4} * (100 + {tax_c})"
    return {
        "qty_c": qty_c,
        "price_c": price_c,
        "disc_c": disc_c,
        "tax_c": tax_c,
        "disc_price_e4": disc_price_e4,
        "charge_e6": charge_e6,
    }


@register("q1_pricing_summary", oracle=_Q1_SQL, headline=True, tags=("agg", "scan"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg: the filter pushes to the parquet scan and
    the aggregate runs partial+final with whole-stage codegen."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    m = money_term_sql()
    qty_c, price_c, disc_c = m["qty_c"], m["price_c"], m["disc_c"]
    disc_price_e4, charge_e6 = m["disc_price_e4"], m["charge_e6"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(f"round(sum({qty_c}) / 100.0D, 2) AS sum_qty"),
        F.expr(f"round(sum({price_c}) / 100.0D, 2) AS sum_base_price"),
        F.expr(f"round(sum({disc_price_e4}) / 10000.0D, 2) AS sum_disc_price"),
        F.expr(f"round(sum({charge_e6}) / 1000000.0D, 2) AS sum_charge"),
        F.expr(f"round(sum({qty_c}) / (100.0D * count(*)), 4) AS avg_qty"),
        F.expr(f"round(sum({price_c}) / (100.0D * count(*)), 4) AS avg_price"),
        F.expr(f"round(sum({disc_c}) / (100.0D * count(*)), 6) AS avg_disc"),
        F.expr("count(*) AS count_order"),
    )


# ---------------------------------------------------------------------------
# Q3-style 3-way join with top-k

_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_SQL, headline=True, tags=("join", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (broadcast customer dim) + agg + deterministic top-10.
    The capability the reference's star schema implies but never implements
    (SURVEY.md §2.3)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = li.join(
        F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style 6-way join through the full dimension chain

# revenue as exact BIGINT cents x (100-d) — see _Q1_SQL's note (five
# nation groups each sum a large fact slice; raw double sums drift with
# summation order at sf1+)
_Q5_SQL = """
SELECT n_name,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT
             / 10000.0, 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL, headline=True, tags=("join",))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join: fact lineitem joins broadcast dims; only orders (the
    second-largest table) flows through a shuffle join on o_orderkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    rev_e4 = money_term_sql()["disc_price_e4"]
    return joined.groupBy("n_name").agg(
        F.expr(f"round(sum({rev_e4}) / 10000.0D, 2) AS revenue")
    )


# ---------------------------------------------------------------------------
# broadcast dim join + per-brand rollup of the fact table

# Exactness (r13, found by the x10 scale probe): a raw double
# sum(price * (1 - disc)) reached ~1.18e10 per brand at x10, where the
# engines' different summation orders moved the sum across a .005
# rounding boundary (one of two x10 sweeps hash-mismatched on the last
# cent). price and discount are integral at cents scale, so the revenue
# is summed EXACTLY as BIGINT (price_cents * (100 - disc_cents)), with
# ONE final division + round — bit-identical in any summation order at
# any scale (the registry's integer-scaled-sum discipline). Headroom:
# per-row <= 1e9, so 2^63 holds past 1e9 rows per brand; a 100 TB
# deployment promotes the sum to DECIMAL(38). Tripwired alongside q1/q5
# (tests/test_round14_ops.py — the shared money_terms() expressions).
_BRAND_SQL = """
SELECT p_brand,
       round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
             / 10000.0, 2) AS revenue,
       round(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0, 2)
           AS total_qty,
       count(*) AS line_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("brand_revenue", oracle=_BRAND_SQL, headline=True, tags=("join", "agg"))
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim broadcast join + keyed agg; lineitem never shuffles for
    the join (only for the final small groupBy). Money math is exact
    BIGINT cents (see _BRAND_SQL's note — the x10 probe caught the raw
    double sum flipping its last cent between engines)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    m = money_term_sql()
    qty_c, rev_e4 = m["qty_c"], m["disc_price_e4"]
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.expr(f"round(sum({rev_e4}) / 10000.0D, 2) AS revenue"),
            F.expr(f"round(sum({qty_c}) / 100.0D, 2) AS total_qty"),
            F.expr("count(*) AS line_count"),
        )
    )


# ---------------------------------------------------------------------------
# customer order stats: shuffle join + agg with left join null handling

_CUST_STATS_SQL = """
SELECT c_custkey,
       c_name,
       c_mktsegment,
       count(o_orderkey) AS order_count,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent,
       round(coalesce(max(o_totalprice), 0.0), 2) AS max_order
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, c_mktsegment
"""


@register("customer_order_stats", oracle=_CUST_STATS_SQL, tags=("join", "agg"))
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join preserving order-less customers, count(col) null semantics,
    coalesce'd aggregates."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
            F.round(F.coalesce(F.max("o_totalprice"), F.lit(0.0)), 2).alias(
                "max_order"
            ),
        )
    )


# ---------------------------------------------------------------------------
# semi / anti joins

_NO_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("customers_without_orders", oracle=_NO_ORDERS_SQL, tags=("anti-join",))
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left_anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_WITH_RETURNS_SQL = """
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
"""


@register("orders_with_returns", oracle=_WITH_RETURNS_SQL, tags=("semi-join",))
def orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left_semi join against a pushed-down filter."""
    orders = _t(spark, sf_dir, "orders")
    returns = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return orders.join(
        returns, orders.o_orderkey == returns.l_orderkey, "left_semi"
    ).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ---------------------------------------------------------------------------
# analytic windows: ranking / lag / running frames

_TOP_ORDERS_SQL = """
SELECT * FROM (
    SELECT o_custkey,
           o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
WHERE rn <= 3
"""


@register("top_orders_per_customer", oracle=_TOP_ORDERS_SQL, tags=("window", "rank"))
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-3 via row_number/rank/dense_rank over a deterministic
    total order."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


_ORDER_GAPS_SQL = """
SELECT o_custkey,
       o_orderkey,
       o_orderdate,
       round((epoch_us(o_orderdate)
              - epoch_us(lag(o_orderdate) OVER w)) / 3600000000.0, 4) AS hours_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey,
       first_value(o_orderkey) OVER w AS first_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
"""


@register("customer_order_gaps", oracle=_ORDER_GAPS_SQL, tags=("window", "lag"))
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value over event-time per customer — integer-µs math
    so both engines agree exactly."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    # o_orderdate surfaces as TIMESTAMP_NTZ from parquet; cast to session-tz
    # (UTC) timestamp for epoch math
    ts = F.col("o_orderdate").cast("timestamp")
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(gap_us / 3_600_000_000.0, 4).alias("hours_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_orderkey"),
    )


_RUNNING_SQL = """
SELECT o_custkey,
       o_orderkey,
       o_orderdate,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent,
       round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders
"""


@register("running_customer_revenue", oracle=_RUNNING_SQL, tags=("window", "frame"))
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average with explicit row frames."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_spent"),
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4
        ).alias("moving_avg_3"),
    )


_ROLLING90_SQL = """
SELECT o_custkey,
       o_orderkey,
       o_orderdate,
       round(sum(o_totalprice) OVER w, 2) AS spend_90d,
       count(*) OVER w AS n_orders_90d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
             RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
"""


@register("customer_rolling_spend_90d", oracle=_ROLLING90_SQL, tags=("window", "range-frame"))
def customer_rolling_spend_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-90-day spend per order via a RANGE window frame over epoch
    days — the time-based frame ROWS frames can't express (a customer's
    order count per frame varies, so "last N rows" is wrong; the frame
    must be "orders whose date falls in [d-89, d]"). Epoch-day integers
    keep the frame bound arithmetic identical across engines, and peers
    on the same day share one frame on both sides by RANGE semantics.
    One hash exchange on o_custkey shared by both window aggregates; no
    joins — the shape survives any scale the window partition fits."""
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-89, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
    )


_STREAKS_SQL = """
WITH days AS (
    SELECT DISTINCT o_custkey, o_orderdate::DATE AS d FROM orders
),
isl AS (
    SELECT o_custkey, d,
           (d - DATE '1970-01-01')
           - row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS grp
    FROM days
),
runs AS (
    SELECT o_custkey, grp, count(*) AS len FROM isl GROUP BY o_custkey, grp
)
SELECT o_custkey,
       count(*) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS n_order_days,
       max(len) AS longest_streak
FROM runs
GROUP BY o_custkey
"""


@register("customer_purchase_streaks", oracle=_STREAKS_SQL, tags=("window", "gaps-islands"))
def customer_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE order days per
    customer. The classic trick — epoch_day − row_number() is constant
    exactly within a consecutive run, so runs fall out of a groupBy with
    no self-join or iteration. Plan: one exchange for the (custkey, day)
    distinct, one for the custkey window; the two stacked groupBys reuse
    the window's custkey partitioning (grouping keys prefix-extend it),
    so streak assembly adds zero shuffles at any scale."""
    days = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = days.select(
        "o_custkey",
        (
            F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    runs = isl.groupBy("o_custkey", "grp").agg(F.count("*").alias("len"))
    return runs.groupBy("o_custkey").agg(
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("n_order_days"),
        F.max("len").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# rollup / pivot / set ops

_ROLLUP_SQL = """
SELECT p_type,
       p_brand,
       count(*) AS part_count,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
GROUP BY ROLLUP (p_type, p_brand)
"""


@register("part_type_rollup", oracle=_ROLLUP_SQL, tags=("rollup",))
def part_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotal + grand-total rows)."""
    return (
        _t(spark, sf_dir, "part")
        .rollup("p_type", "p_brand")
        .agg(
            F.count("*").alias("part_count"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_filled,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_partial
FROM orders
GROUP BY o_orderpriority
"""


@register("orders_status_pivot", oracle=_PIVOT_SQL, tags=("pivot",))
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on order status (expressed as conditional counts in the oracle
    — same plan shape Catalyst produces for pivot)."""
    piv = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_partial"),
    )


_SETOPS_SQL = """
SELECT 'both' AS bucket, n_nationkey FROM (
    SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only', n_nationkey FROM (
    SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier
)
"""


@register("nation_set_ops", oracle=_SETOPS_SQL, tags=("setop",))
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation keys."""
    cust_nations = (
        _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    )
    supp_nations = (
        _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    )
    both = cust_nations.intersect(supp_nations).select(
        F.lit("both").alias("bucket"), "n_nationkey"
    )
    only = cust_nations.exceptAll(supp_nations).select(
        F.lit("customer_only").alias("bucket"), "n_nationkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# scalar function coverage: strings / dates / math

_STRINGS_SQL = """
SELECT p_partkey,
       upper(regexp_replace(p_name, '[^\\x20-\\x7E]', '?', 'g')) AS name_upper,
       lower(regexp_replace(p_brand, '[^\\x20-\\x7E]', '?', 'g')) AS brand_lower,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_slug,
       lpad(p_size::VARCHAR, 4, '0') AS size_pad,
       trim(' ' || p_brand || ' ') AS brand_trim,
       CASE WHEN p_type IS NULL THEN NULL
            ELSE split_part(p_type, ' ', 1) END AS type_head,
       reverse(regexp_replace(p_brand, '[^\\x20-\\x7E]', '?', 'g')) AS brand_rev,
       contains(p_type, 'BRUSHED') AS is_brushed,
       starts_with(p_name, 'a') AS starts_a
FROM part
"""


@register("part_string_functions", oracle=_STRINGS_SQL, tags=("scalar", "string"))
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: case, length, substr, concat_ws, replace,
    pad, trim, split, reverse, contains, prefix tests.

    NULL-input parity notes (part-dimension edge probe): the oracle
    wraps concat with ``||`` (DuckDB concat() SKIPS NULL args where
    Spark propagates) and NULL-guards split_part (DuckDB returns ''
    on NULL input where Spark returns NULL).

    The upper()/lower()/reverse() inputs are ASCII-folded: Spark's full
    Unicode upper() expands ß→SS / ﬁ→FI / ῃ→ΗΙ where DuckDB's simple
    mapping doesn't, and DuckDB reverse() keeps GRAPHEME clusters intact
    where Spark reverses codepoints (r10 post-close probes). Folding to
    printable ASCII makes all three provably engine-identical on ANY
    input; the generated part strings are pure ASCII so the fold is an
    identity on real data."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(ascii_fold(F.col("p_name"))).alias("name_upper"),
        F.lower(ascii_fold(F.col("p_brand"))).alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.reverse(ascii_fold(F.col("p_brand"))).alias("brand_rev"),
        F.contains(F.col("p_type"), F.lit("BRUSHED")).alias("is_brushed"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("starts_a"),
    )


_DATES_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       quarter(o_orderdate) AS q,
       date_trunc('month', o_orderdate)::DATE AS month_start,
       last_day(o_orderdate::DATE) AS month_end,
       o_orderdate + INTERVAL 3 DAY AS plus_3d,
       o_orderdate::DATE AS order_date
FROM orders
"""


@register("order_date_functions", oracle=_DATES_SQL, tags=("scalar", "date"))
def order_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: parts extraction, truncation, month end,
    interval arithmetic, date cast."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


_MATH_SQL = """
SELECT l_orderkey,
       l_linenumber,
       round(abs(l_discount - 0.05), 6) AS disc_dev,
       ceil(l_quantity)::DOUBLE AS qty_ceil,
       floor(l_quantity)::DOUBLE AS qty_floor,
       CASE WHEN l_extendedprice >= 0
            THEN round(sqrt(l_extendedprice), 6) END AS price_sqrt,
       CASE WHEN l_extendedprice + 1 > 0
            THEN round(ln(l_extendedprice + 1), 6) END AS price_ln,
       round(exp(l_discount), 6) AS disc_exp,
       round(pow(1 + l_tax, 2), 6) AS tax_sq,
       greatest(l_tax, l_discount) AS rate_max,
       least(l_tax, l_discount) AS rate_min,
       l_quantity::BIGINT % 7 AS qty_mod7,
       sign(l_discount - 0.05)::DOUBLE AS disc_sign
FROM lineitem
"""


@register("lineitem_math_functions", oracle=_MATH_SQL, tags=("scalar", "math"))
def lineitem_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/sqrt/ln/exp/pow/greatest/least/
    mod/sign, rounded where libm implementations could differ in the last
    ulp."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").cast("double").alias("qty_ceil"),
        F.floor("l_quantity").cast("double").alias("qty_floor"),
        # negative-domain guards: DuckDB sqrt/ln RAISE where Spark yields
        # NaN/NULL — refund rows (negative amounts) are routine fact data
        F.when(
            F.col("l_extendedprice") >= 0, F.round(F.sqrt("l_extendedprice"), 6)
        ).alias("price_sqrt"),
        F.when(
            F.col("l_extendedprice") + 1 > 0,
            F.round(F.log(F.col("l_extendedprice") + 1), 6),
        ).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.greatest("l_tax", "l_discount").alias("rate_max"),
        F.least("l_tax", "l_discount").alias("rate_min"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


# ---------------------------------------------------------------------------
# percentiles / dispersion / cube

_PCTL_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("order_value_percentiles", oracle=_PCTL_SQL, tags=("agg", "percentile"))
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority class (median/p90/p99).
    At 100 TB switch to approx_percentile — the exact form needs a per-group
    sort; both are one expression apart."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


_DISPERSION_SQL = """
SELECT o_orderstatus,
       round(avg(o_totalprice), 4) AS avg_price,
       round(stddev_samp(o_totalprice), 4) AS sd_price,
       round(var_samp(o_totalprice), 2) AS var_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


@register("order_price_dispersion", oracle=_DISPERSION_SQL, tags=("agg", "stats"))
def order_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion statistics per status: avg/stddev/variance/min/max."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


_CUBE_SQL = """
SELECT l_returnflag,
       l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("lineitem_cube", oracle=_CUBE_SQL, tags=("cube",))
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (returnflag, linestatus) — all four
    grouping combinations in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


# ---------------------------------------------------------------------------
# As-of join: an operator Spark has no primitive for, composed from union +
# running last() — the scale-correct shape (one hash shuffle on the key,
# no inequality-join candidate explosion)

_ASOF_SQL = """
WITH ranked AS (
    SELECT e.event_id, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
    FROM events e
    JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       r.o_orderkey AS asof_orderkey,
       round(r.o_totalprice, 2) AS asof_totalprice
FROM events e
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (event_id)
"""


@register("events_asof_orders", oracle=_ASOF_SQL, tags=("join", "asof"))
def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the customer's latest order at-or-before
    the event time (ties on date break toward the higher orderkey; events
    with no prior order keep NULLs — left semantics).

    Spark lacks an as-of primitive, so this composes one: tag and union the
    two relations, sort per user by (time, order-before-event), and carry
    the last non-null order columns forward with a running ``last(...,
    ignorenulls)`` window. That is ONE hash shuffle on the join key and
    linear work per partition — the naive inequality join the oracle runs
    is O(events × orders-per-user) candidates and unusable at 100 TB."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice_r"),
    )
    tagged = ev.withColumn("pri", F.lit(0)).unionByName(
        orders.withColumn("pri", F.lit(1)), allowMissingColumns=True
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("pri").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("asof_totalprice", F.last("o_totalprice_r", ignorenulls=True).over(w))
        .filter(F.col("pri") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("t_us").alias("ts_us"),
            "asof_orderkey",
            "asof_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# Skew-safe two-phase aggregation: salting demo whose result is exactly the
# plain GROUP BY (event_type has ~5 values over the whole corpus — the
# textbook hot-key shape)

_SALTED_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
"""


@register("skew_salted_event_counts", oracle=_SALTED_SQL, tags=("agg", "skew"))
def skew_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality hot key:
    phase 1 aggregates on (event_type, salt=event_id % 32) so the shuffle
    spreads each hot key over 32 reducers; phase 2 merges the 32 partials
    per key. Result is bit-identical to the direct GROUP BY (the oracle) —
    salting changes the distribution, never the answer. At 100 TB this is
    the manual fallback where AQE skew handling doesn't reach (it splits
    skewed JOIN partitions, not agg keys; map-side partial agg usually
    absorbs low-cardinality skew, but not for high-cardinality compound
    aggs like collect_list/distinct where salting stays necessary)."""
    ev = _t(spark, sf_dir, "events").withColumn("salt", F.pmod(F.col("event_id"), F.lit(32)))
    partial = ev.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"), F.round(F.sum("pv"), 2).alias("total_value")
    )


# ---------------------------------------------------------------------------
# Range join: bounded time-window self-join via bucketing — the second
# operator family Spark lacks a primitive for (after as-of above)

_ATTRIB_SQL = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       count(e.event_id) AS preceding_events,
       round(coalesce(sum(e.value), 0.0), 2) AS preceding_value
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL 1 HOUR
 AND e.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""

_HOUR_US = 3_600 * 1_000_000


@register("purchase_attribution_window", oracle=_ATTRIB_SQL, tags=("join", "range"))
def purchase_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per purchase, the same user's event count and value over
    the preceding hour (attribution window).

    Spark has no range-join primitive, so the naive form is an inequality
    join (O(events²-per-user) candidates — the oracle runs it; fine for
    DuckDB at sf0.01, fatal at 100 TB). The scale form here buckets both
    sides by hour: a 1-hour window spans at most 2 hour-buckets, so each
    purchase explodes into ≤2 (user, bucket) probe keys and the join is a
    plain equi-join on (user_id, bucket) + an exact refinement predicate.
    Shuffle keys are (user, hour) — high cardinality, skew-free — and
    candidate volume is events-in-adjacent-buckets, not all-pairs."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("t_us")
    )
    probes = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("t_us").alias("p_t_us"),
            F.explode(
                F.sequence(
                    F.floor((F.col("t_us") - _HOUR_US) / _HOUR_US),
                    F.floor((F.col("t_us") - 1) / _HOUR_US),
                )
            ).alias("p_bucket"),
        )
    )
    cands = ev.select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("value").alias("e_value"),
        F.col("t_us").alias("e_t_us"),
        F.floor(F.col("t_us") / _HOUR_US).alias("bucket"),
    )
    joined = probes.join(
        cands,
        (F.col("p_user_id") == F.col("e_user_id"))
        & (F.col("p_bucket") == F.col("bucket"))
        & (F.col("e_t_us") >= F.col("p_t_us") - _HOUR_US)
        & (F.col("e_t_us") < F.col("p_t_us")),
        "left",
    )
    return joined.groupBy("p_event_id", "p_user_id", "p_t_us").agg(
        F.count("e_event_id").alias("preceding_events"),
        F.round(F.coalesce(F.sum("e_value"), F.lit(0.0)), 2).alias("preceding_value"),
    ).select(
        F.col("p_event_id").alias("event_id"),
        F.col("p_user_id").alias("user_id"),
        F.col("p_t_us").alias("ts_us"),
        "preceding_events",
        "preceding_value",
    )


# ---------------------------------------------------------------------------
# Q6-style forecast revenue: pure filter+agg — the pushdown showcase

_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS qualifying_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_SQL, tags=("agg", "scan", "pushdown"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue forecast: four conjunctive predicates that all
    push to the parquet scan (PushedFilters carries range + between), then a
    single global partial+final agg — zero shuffle beyond the final 1-row
    exchange. At 100 TB with date-partitioned layout the shipdate range also
    prunes partitions before any IO happens."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("qualifying_rows"),
    )


# ---------------------------------------------------------------------------
# Q18-style large-volume customers: HAVING on an aggregate, then join up

_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 180
)
SELECT c_name, o_orderkey, epoch_us(o_orderdate) AS orderdate_us,
       round(o_totalprice, 2) AS total_price, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


@register("q18_large_volume_customers", oracle=_Q18_SQL, tags=("join", "having"))
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: aggregate lineitem per order, keep orders whose
    total quantity clears a threshold (HAVING), then join the surviving keys
    up to orders and customer. The agg runs FIRST so the join input is the
    filtered ~top-decile of orders, not raw lineitem — at 100 TB the
    aggregate-then-join ordering is the difference between shuffling 100 TB
    and shuffling the survivors. Customer is broadcast."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 180)
        .select("l_orderkey", F.round(F.col("qty_raw"), 2).alias("total_qty"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q12-style shipping priority mix: fact-fact equi-join + conditional counts

_Q12_SQL = """
SELECT l_returnflag,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS high_priority_lines,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS low_priority_lines
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


@register("q12_priority_shipping", oracle=_Q12_SQL, tags=("join", "agg"))
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: lineitem filtered by ship-year joins orders on the
    order key (both sides shuffle on l_orderkey/o_orderkey — co-partitioned
    fact-fact join; with bucketed storage on orderkey this becomes
    shuffle-free), then conditional counts split lines by order priority."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_priority_lines"),
            F.count(F.when(~high, 1)).alias("low_priority_lines"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (distinct from rollup/cube: arbitrary set list)

_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("lineitem_grouping_sets", oracle=_GSETS_SQL, tags=("grouping-sets",))
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — per-returnflag, per-linestatus, and grand
    total in one pass (one Expand + one shuffle, not three scans)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar subquery: filter against a computed global aggregate

_ABOVE_AVG_SQL = """
-- all price math in exact integer cents: both the threshold comparison
-- (price*n > sum — no engine-ordered double avg on either side of the
-- inequality) and the per-brand mean are bit-identical in any
-- summation order; a double avg() flipped the 4th decimal at sf0.1
WITH tot AS (
    SELECT sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS sum_cents,
           count(*) AS n
    FROM part
)
SELECT p_brand,
       count(*) AS premium_parts,
       round(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
             / (count(*) * 100.0), 4) AS avg_premium_price
FROM part, tot
WHERE CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * n > sum_cents
GROUP BY p_brand
"""


@register("parts_above_avg_price", oracle=_ABOVE_AVG_SQL, tags=("subquery", "agg"))
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: parts priced above the global average. The
    1-row average is broadcast-crossjoined (BroadcastNestedLoopJoin over a
    single row — free), never collected to the driver, so the whole plan
    stays distributed and re-optimizable by AQE."""
    part = _t(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("bigint")
    tot = part.agg(F.sum(cents).alias("sum_cents"), F.count("*").alias("n"))
    return (
        part.join(F.broadcast(tot))
        # exact integer threshold — see the oracle comment
        .filter(cents * F.col("n") > F.col("sum_cents"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("premium_parts"),
            F.round(F.sum(cents) / (F.count("*") * 100.0), 4).alias(
                "avg_premium_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Distribution windows: ntile / percent_rank / cume_dist

_QUARTILES_SQL = """
WITH rev AS (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total_revenue
    FROM orders
    GROUP BY o_custkey
)
SELECT o_custkey,
       total_revenue,
       ntile(4) OVER w AS revenue_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM rev
WINDOW w AS (ORDER BY total_revenue DESC, o_custkey)
"""


@register("customer_revenue_quartiles", oracle=_QUARTILES_SQL, tags=("window", "ntile"))
def customer_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist) over
    per-customer revenue, with a total order (revenue desc, custkey) so
    every rank is deterministic. The unpartitioned window is a single-task
    sort by construction — fine for a per-customer rollup (cardinality ~
    customers, not events); at 100 TB partition the window by a coarse key
    or use approx quantiles instead."""
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"), F.asc("o_custkey"))
    return rev.select(
        "o_custkey",
        "total_revenue",
        F.ntile(4).over(w).cast("long").alias("revenue_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Time-series trend: the Grafana time-series panel (O2) as a real query

_MONTHLY_SQL = """
WITH m AS (
    SELECT cast(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1
)
SELECT month, n_orders, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY month NULLS FIRST))
             / lag(revenue) OVER (ORDER BY month NULLS FIRST) * 100, 4)
           AS mom_revenue_pct
FROM m
"""


@register("orders_monthly_trend", oracle=_MONTHLY_SQL, tags=("window", "timeseries"))
def orders_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order/revenue time series with month-over-month growth —
    the continuous form of the reference's Grafana time-series panel
    (SURVEY.md §2.6 O2). Truncate-then-agg collapses the data to one row
    per month BEFORE the unpartitioned lag window, so the single-task
    window sees ~tens of rows regardless of input scale."""
    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("mom_revenue_pct"),
    )


# ---------------------------------------------------------------------------
# Q4-style: EXISTS semi-join with an inequality correlation

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
  AND o_orderdate < TIMESTAMP '2000-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_SQL, tags=("semi-join", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this schema: shipped-after-order instead
    of receipt-after-commit): quarterly order counts by priority where at
    least one line shipped after the order date. Semi-join carries the
    inequality in the join condition, so Catalyst keeps it a hash semi-join
    on l_orderkey with the date filter applied post-probe — the fact table
    is filtered by partition-prunable o_orderdate first."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01") & (F.col("o_orderdate") < "2000-04-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Q10-style: returned-item revenue per customer, top 20

_Q10_SQL = """
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       round(c.c_acctbal, 2) AS acctbal,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  AND o.o_orderdate < TIMESTAMP '2000-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, tags=("join", "topk", "agg"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window. lineitem is filtered on returnflag before the join;
    customer and nation broadcast; the final top-20 compiles to
    TakeOrderedAndProject (no global sort), with c_custkey as the
    total-order tiebreak."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01") & (F.col("o_orderdate") < "2000-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13-style: customer order-count distribution (left join + double groupBy)

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register("q13_order_count_distribution", oracle=_Q13_SQL, tags=("left-join", "agg"))
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many orders,
    including zero (left join keeps orderless customers; count(o_orderkey)
    ignores the null). First groupBy shuffles on c_custkey; the second
    input is one row per customer, so the distribution agg is cheap at any
    scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14-style: promo revenue share in one month (conditional-sum ratio)

_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '2000-03-01'
  AND l.l_shipdate < TIMESTAMP '2000-04-01'
"""


@register("q14_promo_revenue", oracle=_Q14_SQL, tags=("join", "agg", "pushdown"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO-type parts.
    The month filter prunes the lineitem scan (PushedFilters), part
    broadcasts, and the ratio is two conditional sums in a single global
    aggregate — one pass, no extra shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-03-01") & (F.col("l_shipdate") < "2000-04-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q19-style: disjunction of brand/quantity conjunctions

_Q19_SQL = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#22' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#33' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
"""


@register("q19_disjunctive_predicates", oracle=_Q19_SQL, tags=("join", "or-predicates"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/quantity/size
    conjunctions. The disjunction references both sides, so it lives in the
    join condition; Catalyst extracts the common p_partkey equi-key for the
    hash join and derives single-side OR filters (brand IN (...), quantity
    range union) that push to the scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    arm = lambda brand, qlo, qhi, shi: (  # noqa: E731
        (F.col("p_brand") == brand) & q.between(qlo, qhi) & sz.between(1, shi)
    )
    cond = arm("Brand#11", 1, 11, 5) | arm("Brand#22", 10, 20, 10) | arm("Brand#33", 20, 30, 15)
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q22-style: dormant high-balance customers (scalar subquery + NOT EXISTS)

_Q22_SQL = """
SELECT c_mktsegment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c_mktsegment
"""


@register("q22_dormant_customers", oracle=_Q22_SQL, tags=("anti-join", "subquery", "agg"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, by market segment. The scalar average compiles to a one-row
    broadcast subquery (rounded so both engines compare against the
    identical threshold); the NOT EXISTS is an anti-join against the
    date-filtered orders — only recent orders shuffle."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("ab"))
    )
    recent = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-07-01")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2-style: min-cost supplier per part (derived cost relation + per-group min)
#
# The fixture schema has no partsupp table, so the part↔supplier cost
# relation is DERIVED from lineitem (avg unit price per part/supplier pair)
# — the correlated "minimum cost supplier within the region" shape of
# TPC-H Q2 is preserved.

_Q2_SQL = """
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           round(avg(l_extendedprice / l_quantity), 4) AS supply_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
), eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), ranked AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost,
           min(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
    FROM cost
    JOIN part ON p_partkey = l_partkey
    JOIN eu ON s_suppkey = l_suppkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
)
SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM ranked
WHERE supply_cost = min_cost
ORDER BY acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_SQL, tags=("join", "window", "subquery"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (cost relation derived from lineitem — the fixtures
    have no partsupp): cheapest European supplier per STANDARD size-15
    part. The per-part minimum is a partitioned window min (shuffles once
    on p_partkey, no self-join), the supplier→nation→region chain and the
    filtered part dim both broadcast, and the rounded cost is compared
    identically on both engines so the min-equality filter is stable."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "supply_cost"
        )
    )
    part_f = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(F.broadcast(part_f), cost.l_partkey == part_f.p_partkey)
        .join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supply_cost",
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7-style: volume shipping between two nations, by direction and year

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
        OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_SQL, tags=("join", "agg"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    nation joins twice under different aliases (supplier side / customer
    side); the cross-nation disjunction is applied after both broadcast
    joins; only the final 3-key agg shuffles — lineitem never shuffles for
    a join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6"))
        | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9"))
    )
    # orders is fact-sized at scale: no broadcast hint — AQE picks broadcast
    # at small SF and a co-partitioned shuffle join beyond the threshold
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8-style: national market share within a region's market, by year

_Q8_SQL = """
SELECT o_year,
       round(round(sum(CASE WHEN nation = 'NATION_9' THEN volume ELSE 0.0 END), 2)
             / round(sum(volume), 2), 6) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_SQL, tags=("join", "agg", "conditional"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_9 suppliers' share of ASIA's ECONOMY-part
    market by order year. Seven broadcast dimension joins around the
    lineitem fact; the share is two conditional sums in one aggregate
    (rounded before the ratio so both engines divide identical values)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # orders stays hint-free (fact-sized at scale; AQE decides)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.round(
                    F.sum(
                        F.when(F.col("nation") == "NATION_9", F.col("volume")).otherwise(
                            0.0
                        )
                    ),
                    2,
                )
                / F.round(F.sum("volume"), 2),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9-style: product-type profit by supplier nation and year
#
# The fixtures have no partsupp.ps_supplycost, so cost is derived from the
# part list price (60% of retail × quantity) — the join topology and the
# profit-by-nation-by-year shape of TPC-H Q9 are preserved.

_Q9_SQL = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount)
             - 0.6 * p_retailprice * l_quantity AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_type_profit", oracle=_Q9_SQL, tags=("join", "agg"))
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on red parts by supplier nation and order
    year (cost proxied at 60% of part retail price — no partsupp in the
    fixtures). The p_name LIKE filter prunes part before its broadcast;
    orders broadcasts for the year column; one shuffle for the final
    2-key agg."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11-style: important-stock parts (grand-total scalar threshold)
#
# No partsupp in the fixtures, so a part's "stock value" is derived as the
# total extended price shipped by NATION_9 suppliers — the
# value-above-a-fraction-of-the-grand-total shape of TPC-H Q11 is kept.

_Q11_SQL = """
WITH pv AS (
    SELECT l_partkey AS part_key, round(sum(l_extendedprice), 2) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
    GROUP BY l_partkey
)
SELECT part_key, part_value
FROM pv
WHERE part_value > (SELECT round(avg(part_value) * 2.0, 2) FROM pv)
"""


@register("q11_important_stock", oracle=_Q11_SQL, tags=("agg", "subquery"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_9-supplied value exceeds twice
    the mean part value (TPC-H's fixed fraction scales with 1/SF; a
    mean-relative threshold is the scale-invariant equivalent, selective
    at every fixture size). The per-part value table is computed ONCE
    (localCheckpoint cuts the lineage so the grand-total scalar doesn't
    re-scan lineitem), then the one-row threshold broadcasts back — no
    single-partition window over the full part list, which matters when
    parts number in the millions."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("part_value"))
        .localCheckpoint(eager=True)
    )
    thr = pv.agg(F.round(F.avg("part_value") * 2.0, 2).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select("part_key", "part_value")
    )


# ---------------------------------------------------------------------------
# Q15-style: top supplier(s) by quarterly revenue (max selection with ties)

_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01'
    GROUP BY l_suppkey
), ranked AS (
    SELECT supplier_no, total_revenue,
           rank() OVER (ORDER BY total_revenue DESC) AS rk
    FROM rev
)
SELECT s_suppkey, s_name, total_revenue
FROM ranked JOIN supplier ON s_suppkey = supplier_no
WHERE rk = 1
"""


@register("q15_top_supplier", oracle=_Q15_SQL, tags=("agg", "window", "topk"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in 2000Q1.
    rank()=1 over the per-supplier revenue keeps max-with-ties semantics
    and compiles to WindowGroupLimit — each partition pre-prunes to its
    local top before the single-partition final, so the unpartitioned
    window never sees more than one survivor per input partition."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2000-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    w = Window.orderBy(F.desc("total_revenue"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(sup), F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16-style: supplier diversity per part spec, excluding flagged suppliers

_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#11'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_diversity", oracle=_Q16_SQL, tags=("anti-join", "distinct-agg"))
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    from the shipped relation, excluding brand/type/size combinations and
    a flagged-supplier list (NOT IN → broadcast anti-join; s_suppkey is
    non-null so anti-join and NOT IN agree). count(DISTINCT) expands to
    the standard two-phase distinct aggregate."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    flagged = _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%7"))
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17-style: small-quantity-order revenue (correlated per-part average)

_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM (
    SELECT l_extendedprice, l_quantity,
           round(0.2 * avg(l_quantity) OVER (PARTITION BY l_partkey), 6) AS qty_thr
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
) brand_lines
WHERE l_quantity < qty_thr
"""


@register("q17_small_quantity_revenue", oracle=_Q17_SQL, tags=("window", "agg", "subquery"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue forfeited if below-20%-of-average
    quantity orders of Brand#23 parts stopped. The correlated per-part
    average is a partitioned window over the brand-filtered join (partkey
    determines brand, so the window input equals the correlated subquery's
    domain) — one scan, one shuffle, instead of a second scan + self-join.
    The threshold is rounded so the strict < compares identical values on
    both engines."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("qty_thr", F.round(0.2 * F.avg("l_quantity").over(w), 6))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q20-style: suppliers with significant promo-part shipments (semi-join chain)

_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate < TIMESTAMP '2001-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 300.0
  )
"""


@register("q20_promo_part_suppliers", oracle=_Q20_SQL, tags=("semi-join", "agg"))
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_9 suppliers who shipped more than 300 units
    of PROMO parts in 2000 (the fixtures have no ps_availqty, so the
    excess-stock threshold is on shipped quantity). The IN-subquery is an
    aggregate → HAVING → semi-join; the qualifying-supplier list is tiny,
    so the supplier dim probes it broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2001-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .filter(F.col("promo_qty") > 300.0)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q21-style: suppliers who alone delayed multi-supplier orders
#
# The fixtures have no commit/receipt dates, so "late" is adapted to
# shipped more than 60 days after the order date; the exists/not-exists
# structure (another supplier on the order; no OTHER late supplier)
# becomes two per-order window counts over the flagged relation.

_Q21_SQL = """
WITH flagged AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey, l_suppkey
), per_order AS (
    SELECT l_orderkey, l_suppkey, is_late,
           count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM flagged
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM per_order
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1 AND n_name = 'NATION_6'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_waiting_suppliers", oracle=_Q21_SQL, headline=True, tags=("window", "agg", "topk"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_6 suppliers who were the sole late shipper
    (>60 days after order date — no receipt/commit dates in the fixtures)
    on finalized multi-supplier orders. The EXISTS/NOT EXISTS pair becomes
    two window counts per order over the (order, supplier) flag relation —
    two key-local shuffles instead of two fact-fact self-joins."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    # orders is fact-sized at scale: hint-free equi join (AQE decides)
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.expr(
                "max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAYS"
                " THEN 1 ELSE 0 END) AS is_late"
            )
        )
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    return (
        flagged.selectExpr(
            "*",
            "count(*) OVER (PARTITION BY l_orderkey) AS n_supp",
            "sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late",
        )
        .filter("is_late = 1 AND n_supp >= 2 AND n_late = 1")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.expr("count(*) AS numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# FULL OUTER join: the one join type the rest of the suite doesn't exercise

_FULL_OUTER_SQL = """
WITH c AS (
    SELECT c_nationkey AS nationkey, count(*) AS n_customers
    FROM customer GROUP BY 1
),
s AS (
    SELECT s_nationkey AS nationkey, count(*) AS n_debt_suppliers
    FROM supplier WHERE s_acctbal < 0 GROUP BY 1
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(c.n_customers, 0) AS n_customers,
       coalesce(s.n_debt_suppliers, 0) AS n_debt_suppliers,
       coalesce(c.n_customers, 0) - coalesce(s.n_debt_suppliers, 0) AS balance
FROM c FULL OUTER JOIN s ON s.nationkey = c.nationkey
"""


@register("nation_coverage_full_outer", oracle=_FULL_OUTER_SQL, tags=("join", "full-outer"))
def nation_coverage_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer counts against per-nation
    negative-balance supplier counts — the debt-supplier side genuinely
    misses nations, so both unmatched directions are exercised. Aggregate
    first, join the two small per-key tables after: the outer join runs
    over key cardinality, never row cardinality."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_debt_suppliers"))
    )
    j = c.join(s, c.c_nk == s.s_nk, "full_outer")
    n_cust = F.coalesce("n_customers", F.lit(0))
    n_supp = F.coalesce("n_debt_suppliers", F.lit(0))
    return j.select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        n_cust.alias("n_customers"),
        n_supp.alias("n_debt_suppliers"),
        (n_cust - n_supp).alias("balance"),
    )


# ---------------------------------------------------------------------------
# exact decimal money math: at 100 TB, double-summing currency drifts with
# partition count and add order; DECIMAL sums are associative and exact.
# The OUTPUT columns are cast to DOUBLE on both sides: Spark's decimal(28,2)
# and DuckDB's DECIMAL(38,2) sums stringify differently in the driver's
# hasher even when cell-identical (CORRECTNESS_r04 red row), and a single
# exact-decimal -> double cast per *final* value is deterministic — the
# order-dependence decimal exists to avoid lives in the summation, which
# stays decimal.

_DECIMAL_SQL = """
SELECT l_returnflag,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS exact_revenue,
       CAST(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))
                     * CAST(round(l_discount, 2) AS DECIMAL(4,2))) AS DECIMAL(18,4))
            AS DOUBLE) AS exact_discount_amount,
       CAST(min(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS min_price,
       CAST(max(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("lineitem_decimal_money", oracle=_DECIMAL_SQL, tags=("decimal", "types", "agg"))
def lineitem_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency aggregation in DECIMAL(18,2): each price is rounded to
    cents once, cast to decimal, and summed EXACTLY — decimal addition is
    associative, so the sum is bit-identical across engines and partition
    orders (double sums drift with add order). Final columns are cast to
    DOUBLE only at the very end: one exact decimal -> double conversion
    per OUTPUT value is deterministic and hash-stable across engines,
    while the summation itself stays decimal. The P5 decimal
    re-projection (reference db/init.sql NUMERIC columns) applied to
    aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")
    # decimal x decimal: the product is EXACT at scale 4 — no tie-prone
    # double rounding anywhere (round(p*d, 2) differs across engines on
    # .xx5 ties: HALF_UP vs half-even)
    disc = price * F.round(F.col("l_discount"), 2).cast("decimal(4,2)")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.sum(price).cast("double").alias("exact_revenue"),
        F.sum(disc).cast("decimal(18,4)").cast("double").alias("exact_discount_amount"),
        F.min(price).cast("double").alias("min_price"),
        F.max(price).cast("double").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# market-basket co-occurrence: brand pairs bought in the same order, with
# support and lift — the association-mining primitive (the full Apriori /
# FP-growth lattice prunes exactly this pairwise co-occurrence table)

MIN_PAIR_SUPPORT = 5

_BASKET_SQL = f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n_orders AS (SELECT count(DISTINCT okey) AS n FROM baskets),
brand_freq AS (SELECT brand, count(*) AS freq FROM baskets GROUP BY brand),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS pair_count
    FROM baskets a JOIN baskets b
      ON b.okey = a.okey AND a.brand < b.brand
    GROUP BY a.brand, b.brand
    HAVING count(*) >= {MIN_PAIR_SUPPORT}
)
SELECT p.brand_a, p.brand_b, p.pair_count,
       round(p.pair_count * 1.0 / n.n, 6) AS support,
       round(p.pair_count * 1.0 * n.n / (fa.freq * fb.freq), 4) AS lift
FROM pairs p
JOIN brand_freq fa ON fa.brand = p.brand_a
JOIN brand_freq fb ON fb.brand = p.brand_b
CROSS JOIN n_orders n
"""


@register("brand_basket_affinity", oracle=_BASKET_SQL, tags=("basket", "association", "self-join"))
def brand_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand pairs co-purchased within one order, with support and lift
    (lift > 1 = bought together more than independence predicts) — the
    pairwise co-occurrence table every association miner reduces to.

    Scale shape: the self-join fans out per ORDER, and an order holds at
    most ~7 distinct brands, so candidate pairs are bounded by
    orders x C(7,2) — linear in the fact table, never corpus-quadratic;
    brand frequencies and the order count are tiny broadcasts."""
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(_t(spark, sf_dir, "part")), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = baskets.agg(F.count_distinct("okey").alias("n"))
    brand_freq = baskets.groupBy("brand").agg(F.count("*").alias("freq"))
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("okey").alias("okey_b"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, (F.col("okey") == F.col("okey_b")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= MIN_PAIR_SUPPORT)
    )
    fa = brand_freq.select(F.col("brand").alias("brand_a"), F.col("freq").alias("freq_a"))
    fb = brand_freq.select(F.col("brand").alias("brand_b"), F.col("freq").alias("freq_b"))
    return (
        pairs.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_count",
            F.round(F.col("pair_count") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(
                F.col("pair_count") * 1.0 * F.col("n") / (F.col("freq_a") * F.col("freq_b")), 4
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# interval-overlap counting via delta encoding: how many orders are OPEN
# (placed, not yet fully shipped) each day — computed as +1/-1 boundary
# events and a running sum, never by exploding order x days

_BACKLOG_SQL = """
WITH closes AS (
    SELECT o.o_orderkey,
           o.o_orderdate::DATE AS open_day,
           max(l.l_shipdate)::DATE AS close_day
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
    SELECT open_day AS day, 1 AS delta FROM closes
    UNION ALL
    SELECT close_day + 1 AS day, -1 AS delta FROM closes
),
days AS (
    SELECT day,
           sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END)::BIGINT AS opened,
           sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END)::BIGINT AS closed,
           sum(delta) AS net
    FROM deltas GROUP BY day
)
SELECT day, opened, closed,
       (sum(net) OVER (ORDER BY day NULLS FIRST ROWS UNBOUNDED PRECEDING))::BIGINT
           AS open_backlog
FROM days
"""


@register("orders_backlog_over_time", oracle=_BACKLOG_SQL, tags=("interval", "window", "timeseries"))
def orders_backlog_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: an order is open from its order date
    until its last lineitem ships. Each interval becomes two boundary
    deltas (+1 open, -1 the day after close) and the backlog is the
    running sum — the delta-encoding trick that counts interval overlaps
    in O(orders) rows instead of exploding order x days. The final
    cumulative window runs over date cardinality only (time-dimension
    rows, bounded forever)."""
    closes = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .join(
            table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.to_date("o_orderdate").alias("open_day"),
            F.date_add(F.to_date("last_ship"), 1).alias("close_next"),
        )
    )
    deltas = closes.select(F.col("open_day").alias("day"), F.lit(1).alias("delta")).unionAll(
        closes.select(F.col("close_next").alias("day"), F.lit(-1).alias("delta"))
    )
    days = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("opened"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).alias("closed"),
        F.sum("delta").alias("net"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return days.select(
        "day", "opened", "closed", F.sum("net").over(w).alias("open_backlog")
    )


# ---------------------------------------------------------------------------
# Pareto / ABC analysis: cumulative revenue share by customer rank

_PARETO_SQL = """
WITH cust AS (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT o_custkey, revenue,
           row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rnk,
           sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_revenue,
           sum(revenue) OVER () AS total_revenue,
           count(*) OVER () AS n_customers
    FROM cust
)
SELECT o_custkey, revenue, rnk,
       round(cum_revenue / total_revenue, 6) AS cum_share,
       round(rnk * 1.0 / n_customers, 6) AS rank_share,
       CASE WHEN cum_revenue / total_revenue <= 0.8 THEN 'A'
            WHEN cum_revenue / total_revenue <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""


@register("customer_pareto_abc", oracle=_PARETO_SQL, tags=("pareto", "abc", "window"))
def customer_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto curve + ABC classification: customers ranked by revenue,
    cumulative share of total, and the classic A (first 80% of revenue) /
    B (next 15%) / C (tail) segments — the concentration analysis behind
    "20% of customers drive 80% of revenue".

    The global rank runs over CUSTOMER-cardinality aggregates (one row
    per customer, not per order); at warehouse scale the single-partition
    window is the exact-Pareto cost, and the approximate path is a
    quantile sketch on the same per-customer aggregate."""
    cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    order_w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all_w = Window.partitionBy()
    ranked = cust.select(
        "o_custkey",
        "revenue",
        F.row_number().over(order_w).cast("long").alias("rnk"),
        F.sum("revenue").over(cum_w).alias("cum_revenue"),
        F.sum("revenue").over(all_w).alias("total_revenue"),
        F.count("*").over(all_w).alias("n_customers"),
    )
    share = F.col("cum_revenue") / F.col("total_revenue")
    return ranked.select(
        "o_custkey",
        "revenue",
        "rnk",
        F.round(share, 6).alias("cum_share"),
        F.round(F.col("rnk") * 1.0 / F.col("n_customers"), 6).alias("rank_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered anti-join: the runtime-filter (semi-join reduction)
# pattern — subtract a large blocklist from a huge fact table without
# shuffling the fact rows that obviously don't match

BLOOM_BITS = 8192  # 128 longs; fpp ~ (1 - e^(-k*n/m))^k, sized for the demo
BLOOM_HASHES = 4

_BLOOM_ANTI_SQL = """
SELECT l.l_linestatus,
       count(*) AS n_items,
       round(sum(l.l_extendedprice), 2) AS clean_revenue
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderpriority = '1-URGENT'
                    AND o.o_orderkey = l.l_orderkey)
GROUP BY l.l_linestatus
"""


def _bloom_positions(key: str) -> F.Column:
    """k portable bit positions per key (xxhash64 with k seeds, mod m)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(BLOOM_BITS))
            for s in range(BLOOM_HASHES)
        ]
    )


@register(
    "bloom_prefiltered_antijoin",
    oracle=_BLOOM_ANTI_SQL,
    tags=("anti-join", "bloom", "runtime-filter"),
)
def bloom_prefiltered_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist subtraction via an explicit Bloom runtime filter: build an
    8192-bit Bloom filter over the flagged order keys AS AN AGGREGATE
    (per-key bit masks → bit_or per 64-bit word → one 128-long array
    row), broadcast it, and route every lineitem whose key is DEFINITELY
    absent straight to the aggregate with a pure projection — no join at
    all; only the bloom-positive candidates run the EXACT anti-join.
    False positives are removed by that join; false negatives are
    impossible by construction, so the union equals the plain NOT EXISTS
    oracle.

    Scale shape: this is Spark's own runtime-filter/semi-join-reduction
    strategy made explicit. The fact table is never shuffled for the
    subtraction — the Bloom rides a 1-row broadcast (fixed 1 KiB
    regardless of blocklist size at this m), the prefilter is
    whole-stage-codegen'd, and the exact anti-join only pays for rows
    that pass (true matches + ~fpp of the rest) instead of the full
    fact."""
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_extendedprice"
    )
    flagged = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )

    words = (
        flagged.select(F.explode(_bloom_positions("o_orderkey")).alias("pos"))
        .select(
            F.expr("int(pos div 64)").alias("word"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    # materialize the 1-row bloom once — both union branches reference it,
    # and without the checkpoint Catalyst re-plans the whole build subtree
    # (scan → explode → two aggs) under each branch
    bloom = (
        words.agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {BLOOM_BITS // 64 - 1}),"
                " w -> coalesce(element_at(m, w), 0L))"
            ).alias("bloom")
        )
        .localCheckpoint(eager=True)
    )

    probe = lineitem.withColumn("ppos", _bloom_positions("l_orderkey")).join(
        F.broadcast(bloom)
    )
    might_contain = F.expr(
        "forall(ppos, p -> (bloom[int(p div 64)] & shiftleft(1L, int(p % 64))) != 0)"
    )
    # Bloom-negative rows are PROVABLY clean — they join nothing and flow
    # straight to the aggregate; only bloom-positive candidates (true
    # matches + ~fpp false positives) pay for the exact anti-join.
    clean_certain = probe.filter(~might_contain).drop("bloom", "ppos")
    candidates = probe.filter(might_contain).drop("bloom", "ppos")
    clean_verified = candidates.join(
        flagged, candidates.l_orderkey == flagged.o_orderkey, "left_anti"
    )
    return (
        clean_certain.unionByName(clean_verified)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("clean_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# salted fact-fact JOIN: the join-side twin of skew_salted_event_counts —
# replicate the build side over S salts so one hot key cannot pin a reducer

# 7, not 8: the salt must vary WITHIN one join key, and l_linenumber —
# the only within-order discriminator — takes exactly the values 1..7;
# an 8th replica could never match (r5 review caught the off-by-one both
# ways: pmod(l,8) left replica 0 dead, pmod(l-1,8) left replica 7 dead)
JOIN_SALTS = 7

_SALTED_JOIN_SQL = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("skew_salted_fact_join", oracle=_SALTED_JOIN_SQL, tags=("join", "skew", "salt"))
def skew_salted_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-fact equi-join: the probe side (lineitem) gets a
    per-row salt ((l_linenumber − 1) % S, with S sized to the
    discriminator's residue coverage), the
    build side (orders) is replicated S ways with an explode, and the
    join key becomes (orderkey, salt) — a hot orderkey's rows now land
    on S reducers instead of one. The aggregate result is bit-identical to
    the unsalted join (the oracle): salting changes the partitioning,
    never the matches.

    At 100 TB this is the manual fallback where AQE's skew-join split
    doesn't reach: AQE splits oversized PARTITIONS of a sort-merge join
    after the shuffle is already written, while salting prevents the
    skewed shuffle from existing — at the price of an S× replication of
    the build side, which is why S stays small and the technique is
    reserved for keys AQE statistics flag. The plan must stay an
    equi-join on the compound key (SMJ/SHJ, never a nested loop)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        # l_linenumber is 1-based (1..7): subtract 1 so residues cover
        # exactly 0..S-1 and every build replica can match
        F.pmod(F.col("l_linenumber") - 1, F.lit(JOIN_SALTS)).alias("salt"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALTS - 1))))
    )
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# equi-width histogram: the distribution-profiling agg a feature pipeline
# runs before choosing clipping / binning constants

HIST_WIDTH = 25_000.0

_HIST_SQL = f"""
WITH binned AS (
    SELECT cast(floor(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bin,
           count(*) AS n_orders
    FROM orders GROUP BY 1
),
tot AS (SELECT sum(n_orders) AS total FROM binned)
SELECT bin,
       round(bin * {HIST_WIDTH}, 2)::DOUBLE AS bin_lo,
       round((bin + 1) * {HIST_WIDTH}, 2)::DOUBLE AS bin_hi,
       n_orders,
       round(n_orders / total, 6) AS pct,
       round(sum(n_orders) OVER (ORDER BY bin NULLS FIRST) / total, 6) AS cum_pct
FROM binned, tot
"""


@register("order_value_histogram", oracle=_HIST_SQL, tags=("histogram", "profile"))
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value with per-bin share and a running
    cumulative share — the distribution profile that picks clipping
    bounds and bin edges for downstream featurization.

    Scale shape: one hash agg collapses the fact to |bins| rows; the
    grand total rides a 1-row broadcast (no second scan), and the
    cumulative window runs over the tiny bin grid — the single-partition
    sort is over dozens of rows by construction."""
    orders = _t(spark, sf_dir, "orders")
    binned = orders.groupBy(
        F.floor(F.col("o_totalprice") / HIST_WIDTH).cast("long").alias("bin")
    ).agg(F.count("*").alias("n_orders"))
    # grand total as an unpartitioned window over the |bins| grid (W1
    # pattern) — a separate agg branch would re-plan the fact scan and
    # agg a second time; both windows share one single-partition pass
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    total = F.sum("n_orders").over(w_all)
    return binned.select(
        "bin",
        F.round(F.col("bin") * HIST_WIDTH, 2).alias("bin_lo"),
        F.round((F.col("bin") + 1) * HIST_WIDTH, 2).alias("bin_hi"),
        "n_orders",
        F.round(F.col("n_orders") / total, 6).alias("pct"),
        F.round(F.sum("n_orders").over(w_cum) / total, 6).alias("cum_pct"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 build: collapse the order stream into a temporal dimension
# (the CDC→warehouse pattern; the reference's Postgres sink stores only
# current state — reference processor/streaming_processor.py:131-170 —
# this derives the full validity history instead)

_SCD2_SQL = """
WITH ordered AS (
    SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
           lag(o_orderpriority) OVER w AS prev_priority
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
),
changes AS (
    SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate
    FROM ordered
    WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
)
SELECT o_custkey AS custkey,
       row_number() OVER w AS version,
       o_orderpriority AS priority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
"""


@register("customer_scd2_history", oracle=_SCD2_SQL, tags=("scd2", "window", "cdc"))
def customer_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from the order stream: per
    customer, each run of a repeated order priority collapses to one
    versioned row with [valid_from, valid_to) bounds (open-ended for the
    current version) — the CDC-collapse a warehouse runs to turn event
    history into a temporal dimension.

    Scale shape: ONE hash exchange on ``o_custkey`` feeds both window
    passes (the change filter preserves the partitioning, so lag →
    filter → row_number/lead re-sorts locally without reshuffling);
    everything after the exchange is linear per-partition work. The
    change rows order by (valid_from, orderkey) — orderkey is unique, so
    the ordering is total and both engines version A→B→A same-day flips
    identically."""
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.lag("o_orderpriority").over(w1).alias("prev_priority"),
    )
    changes = ordered.filter(
        F.col("prev_priority").isNull()
        | (F.col("prev_priority") != F.col("o_orderpriority"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w2).alias("version"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
    )
