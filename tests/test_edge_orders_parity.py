"""Cross-engine parity on an EDGE-CASE orders table for the
ordering-sensitive relational window family.

Fourth edge matrix. TPC-H proper declares these columns NOT NULL, but
the fixtures are TPC-H-ish and regenerate every round — and a window
ORDER BY over a nullable column is exactly where the engines silently
split (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST). The probe
drove explicit ``NULLS FIRST`` onto the five affected oracle windows
(running revenue, order gaps, SCD2 collapse, monthly trend lag,
histogram cumulative share), adopting Spark's default placement as the
repo convention."""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile
from collections import Counter

import duckdb
import pytest

from e_commerce_click_stream_spark.io import TABLES, table
from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()

WINDOW_FAMILY = [
    "running_customer_revenue",
    "customer_order_gaps",
    "customer_scd2_history",
    "top_orders_per_customer",
    "customer_purchase_streaks",
    "customer_rolling_spend_90d",
    "order_value_percentiles",
    "customer_revenue_quartiles",
    "orders_monthly_trend",
    "order_value_histogram",
    "customer_order_stats",
    "orders_status_pivot",
    "order_date_functions",
    "order_price_dispersion",
    "orders_backlog_over_time",
    "q4_order_priority",
    "customer_pareto_abc",
    "customers_without_orders",
    "customer_ltv_cohorts",
]


@pytest.fixture(scope="module")
def orders_dir(spark):
    out = tempfile.mkdtemp(prefix="orders_edge_")
    base = table(spark, "/root/testdata/sf0.001", "orders")
    ords = base.limit(30).collect()
    rows = [tuple(r) for r in ords]
    maxk = max(r.o_orderkey for r in ords)
    d = dt.datetime(2024, 5, 1)
    rows += [
        (maxk + 1, None, "O", 100.0, d, "1-URGENT"),  # NULL custkey
        (maxk + 2, ords[0].o_custkey, "O", 100.0, None, "2-HIGH"),  # NULL date
        (maxk + 3, ords[0].o_custkey, "O", 100.0, d, None),  # NULL priority
        (maxk + 4, ords[0].o_custkey, "O", None, d, "3-MEDIUM"),  # NULL price
        (maxk + 5, ords[0].o_custkey, "O", 50.0, d, "1-URGENT"),  # same-day tie
    ]
    spark.createDataFrame(rows, base.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))
    for t in TABLES:
        if t == "orders":
            continue
        table(spark, "/root/testdata/sf0.001", t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.fixture(scope="module")
def orders_duck(orders_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{orders_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", WINDOW_FAMILY)
def test_orders_query_parity_on_edge_fixture(spark, orders_dir, orders_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, orders_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = orders_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows
