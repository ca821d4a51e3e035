"""Cross-engine parity on an EDGE-CASE customer dimension (NULL name /
nationkey / mktsegment / acctbal rows) for the customer-join family.

Sixth edge matrix — unlike its five siblings this one found NO
divergences (inner/left/anti joins and NULL-skipping aggregates agree
between the engines by construction), but it stays as the regression
guard: fixtures regenerate every round, and q22's acctbal threshold is
the same scalar-subquery-comparison shape that DID flip in
parts_above_avg_price."""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile
from collections import Counter
from decimal import Decimal

import duckdb
import pytest

from e_commerce_click_stream_spark.io import TABLES, table
from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()

CUSTOMER_FAMILY = [
    "q3_shipping_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q22_dormant_customers",
    "customer_pareto_abc",
    "k_anonymity_audit",
    "dq_constraint_report",
    "customer_order_stats",
    "nation_coverage_full_outer",
    "streaming_segment_enrichment",
]


@pytest.fixture(scope="module")
def cust_dir(spark):
    out = tempfile.mkdtemp(prefix="cust_edge_")
    cust = table(spark, "/root/testdata/sf0.001", "customer")
    rows = [tuple(r) for r in cust.limit(30).collect()]
    cols = cust.columns
    maxk = max(r[0] for r in rows)
    for i, c in enumerate(cols):
        if c == "c_custkey":
            continue
        r = list(rows[0])
        r[i] = None
        r[0] = maxk + i + 1
        rows.append(tuple(r))
    spark.createDataFrame(rows, cust.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "customer.parquet"))
    for t in TABLES:
        if t == "customer":
            continue
        table(spark, "/root/testdata/sf0.001", t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.fixture(scope="module")
def cust_duck(cust_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{cust_dir}/{t}.parquet/*.parquet'"
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
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", CUSTOMER_FAMILY)
def test_customer_query_parity_on_edge_fixture(spark, cust_dir, cust_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, cust_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = cust_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows
