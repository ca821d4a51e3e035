"""Lineitem-dimension edge matrix (seventh dimension, after events /
orders / part / customer / corpus / embeddings): every lineitem-only
query compared builder-vs-oracle on a fixture full of the divergence
triggers the fact table can carry at 100 TB — NULL prices/quantities/
discounts/dates, zero and negative amounts, exact-midpoint cent values
(the floor-vs-round boundary), duplicated rows, and NULL enum flags."""

from __future__ import annotations

import datetime as dt
import math
import os
import re
import tempfile
from collections import Counter

import pytest

from e_commerce_click_stream_spark.io import TABLES, table
from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()
_OTHER_TABLES = "region nation customer supplier part orders events documents embeddings".split()

LINEITEM_ONLY = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None
    and "lineitem" in s.oracle
    and not any(re.search(rf"\b{t}\b", s.oracle) for t in _OTHER_TABLES)
)

_D = dt.datetime(2024, 6, 1)

# (orderkey, partkey, suppkey, linenumber, qty, price, discount, tax,
#  returnflag, linestatus, shipdate)
EDGE_LINEITEMS = [
    # normal rows across flags/statuses
    (1, 10, 100, 1, 5.0, 1000.50, 0.05, 0.02, "N", "O", _D),
    (1, 11, 101, 2, 3.0, 2500.25, 0.10, 0.04, "N", "O", _D + dt.timedelta(days=1)),
    (2, 12, 102, 1, 7.0, 999.99, 0.00, 0.00, "R", "F", _D + dt.timedelta(days=30)),
    (3, 13, 103, 1, 1.0, 50000.00, 0.07, 0.08, "A", "F", _D + dt.timedelta(days=90)),
    # exact-midpoint cents: price*100 + 0.5 lands on the floor boundary
    (4, 14, 104, 1, 2.0, 1234.565, 0.05, 0.01, "N", "O", _D),
    (4, 14, 104, 2, 2.0, 0.005, 0.00, 0.00, "N", "O", _D),
    # zero / negative amounts (refund rows)
    (5, 15, 105, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", _D),
    (5, 15, 105, 2, -1.0, -250.75, 0.0, 0.0, "R", "F", _D),
    # NULLs in every nullable slot
    (6, 16, 106, 1, None, 1500.00, 0.02, 0.01, "N", "O", _D),
    (6, 16, 106, 2, 4.0, None, 0.02, 0.01, "N", "O", _D),
    (6, 16, 106, 3, 4.0, 1500.00, None, 0.01, "N", "O", _D),
    (6, 16, 106, 4, 4.0, 1500.00, 0.02, None, "N", "O", _D),
    (7, 17, 107, 1, 4.0, 1500.00, 0.02, 0.01, None, "O", _D),
    (7, 17, 107, 2, 4.0, 1500.00, 0.02, 0.01, "N", None, _D),
    (7, 17, 107, 3, 4.0, 1500.00, 0.02, 0.01, "N", "O", None),
    # exact duplicate rows (same everything)
    (8, 18, 108, 1, 6.0, 777.77, 0.03, 0.02, "N", "O", _D),
    (8, 18, 108, 1, 6.0, 777.77, 0.03, 0.02, "N", "O", _D),
    # shared (partkey, suppkey) pairs for the triangle-count graph
    (9, 10, 100, 1, 2.0, 100.00, 0.0, 0.0, "N", "O", _D),
    (9, 11, 100, 2, 2.0, 100.00, 0.0, 0.0, "N", "O", _D),
    (9, 12, 101, 3, 2.0, 100.00, 0.0, 0.0, "N", "O", _D),
]


@pytest.fixture(scope="module")
def li_dir(spark):
    out = tempfile.mkdtemp(prefix="li_edge_")
    spark.createDataFrame(
        EDGE_LINEITEMS,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    for name in TABLES:
        if name == "lineitem":
            continue
        table(spark, "/root/testdata/sf0.001", name).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))
    return out


@pytest.fixture(scope="module")
def li_duck(li_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{li_dir}/lineitem.parquet/*.parquet'"
    )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        # NaN keys break Counter equality (identity-hashed) even when both
        # engines agree — same normalization as the sibling matrices
        return ("f", "NaN" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", dt.datetime(v.year, v.month, v.day).isoformat())
    return v


@pytest.mark.parametrize("name", LINEITEM_ONLY)
def test_lineitem_query_parity_on_edge_fixture(spark, li_dir, li_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, li_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = li_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows, name
