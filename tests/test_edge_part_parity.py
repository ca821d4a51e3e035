"""Cross-engine parity on an EDGE-CASE part dimension (NULL name /
brand / type / size / retailprice / container rows) for the
string-function and part-join families.

Fifth edge matrix. Found and drove two oracle fixes in
part_string_functions: DuckDB's concat() SKIPS NULL arguments where
Spark's propagates (brand_trim), and DuckDB's split_part returns ''
on NULL input where Spark returns NULL (type_head)."""

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

PART_FAMILY = [
    "part_string_functions",
    "part_type_rollup",
    "q2_min_cost_supplier",
    "q14_promo_revenue",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_promo_part_suppliers",
    "brand_revenue",
    "brand_basket_affinity",
    "q9_product_type_profit",
]


@pytest.fixture(scope="module")
def part_dir(spark):
    out = tempfile.mkdtemp(prefix="part_edge_")
    part = table(spark, "/root/testdata/sf0.001", "part")
    rows = [tuple(r) for r in part.limit(30).collect()]
    cols = part.columns
    maxk = max(r[0] for r in rows)
    # one extra row per nullable column, that column nulled
    for i, c in enumerate(cols):
        if c == "p_partkey":
            continue
        r = list(rows[0])
        r[i] = None
        r[0] = maxk + i + 1
        rows.append(tuple(r))
    # case-mapping / grapheme adversaries (r11): upper() diverges on
    # ß/ligatures/iota-subscripts (Spark full mapping expands them,
    # DuckDB's simple mapping doesn't), lower() on İ/final-Σ, and
    # reverse() on ZWJ emoji sequences (DuckDB keeps grapheme clusters
    # whole, Spark reverses codepoints) — part_string_functions must
    # stay engine-identical through its ascii_fold() pre-replacement
    ni, nb, nt = cols.index("p_name"), cols.index("p_brand"), cols.index("p_type")
    base = maxk + len(cols) + 10
    for j, (name, brand, ptyp) in enumerate(
        [
            ("große ﬁne İSTANBUL part", "Brand#ß1", "STANDARD BRUSHED STEEL"),
            ("ΟΔΟΣ ΣΟΦΟΣ ᾨΔΗ ῃ", "Brand#🧑‍🚀", "PROMO İΣ TIN"),
            ("ŉ ǰ ΐ ΰ ẚ mixed", "Brand#\r\nX", "ECONOMY ﬆ COPPER"),
        ]
    ):
        r = list(rows[0])
        r[0] = base + j
        r[ni], r[nb], r[nt] = name, brand, ptyp
        rows.append(tuple(r))
    spark.createDataFrame(rows, part.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "part.parquet"))
    for t in TABLES:
        if t == "part":
            continue
        table(spark, "/root/testdata/sf0.001", t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.fixture(scope="module")
def part_duck(part_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{part_dir}/{t}.parquet/*.parquet'"
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


@pytest.mark.parametrize("name", PART_FAMILY)
def test_part_query_parity_on_edge_fixture(spark, part_dir, part_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, part_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = part_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows
