"""Order-insensitive result comparison between a Spark DataFrame and a DuckDB
relation — a local mirror of the driver's correctness gate (row count +
column names + value multiset), so oracle mismatches surface in pytest before
the driver ever runs."""

from __future__ import annotations

import datetime as _dt
import math


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard residual float noise beyond the rounding queries already do
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    # key=repr gives a total order even with None/mixed cells
    out = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )
    return sorted_cols, out


def assert_matches_oracle(spark_df, duck_con, oracle: str, name: str = "query"):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)

    assert sc == dc, f"{name}: column mismatch spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, duck): {diffs}")
