"""Prove the local gate models the driver's pandas hasher (VERDICT r5 #2).

Both r5 red rows passed the OLD driver_sim (Python-value comparison) and
died only at the real gate. These tests pin the two failure mechanisms
against driver_sim's rewritten ``canon()`` so a future refactor can't
silently regress to value-equality comparison:

1. HUGEINT: a DuckDB ``sum()`` over integers binds HUGEINT, which the
   pandas fetch (``rel.df()``) materializes as float64 — stringifying as
   ``"3.0"`` while Spark's bigint gives ``"3"`` (dedup_savings_report, r5);
2. array cells: pandas ``sort_values`` raises ``TypeError: unhashable
   type: 'list'`` (doc_hashed_tf_vectors, r5).
"""

from __future__ import annotations

import importlib.util
import sys

import pandas as pd
import pytest

_spec = importlib.util.spec_from_file_location(
    "driver_sim", "/root/repo/scripts/driver_sim.py"
)
driver_sim = importlib.util.module_from_spec(_spec)
sys.modules["driver_sim"] = driver_sim
_spec.loader.exec_module(driver_sim)
canon = driver_sim.canon


def test_hugeint_sum_stringifies_differently_from_bigint():
    import duckdb

    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert "HUGEINT" in str(rel.types[0]).upper()  # the hazard exists
    duck_side = canon(rel.df())
    spark_side = canon(pd.DataFrame([(3,)], columns=["s"]))
    # numerically equal, representationally different — the r5 red row
    assert duck_side != spark_side
    assert duck_side == [("3.0",)]
    assert spark_side == [("3",)]
    # the convention's fix makes them agree
    fixed = con.sql("SELECT sum(x)::BIGINT AS s FROM (VALUES (1), (2)) t(x)")
    assert canon(fixed.df()) == spark_side


def test_array_cell_raises_like_the_driver_hasher():
    pdf = pd.DataFrame({"doc_id": [1, 2], "tf": [[1, 0], [0, 2]]})
    with pytest.raises(TypeError, match="unhashable"):
        canon(pdf)


def test_midnight_collapse_is_restricted_to_date_columns():
    """The r4 gate evidence covers DATE-vs-DATE normalization only; a
    midnight value in a genuine TIMESTAMP column must keep its time part
    so DATE-vs-TIMESTAMP column-type drift between engines still fails."""
    import datetime as dt

    ts = pd.Timestamp("2024-03-01 00:00:00")
    pdf = pd.DataFrame({"d": [ts], "t": [ts]})
    assert canon(pdf, date_cols=frozenset({"d"})) == [
        ("2024-03-01", "2024-03-01T00:00:00")
    ]
    # Spark's DateType arrives as datetime.date (object dtype) and matches
    # the collapsed DuckDB DATE without needing the date_cols mark
    spark_side = pd.DataFrame({"d": [dt.date(2024, 3, 1)]})
    assert canon(spark_side) == [("2024-03-01",)]
