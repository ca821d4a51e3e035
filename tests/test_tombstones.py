"""Unit pins for the shared deletion-vector module
(operators/tombstones.py) — the three store families exercise it end to
end in test_round12_ops; these pin the module's own contracts in
isolation so a future fourth family inherits them proven."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.operators.tombstones import (
    TOMBSTONES_SUBDIR,
    anti_join_tombstones,
    append_tombstones,
    reset_tombstones,
    tombstones_table_name,
    truncate_tombstones,
)


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id long")


def test_append_dedupes_and_returns_only_new_ids(spark):
    prefix = "tmbu1"
    loc = tempfile.mkdtemp(prefix="tmbu1_")
    reset_tombstones(spark, prefix, loc)

    first = append_tombstones(spark, _ids(spark, [1, 2, 3]), prefix, loc, "doc_id")
    assert sorted(r.doc_id for r in first.collect()) == [1, 2, 3]
    # overlapping batch: only the genuinely-new id comes back (the
    # caller decrements statistics from the RETURNED subset, so a
    # repeated id must not reappear) — and the vector itself holds each
    # id exactly once
    second = append_tombstones(spark, _ids(spark, [2, 3, 4]), prefix, loc, "doc_id")
    assert sorted(r.doc_id for r in second.collect()) == [4]
    tomb = spark.table(tombstones_table_name(prefix))
    assert sorted(r.doc_id for r in tomb.collect()) == [1, 2, 3, 4]
    # duplicates WITHIN one batch collapse too (ADVICE r12): the vector
    # must hold each id exactly once or count-based accounting breaks
    third = append_tombstones(
        spark, _ids(spark, [5, 5, 6, 5]), prefix, loc, "doc_id"
    )
    assert sorted(r.doc_id for r in third.collect()) == [5, 6]
    tomb = spark.table(tombstones_table_name(prefix))
    assert sorted(r.doc_id for r in tomb.collect()) == [1, 2, 3, 4, 5, 6]


def test_anti_join_filters_only_when_vector_exists(spark):
    prefix = "tmbu2"
    loc = tempfile.mkdtemp(prefix="tmbu2_")
    df = _ids(spark, [10, 11, 12])
    reset_tombstones(spark, prefix, loc)
    # no vector: identity (and no tombstone relation in the plan)
    out = anti_join_tombstones(spark, df, prefix, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [10, 11, 12]
    append_tombstones(spark, _ids(spark, [11]), prefix, loc, "doc_id")
    out = anti_join_tombstones(spark, df, prefix, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [10, 12]


def test_truncate_keeps_table_and_schema(spark):
    prefix = "tmbu3"
    loc = tempfile.mkdtemp(prefix="tmbu3_")
    reset_tombstones(spark, prefix, loc)
    append_tombstones(spark, _ids(spark, [7, 8]), prefix, loc, "doc_id")
    truncate_tombstones(spark, prefix, loc)
    tomb_t = tombstones_table_name(prefix)
    assert spark.catalog.tableExists(tomb_t)
    assert spark.table(tomb_t).count() == 0
    # post-truncate appends land in a clean dir and dedupe against
    # nothing — the apply-then-new-erasure cycle
    nxt = append_tombstones(spark, _ids(spark, [7]), prefix, loc, "doc_id")
    assert [r.doc_id for r in nxt.collect()] == [7]
    assert spark.table(tomb_t).count() == 1


def test_reset_drops_catalog_and_directory(spark):
    """The cross-session contract: reset must delete the on-disk files,
    not just the session catalog entry — a catalog-only reset lets a
    later session's append register an external table OVER the previous
    generation's parquet and resurrect its deletion vectors."""
    prefix = "tmbu4"
    loc = tempfile.mkdtemp(prefix="tmbu4_")
    reset_tombstones(spark, prefix, loc)
    append_tombstones(spark, _ids(spark, [1, 2]), prefix, loc, "doc_id")
    tomb_dir = os.path.join(loc, TOMBSTONES_SUBDIR)
    assert glob.glob(os.path.join(tomb_dir, "*.parquet"))

    reset_tombstones(spark, prefix, loc)
    assert not spark.catalog.tableExists(tombstones_table_name(prefix))
    assert not glob.glob(os.path.join(tomb_dir, "*.parquet"))

    # simulate the fresh session: DROP the catalog entry only (as a new
    # session's empty catalog would present) and re-append. Spark's
    # append-on-missing-table would run as CREATE, REPLACING the files
    # at the path and silently deleting the prior session's vector —
    # append_tombstones must REFUSE instead (VERDICT r12 #7: the guard
    # flips this pin from documenting the hazard to asserting the
    # refusal)
    append_tombstones(spark, _ids(spark, [9]), prefix, loc, "doc_id")
    spark.sql(f"DROP TABLE IF EXISTS {tombstones_table_name(prefix)}")
    with pytest.raises(RuntimeError, match="not registered in this session"):
        append_tombstones(spark, _ids(spark, [3]), prefix, loc, "doc_id")
    # the prior vector's files are untouched by the refused append
    assert glob.glob(os.path.join(tomb_dir, "*.parquet"))
    # a store rebuild (reset) clears the hazard and appends work again
    reset_tombstones(spark, prefix, loc)
    nxt = append_tombstones(spark, _ids(spark, [3]), prefix, loc, "doc_id")
    assert [r.doc_id for r in nxt.collect()] == [3]
