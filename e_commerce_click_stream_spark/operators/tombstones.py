"""Shared deletion-vector plumbing for the persisted index stores.

All three store families (BM25 postings, MinHash band, IVF) implement
GDPR erasure the same way: erased ids land in a ``<prefix>_tombstones``
table, probes anti-join the broadcast vector (merge-on-read), and a
deferred apply pass physically drops the rows. One definition of the
naming, the build-time reset, and the dedup-append keeps the three
families from drifting (and fixed two shared bugs in one place — see
``reset_tombstones`` and ``append_tombstones``).

Session scope: catalog tables are per-session while the store root is
filesystem-persistent. Every registered store query REBUILDS on a cold
start (``tableExists`` on the main table gates it), so tombstones are
always re-created in the same session that reads them. A library caller
reusing a prior session's store directory WITHOUT rebuilding must
re-register the tombstone table before probing or erasing: prior-session
vectors are invisible to ``anti_join_tombstones`` (no catalog entry),
and the next ``append_tombstones`` would run as CREATE — Spark's
append-on-missing-table REPLACES the files at the path, deleting the
prior vector outright (pinned in tests/test_tombstones.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONES_SUBDIR = "tombstones"


def tombstones_table_name(prefix: str) -> str:
    return f"{prefix}_tombstones"


def reset_tombstones(spark: SparkSession, prefix: str, location: str | None) -> None:
    """A fresh build has no erasures: drop the tombstone table AND its
    on-disk directory. The directory delete matters because the store
    root is filesystem-persistent across sessions while the catalog is
    per-session — a catalog-only reset (the original ``tableExists``
    guard) left the previous generation's parquet files in place, and
    the next session's erase would register an external table OVER them,
    resurrecting stale deletion vectors against the new corpus."""
    spark.sql(f"DROP TABLE IF EXISTS {tombstones_table_name(prefix)}")
    if location:
        shutil.rmtree(os.path.join(location, TOMBSTONES_SUBDIR), ignore_errors=True)


def append_tombstones(
    spark: SparkSession,
    erased_ids: DataFrame,
    prefix: str,
    location: str | None,
    id_col: str,
) -> DataFrame:
    """Append ``erased_ids`` (single column ``id_col``) to the deletion
    vector and return the checkpointed NOT-ALREADY-TOMBSTONED subset.

    The dedup against the existing vector makes erasure IDEMPOTENT:
    GDPR requests repeat and ingest batches retry, and a store whose
    statistics are decremented from the erased docs' stored rows (the
    BM25 family) would otherwise double-decrement df/scalars on a
    repeated id whose physical rows still await ``apply``. Callers
    must decrement from the RETURNED subset only."""
    tomb_t = tombstones_table_name(prefix)
    ids = erased_ids.select(id_col)
    if spark.catalog.tableExists(tomb_t):
        ids = ids.join(F.broadcast(spark.table(tomb_t)), id_col, "left_anti")
    ids = ids.localCheckpoint(eager=True)
    wb = ids.write.mode("append").format("parquet")
    if location:
        wb = wb.option("path", os.path.join(location, TOMBSTONES_SUBDIR))
    wb.saveAsTable(tomb_t)
    return ids


def truncate_tombstones(
    spark: SparkSession, prefix: str, location: str | None
) -> None:
    """Post-apply reset: overwrite the vector with an empty relation of
    the same schema (the table keeps existing — probes' tableExists
    checks stay cheap and the next erase appends into a clean dir)."""
    tomb_t = tombstones_table_name(prefix)
    empty = spark.table(tomb_t).filter(F.lit(False)).localCheckpoint(eager=True)
    wb = empty.write.mode("overwrite").format("parquet")
    if location:
        wb = wb.option("path", os.path.join(location, TOMBSTONES_SUBDIR))
    wb.saveAsTable(tomb_t)


def anti_join_tombstones(
    spark: SparkSession, df: DataFrame, prefix: str, id_col: str
) -> DataFrame:
    """Merge-on-read: anti-join the broadcast deletion vector if one
    exists for this store (one BroadcastHashJoin LeftAnti, no shuffle);
    identity otherwise."""
    tomb_t = tombstones_table_name(prefix)
    if spark.catalog.tableExists(tomb_t):
        return df.join(F.broadcast(spark.table(tomb_t)), id_col, "left_anti")
    return df
