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
and an unguarded ``append_tombstones`` would run as CREATE — Spark's
append-on-missing-table REPLACES the files at the path, deleting the
prior vector outright. ``append_tombstones`` therefore REFUSES to run
when the directory exists on disk but the table is not in the session
catalog (VERDICT r12 #7 — the one store invariant that was enforced by
convention is now enforced in code; pinned in tests/test_tombstones.py).
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
    must decrement from the RETURNED subset only. Duplicates WITHIN the
    incoming batch are collapsed too (``.distinct()``): without it a
    repeated id in one request would land as duplicate tombstone rows —
    the semi-join decrement is unaffected but the broadcast vector
    inflates and count-based accounting breaks (ADVICE r12).

    Refuses (RuntimeError) when the tombstone directory exists on disk
    but the table is not registered in this session: appending would run
    as CREATE and silently REPLACE the prior session's deletion vector
    (VERDICT r12 #7). Rebuild the store (which resets tombstones) or
    re-register the table over the directory before erasing."""
    tomb_t = tombstones_table_name(prefix)
    if location and not spark.catalog.tableExists(tomb_t):
        tomb_dir = os.path.join(location, TOMBSTONES_SUBDIR)
        if os.path.isdir(tomb_dir):
            raise RuntimeError(
                f"tombstone directory {tomb_dir!r} exists but table "
                f"{tomb_t!r} is not registered in this session: appending "
                "would CREATE over the prior deletion vector, deleting it. "
                "Rebuild the store or re-register the tombstone table over "
                "the directory before erasing."
            )
    ids = erased_ids.select(id_col).distinct()
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
