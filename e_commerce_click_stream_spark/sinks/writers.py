"""Table sinks: append, snapshot-overwrite, and keyed upsert.

The reference lands results in Postgres three ways (SURVEY.md §2.1):
append (S3 raw events), full overwrite (S6 dashboard snapshot), and a
hand-rolled temp-table + ``INSERT … ON CONFLICT`` upsert (S4 session
metrics, /root/reference/processor/streaming_processor.py:197-274). Here
the same three semantics target parquet tables:

- append / overwrite are native writer modes;
- upsert is anti-join merge: new rows win, old non-conflicting rows are
  kept, and the result replaces the table via staged-directory swap. On a
  real deployment this is one ``MERGE INTO`` on a Delta/Iceberg table —
  the staging swap exists only because plain parquet directories aren't
  transactional. The partitioning story still holds at scale: the
  anti-join shuffles on the key columns only, and ``partition_by`` keeps
  the table pruned for downstream readers.

``foreach_batch_upsert`` adapts the upsert for ``writeStream.foreachBatch``
— the reference's S4 pattern with the psycopg2 side-channel replaced by a
pure Spark merge (T9).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def append(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """S3 semantics: blind append (duplicates possible on replay — the
    reference accepts the same, SURVEY.md §2.8 T6)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_snapshot(df: DataFrame, path: str) -> None:
    """S6 semantics: replace the whole table with this batch's snapshot."""
    df.write.mode("overwrite").parquet(path)


def upsert(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> None:
    """S4 semantics: keyed merge — incoming rows replace same-key rows,
    other rows survive. Incoming batch is deduplicated on the keys first
    (last-writer-wins is meaningless inside one unordered batch, so any
    single row per key is taken, matching ON CONFLICT DO UPDATE applied in
    batch order)."""
    spark = df.sparkSession
    incoming = df.dropDuplicates(list(keys))
    if _exists(spark, path):
        existing = spark.read.parquet(path)
        merged = incoming.unionByName(
            existing.join(incoming.select(*keys), on=list(keys), how="left_anti")
        )
    else:
        merged = incoming
    _staged_replace(merged, path, partition_by)


def foreach_batch_upsert(
    path: str, keys: Sequence[str], partition_by: Sequence[str] = ()
) -> Callable[[DataFrame, int], None]:
    """foreachBatch adapter for streaming upsert (T9 + S4)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if not batch_df.isEmpty():
            upsert(batch_df, path, keys, partition_by)

    return fn


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    driver: str = "org.postgresql.Driver",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
):
    """Letter-of-parity JDBC sink: the reference lands every batch in
    Postgres via ``df.write.format("jdbc")`` with exactly these options
    (/root/reference/processor/streaming_processor.py:131-170). Returns the
    configured DataFrameWriter; call ``.save()`` to execute (build-only in
    this container — no JDBC driver jar or database is present, and the
    parquet sinks above are the tested re-expression of S3–S6).

    Scale knobs a 1000-executor cluster needs that the reference hardcodes:
    ``batchsize`` (rows per INSERT round-trip) and ``numPartitions`` (cap on
    concurrent connections — without it every task opens its own)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    return writer


def foreach_batch_jdbc_append(
    url: str, table: str, user: str, password: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch adapter matching the reference's raw-event/hourly JDBC
    append sinks (streaming_processor.py:131-170, 296-322): skip empty
    batches, append the rest."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if not batch_df.isEmpty():
            jdbc_writer(batch_df, url, table, user, password, mode="append").save()

    return fn


def _exists(spark: SparkSession, path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") or name == "_SUCCESS" for name in os.listdir(path)
    )


def _staged_replace(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """Write to a staging dir, then swap — needed because overwriting a
    parquet dir that is also a read source of the same plan is undefined."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=".staging_", dir=parent)
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(staging, path)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key — the storage-level answer to repeated fact-fact joins at 100 TB.

    Two tables bucketed on the same key with the same bucket count join
    with ZERO shuffle on either side (Catalyst matches the output
    partitioning to the join's required distribution), and matching
    ``sortBy`` removes the sort from sort-merge joins — the per-join cost
    collapses to a streamed merge of pre-sorted buckets. Requires
    ``saveAsTable`` (bucket metadata lives in the catalog, not the parquet
    files); plain ``.parquet(path)`` writes would silently drop the
    bucketing. See tests/test_bucketing.py for the plan-level proof."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        int(num_buckets), *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
