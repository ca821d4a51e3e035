"""In-place compaction for bucketed catalog stores (VERDICT r11 #6).

The engine's warm stores (BM25 postings, the MinHash band store, IVF
cells) take blind bucket-layout APPENDS per ingest batch — the cheap
path for disjoint new keys, but every batch leaves its own file in every
bucket, and a store that has absorbed hundreds of batches pays a
per-file open cost on every probe. This module rewrites a bucketed
table IN PLACE under the SAME bucket spec, collapsing each bucket to a
single file: probes plan and score exactly as before (the bucket layout
is the contract; pinned by plan-fingerprint and value-identity tests),
only the file count changes.

The rewrite repartitions by the bucket column into ``num_buckets``
partitions before the bucketed write — Spark's ``repartition(n, col)``
and ``bucketBy(n, col)`` share the same Murmur3-pmod assignment, so each
write task holds exactly one bucket's rows and emits exactly one file.
Without it, every task writes its own file per bucket and a 32-partition
snapshot "compacts" into 32 x num_buckets files.

Same concurrent-writer discipline as the append paths: callers hold the
store's build lock (operators/storelock.py) across the rewrite.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bucketed parquet part files carry the bucket id as the _NNNNN suffix:
# part-00017-<uuid>_00003.c000.snappy.parquet -> bucket 3
_BUCKET_SUFFIX_RE = re.compile(r"_(\d{5})(?:\.c\d+)?\.[^.]+\.parquet$")


def bucket_file_counts(location: str) -> dict[tuple[str, int], int]:
    """Files per (partition subdir, bucket) for a bucketed parquet table
    directory — the before/after readout a compaction run is judged by.
    Unpartitioned tables key on ('', bucket); a cell-partitioned store
    (IVF) keys on ('cell=3', bucket). Walks recursively so hive-style
    partition trees of any depth count correctly."""
    counts: dict[tuple[str, int], int] = {}
    for root, _dirs, files in os.walk(location):
        rel = os.path.relpath(root, location)
        rel = "" if rel == "." else rel
        for name in files:
            m = _BUCKET_SUFFIX_RE.search(name)
            if m:
                key = (rel, int(m.group(1)))
                counts[key] = counts.get(key, 0) + 1
    return counts


def compact_bucketed_table(
    spark: SparkSession,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    location: str | None = None,
    sort_col: str | None = None,
    partition_col: str | None = None,
) -> dict[str, object]:
    """Rewrite ``table_name`` in place: same bucket (and partition) spec,
    one file per bucket — per partition directory when the table is also
    hive-partitioned (each write task holds exactly one bucket's rows
    across every partition, so it emits one file per (partition, bucket)
    it sees). Returns the files-before/after readout
    ``{"files_before": {(part, bucket): n}, "files_after": ...}``
    (empty dicts when the table's location isn't a readable local dir).

    The snapshot is eagerly checkpointed BEFORE the overwrite — it reads
    from the very table it replaces (the append-merge discipline). The
    overwrite restates ``location`` for the same reason the append paths
    do: without the path option the replacement becomes a MANAGED table
    whose warehouse directory outlives the session catalog."""
    before = bucket_file_counts(location) if location else {}
    snap = spark.table(table_name).localCheckpoint(eager=True)
    sort_by = sort_col or bucket_col
    w = (
        snap.repartition(num_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
    )
    if partition_col:
        w = w.partitionBy(partition_col)
    w = w.bucketBy(num_buckets, bucket_col).sortBy(sort_by)
    if location:
        w = w.option("path", location)
    w.saveAsTable(table_name)
    after = bucket_file_counts(location) if location else {}
    return {"files_before": before, "files_after": after}
