"""Size-derived storage level for corpus-sized local checkpoints.

The r13/r14 x10 scale probes exposed a recurring failure class on
memory-constrained sessions (the driver's vanilla 1 GiB local session):
a builder localCheckpoints a corpus-sized relation at the default
MEMORY_AND_DISK, the blocks pin the unified pool (locally-checkpointed
blocks cannot be evicted — their lineage is truncated), and a later
hash aggregate or broadcast build dies with AGGREGATE_OUT_OF_MEMORY /
notEnoughMemoryToBuildAndBroadcastTable. Worse, the pinned blocks
OUTLIVE the query (the returned DataFrame depends on them), so in a
one-session many-query run — exactly the driver gate's shape — the
pressure accumulates across queries (r13: pagerank_bipartite; r14:
graph_triangle_count and the band-store shingle checkpoint under
dedup_stored_apply_erase).

Unconditional DISK_ONLY fixes the OOM but taxes every small-input run
with a per-round local read (~0.2-0.7 s per reuse at sf0.1 — the r13
pagerank trade). So the level is derived per call site: keep
MEMORY_AND_DISK while the caller's size estimate fits CAP_FRAC of the
session's unified pool (spark.memory.fraction x (heap - 300 MiB
reserve)); disk-back past it. The cap is a quarter, not the whole pool,
because execution (the hash aggs that actually OOMed) needs the rest,
and because several such checkpoints can be alive at once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# at most this fraction of the unified pool may be pinned by one
# corpus-sized checkpoint before it is disk-backed
CAP_FRAC = 0.25
_RESERVED = 300 * 1024 * 1024  # Spark's fixed reserved memory


def corpus_checkpoint_level(spark: SparkSession, est_bytes: float):
    """MEMORY_AND_DISK when ``est_bytes`` fits CAP_FRAC of the unified
    pool, else DISK_ONLY. Estimates should be generous upper bounds —
    the cost of over-estimating is one local disk read per reuse; the
    cost of under-estimating is an OOM on a constrained session."""
    from pyspark.storagelevel import StorageLevel

    heap = spark.sparkContext._jvm.Runtime.getRuntime().maxMemory()
    frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    pool = frac * max(heap - _RESERVED, 0)
    if est_bytes <= CAP_FRAC * pool:
        # DESER, not PySpark's MEMORY_AND_DISK: the Python constant is
        # the SERIALIZED variant, while an argless localCheckpoint uses
        # the JVM default (deserialized) — passing the Python constant
        # silently added per-reuse deserialization CPU to the fast path
        # (caught as a pagerank ratio regression in the r14 bench).
        return StorageLevel.MEMORY_AND_DISK_DESER
    return StorageLevel.DISK_ONLY


def parquet_footprint(sf_dir: str, tbl: str) -> int:
    """On-disk bytes of a fixture table — the job-free input to a size
    estimate (a Spark count() measured ~0.3 s per execution, pure
    overhead for a one-bit level decision). Handles both the driver's
    single-file fixtures and Spark-written directories."""
    import glob
    import os

    p = os.path.join(sf_dir, f"{tbl}.parquet")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet"))
        )
    return os.path.getsize(p)


def parquet_row_count(sf_dir: str, tbl: str) -> int:
    """EXACT row count of a fixture table from parquet FOOTERS — still
    zero Spark jobs (pyarrow reads only the metadata tail of each file,
    ~ms per call), but immune to the bytes-per-row failure class the
    r15 x10 sweep exposed: on the verbatim-copy scale fixtures the
    columns dictionary-compress ~10x, so any bytes//constant estimate
    UNDERCOUNTS rows by the same factor and flips checkpoint levels to
    in-memory at exactly the sizes that pin the pool (the x10
    dedup_incremental_minhash / dedup_ngram_jaccard broadcast-build
    failures: est 8.7k docs -> MEMORY level for a real 50k-doc / ~400 MB
    shingle checkpoint on a 1 GiB session)."""
    import glob
    import os

    import pyarrow.parquet as pq

    p = os.path.join(sf_dir, f"{tbl}.parquet")
    files = (
        glob.glob(os.path.join(p, "*.parquet")) if os.path.isdir(p) else [p]
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
