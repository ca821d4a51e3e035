"""Shared sketch column builders.

The k-minimum-values family (events_kmv_distinct, kmv_audience_overlap,
streaming_kmv_distinct) is defined by ONE hash-fraction expression — the
md5('kmv:'||key) 15-hex prefix over 2^60 — and one k-smallest prune.
Three queries (and their oracles) depend on these being bit-identical:
the streaming store must equal the batch sketch, and the overlap query
merges sketches produced by the same formula. They live here so a change
to the prefix, width, or tie-break happens in exactly one Spark place
(the SQL oracles carry the same formula as static strings; the registry
contract ties them to this definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_DENOM = 1152921504606846976.0  # 2^60 — 15 hex chars span [0, 2^60)


def kmv_frac(key: Column, prefix: str = "kmv:") -> Column:
    """Uniform hash fraction in [0, 1): the first 15 hex chars of
    md5(prefix || key) over 2^60 — deterministic and bit-identical in
    DuckDB ('0x' || substr(md5(...), 1, 15) :: UBIGINT / 2^60)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        / F.lit(KMV_DENOM)
    )


def kmv_prune(
    df: DataFrame,
    k: int,
    group_col: str = "event_type",
    frac_col: str = "frac",
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep each group's k smallest fractions. The rank window carries a
    WindowGroupLimit, so ≤ k rows per group survive each partition BEFORE
    the shuffle — the property that makes the sketch build scale. Pass
    ``tiebreak`` when the input may hold duplicate fractions (the raw
    keyed stream); distinct-frac inputs don't need one."""
    order = [F.col(frac_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
