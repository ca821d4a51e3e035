"""Gap-based sessionization.

The reference's sessions are producer-assigned UUIDs (session_id minted in
/root/reference/producer/models.py:85-94 and ended probabilistically in
/root/reference/producer/producer.py:66-78); its Spark job only groups by
that given key (/root/reference/processor/streaming_processor.py:174).
The driver fixtures carry no session_id, so the engine synthesizes one with
the standard gap rule: a new session starts when a user's inter-event gap
exceeds ``gap_seconds``.

Scale note: the lag/cumsum window partitions by ``user_id`` — at 100 TB this
is a single hash shuffle on a high-cardinality key (hundreds of millions of
users), which distributes evenly; per-user event counts are small so no
single partition's window state is hot. The subsequent session aggregation
groups by (session_id, user_id) whose hash distribution is inherited from
the same key, so AQE can often avoid a second full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800  # 30 min, the classic analytics default


def with_session_id(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Add a deterministic ``session_id`` column (``"<user>-<n>"``).

    Integer microsecond arithmetic end-to-end so the DuckDB oracle can
    reproduce the assignment bit-for-bit.

    Events with a NULL user or NULL timestamp are DROPPED: a session
    needs both an owner and a position. Without the filter the engines
    silently diverge — Spark windows sort NULLS FIRST where DuckDB
    sorts NULLS LAST (shifting every subsequent session number), and a
    NULL user yields session_id "<n>" under concat_ws (which skips
    NULLs) but NULL under DuckDB's ``||`` (which propagates) — found
    by the events edge-corpus parity matrix.
    """
    # stacked parsed-SQL windows (the Column chains cost ~190 gateway
    # roundtrips of plan construction per call): the analyzer's
    # ExtractWindowExpressions produced exactly this two-Window stack
    # from the nested-Column form, and both windows share one
    # partition/order so the exchange+sort is still planned once; the
    # _-prefixed temporaries are dropped so the output schema is
    # events.* + session_id exactly as before
    win = f"PARTITION BY {user_col} ORDER BY {ts_col} ASC, {order_col} ASC"
    return (
        events.filter(f"{user_col} IS NOT NULL AND {ts_col} IS NOT NULL")
        .selectExpr(
            "*", f"lag(unix_micros({ts_col})) OVER ({win}) AS _prev_us"
        )
        .selectExpr(
            "*",
            f"CAST(_prev_us IS NULL OR (unix_micros({ts_col}) - _prev_us)"
            f" > {gap_seconds * 1_000_000} AS INT) AS _is_new",
        )
        .selectExpr(
            "*",
            f"sum(_is_new) OVER ({win} ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) AS _seq",
        )
        .selectExpr(
            "*",
            f"concat_ws('-', CAST({user_col} AS STRING),"
            " CAST(_seq AS STRING)) AS session_id",
        )
        .drop("_prev_us", "_is_new", "_seq")
    )


def sessionize_sql(gap_seconds: int = SESSION_GAP_SECONDS, source: str = "events") -> str:
    """DuckDB CTE body computing the identical session assignment."""
    gap_us = gap_seconds * 1_000_000
    return f"""
        SELECT * EXCLUDE (prev_us, is_new, seq),
               user_id::VARCHAR || '-' || seq::VARCHAR AS session_id
        FROM (
            SELECT *, sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS seq
            FROM (
                SELECT *, CASE WHEN prev_us IS NULL
                                 OR epoch_us(ts) - prev_us > {gap_us}
                               THEN 1 ELSE 0 END AS is_new
                FROM (
                    SELECT *, lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                    FROM {source}
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                )
            )
        )
    """
