"""Custom stateful streaming operator: gap sessionization with explicit
per-key state via ``applyInPandasWithState``.

This is the faithful re-expression of the reference's T3 semantics
(/root/reference/processor/streaming_processor.py:172-195: a keyed session
aggregate whose state is never evicted — no watermark), implemented as the
idiomatic Spark custom-state escape hatch instead of an unbounded built-in
agg:

- state key = ``user_id``; state value = the one open session's
  accumulators (start/end µs, per-type counts, revenue);
- an incoming event more than ``gap`` after the open session's end CLOSES
  it (one output row) and opens a new one;
- open sessions stay in state forever, exactly like the reference — the
  bounded-state alternative (``session_window`` + watermark) lives in
  streaming/jobs.py and is the recommended production path.

Scale notes: state is partitioned by user_id (high-cardinality, uniform);
each key holds one fixed-size tuple, so state size is O(active users),
independent of event volume. Batches arrive per key as Arrow frames;
events are sorted per batch, so results are exact for replays where each
key's events arrive in one batch (the finite-replay test path) and
gap-approximate under cross-batch disorder — the same caveat every
event-time sessionizer without watermark reordering has.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from e_commerce_click_stream_spark.operators.sessionize import SESSION_GAP_SECONDS

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("total_events", LongType()),
        StructField("page_views", LongType()),
        StructField("cart_additions", LongType()),
        StructField("purchases", LongType()),
        StructField("purchase_amount", DoubleType()),
        StructField("converted", BooleanType()),
    ]
)

# open-session accumulators: start_us, end_us, total, views, clicks,
# purchases, amount
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("total", LongType()),
        StructField("views", LongType()),
        StructField("clicks", LongType()),
        StructField("purchases", LongType()),
        StructField("amount", DoubleType()),
    ]
)


def _row(user_id: int, acc: tuple) -> dict:
    start_us, end_us, total, views, clicks, purchases, amount = acc
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(end_us, unit="us"),
        "total_events": total,
        "page_views": views,
        "cart_additions": clicks,
        "purchases": purchases,
        "purchase_amount": round(amount, 2),
        "converted": purchases > 0,
    }


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    acc = tuple(state.get) if state.exists else None
    closed: list[dict] = []
    # A key's events within one micro-batch can span multiple Arrow chunks
    # that are NOT globally time-ordered; sorting each chunk independently
    # would split/merge sessions at chunk boundaries. Concatenate first so
    # ordering is global per key per batch.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        for t, etype, value in zip(ts_us, pdf["event_type"], pdf["value"]):
            if acc is not None and t - acc[1] > gap_us:
                closed.append(_row(user_id, acc))
                acc = None
            if acc is None:
                acc = (int(t), int(t), 0, 0, 0, 0, 0.0)
            start_us, _end, total, views, clicks, purchases, amount = acc
            acc = (
                start_us,
                int(t),
                total + 1,
                views + (etype == "view"),
                clicks + (etype == "click"),
                purchases + (etype == "purchase"),
                # NULL-value purchases contribute 0, matching SQL sum()
                # semantics (NaN would otherwise poison the whole session's
                # amount — but only on the close-by-later-event path, since
                # an open session's state rides as typed NULL-free columns)
                amount
                + (
                    float(value)
                    if etype == "purchase" and not pd.isna(value)
                    else 0.0
                ),
            )
    if acc is not None:
        state.update(acc)  # open session lives on — T3 unbounded-state parity
    if closed:
        yield pd.DataFrame(closed)


def stateful_sessionize(events: DataFrame) -> DataFrame:
    """Apply the custom sessionizer to a streaming events DataFrame.

    NULL user/ts rows are dropped before grouping — the same contract as
    the batch ``with_session_id`` (a session needs an owner and a
    position); without it the streaming and batch paths would diverge on
    dirty feeds."""
    return (
        events.select("user_id", "ts", "event_type", "value")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
