"""Property-based tests (hypothesis) for the core custom operators —
the test strategy the reference lacks entirely (SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from e_commerce_click_stream_spark.operators.sessionize import (
    SESSION_GAP_SECONDS,
    with_session_id,
)

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=400_000),  # seconds offset
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events_strategy)
def test_sessionize_gap_invariants(spark, raw):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, user, base + dt.timedelta(seconds=off)) for i, (user, off) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = with_session_id(df).collect()

    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)

    for rows_u in by_user.values():
        for prev, cur in zip(rows_u, rows_u[1:]):
            gap = (cur.ts - prev.ts).total_seconds()
            if cur.session_id == prev.session_id:
                # intra-session consecutive gap never exceeds the threshold
                assert gap <= SESSION_GAP_SECONDS
            else:
                # a session break implies the gap exceeded the threshold
                assert gap > SESSION_GAP_SECONDS
        # session ids are user-scoped and contiguous from 1
        seqs = [int(r.session_id.split("-")[1]) for r in rows_u]
        assert seqs[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
