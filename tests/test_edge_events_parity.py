"""Cross-engine parity on an EDGE-CASE events table for every batch
events-only query.

Companion to tests/test_edge_corpus_parity.py (documents table). The
constructed fixture carries the event-stream divergence triggers a
regenerated fixture could introduce at any round: NULL user_id /
event_type / value / props / ts, malformed and non-numeric props JSON,
and exact-timestamp ties. This matrix found and drove the fixes for:
NULL user/ts sessionization divergence (Spark NULLS FIRST vs DuckDB
NULLS LAST + concat_ws vs ``||``), DuckDB concat() skipping NULL in the
md5 bucket hashes, plain ANSI casts on props values, DuckDB json
functions RAISING on malformed JSON where Spark returns NULL, Spark
collect_list dropping NULL elements where DuckDB list() keeps them, and
a NULL-user group counted as a distinct user by the incremental view.

The streaming twins run here too — as REAL streams over the dirty
replay (this probe found the replay stager rejecting directory-shaped
fixtures, a NULL-user session_window group the batch twin excludes, and
NULL-ts rows silently dropped by window() but kept by the oracles)."""

from __future__ import annotations

from collections import Counter

import pytest

from scripts.edge_events_probe import (
    BATCH_EVENT_QUERIES,
    STREAMING_EVENT_QUERIES,
    build_fixture,
    norm,
)
from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()


@pytest.fixture(scope="module")
def events_dir(spark):
    return build_fixture(spark)


@pytest.fixture(scope="module")
def events_duck(events_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{events_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


# hourly_gapfill_locf densifies the fixture's deliberately adversarial
# 1969→2025 time span into a ~4.8M-row hour×type grid; Counter-comparing
# every row in Python cost ~110 s of the suite for no extra signal. The
# comparison samples instead: ALL rows carrying observed data plus every
# 59th grid hour per type — a forward-fill divergence propagates to every
# subsequent grid row of its type, so the systematic sample catches any
# LOCF break while the observed rows keep full rounding/NULL coverage.
# The epoch offset keeps the hour index positive (Spark `div` truncates,
# DuckDB `//` floors — they only agree on non-negatives).
_SAMPLED_COMPARE = {
    "hourly_gapfill_locf": (
        "n_events > 0 OR (unix_seconds(hour_b) + 3153600000) div 3600 % 59 = 0",
        "n_events > 0 OR (CAST(epoch(hour_b) AS BIGINT) + 3153600000)"
        " // 3600 % 59 = 0",
    ),
}


def _compare(spark, events_dir, events_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, events_dir)
    oracle_sql = spec.oracle
    if name in _SAMPLED_COMPARE:
        spark_where, duck_where = _SAMPLED_COMPARE[name]
        sdf = sdf.where(spark_where)
        oracle_sql = f"SELECT * FROM ({oracle_sql}) _t WHERE {duck_where}"
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = events_duck.execute(oracle_sql)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert len(s_rows) > 0
    assert s_rows == o_rows


@pytest.mark.parametrize("name", BATCH_EVENT_QUERIES)
def test_events_query_parity_on_edge_fixture(spark, events_dir, events_duck, name):
    _compare(spark, events_dir, events_duck, name)


@pytest.mark.parametrize("name", STREAMING_EVENT_QUERIES)
def test_streaming_query_parity_on_edge_fixture(spark, events_dir, events_duck, name):
    _compare(spark, events_dir, events_duck, name)
