"""Ad-hoc probe: events-table edge-corpus parity (development tool).

Builds a small events fixture full of cross-engine divergence triggers
(NULL user/type/value/props/ts, malformed JSON, exact-timestamp ties)
plus empty side tables, then compares every batch events query
builder-vs-oracle with the driver's multiset semantics. The committed
regression test lives in tests/test_edge_events_parity.py; this script
exists to iterate on new edge rows and print full diffs.

Usage: python scripts/edge_events_probe.py [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import tempfile
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

B = dt.datetime(2024, 3, 1, 10, 0, 0)


def ts(m: int, s: int = 0) -> dt.datetime:
    return B + dt.timedelta(minutes=m, seconds=s)


EDGE_EVENTS = [
    # normal traffic: 3 users, views→clicks→purchases across 3 hours
    (1, ts(0), 100, "page_view", 0.0, '{"k": 1}'),
    (2, ts(1), 100, "click", 0.0, '{"k": 2}'),
    (3, ts(2), 100, "purchase", 120.0, '{"k": 3}'),
    (4, ts(60), 200, "page_view", 0.0, '{"k": 4}'),
    (5, ts(62), 200, "add_to_cart", 0.0, '{"k": 5}'),
    (6, ts(65), 200, "purchase", 80.0, '{"k": 6}'),
    (7, ts(120), 300, "page_view", 0.0, '{"k": 7}'),
    (8, ts(125), 300, "page_view", 0.0, '{"k": 8}'),
    # edge rows
    (9, ts(10), None, "click", 0.0, '{"k": 9}'),  # NULL user
    (10, ts(11), 100, None, 0.0, '{"k": 10}'),  # NULL event_type
    (11, ts(12), 100, "purchase", None, '{"k": 11}'),  # NULL value
    (12, ts(13), 200, "click", 0.0, None),  # NULL props
    (13, ts(14), 200, "click", 0.0, "{bad json"),  # malformed props
    (14, ts(15), 200, "click", 0.0, '{"k": "abc"}'),  # non-numeric k
    (15, ts(16), 300, "click", 0.0, '{"k": 1, "x": "y"}'),  # extra key
    (16, ts(2), 100, "click", 0.0, '{"k": 12}'),  # exact ts tie with id 3
    (17, None, 300, "click", 0.0, '{"k": 13}'),  # NULL ts
    # year/week boundary: ISO week 1 of the NEXT year (weekly seasonality,
    # date_trunc/extract parity at the wrap)
    (18, dt.datetime(2024, 12, 31, 23, 59, 59), 100, "purchase", 49.995, '{"k": 14}'),
    (19, dt.datetime(2025, 1, 1, 0, 0, 0), 100, "view", 0.0, '{"k": 15}'),
    # negative purchase value (refund) — sums, EWMA, z-scores must agree
    (20, ts(20), 200, "purchase", -75.25, '{"k": 16}'),
    # non-ASCII event type (falls outside the known enum on both engines)
    (21, ts(21), 300, "クリック", 0.0, '{"k": 17}'),
    # epoch-adjacent timestamp (extreme hour bucket arithmetic)
    (22, dt.datetime(1970, 1, 1, 0, 0, 1), 200, "click", 0.0, '{"k": 18}'),
    # negative user_id (r8): % follows the dividend's sign in both engines,
    # so modulo bucketing (zorder u, md5 salts, skew shards) must pmod
    (23, ts(22), -5, "click", 0.0, '{"k": 19}'),
    # pre-epoch ts (r8): negative epoch_us — hour-bucket quotients and
    # moduli go negative; zorder h must stay in [0, 256)
    (24, dt.datetime(1969, 12, 31, 22, 59, 0), 100, "click", 0.0, '{"k": 20}'),
    # watermark-boundary adversaries (r10): the engine's late-row filter
    # is INCLUSIVE (ts <= watermark is late) and the session-window
    # variant tests the SESSION END (ts + 30min gap). Three rows pin the
    # boundary band the r10 review found untested:
    #  - exactly-epoch: dropped by the dedup twin (ts <= initial wm 0),
    #    KEPT by session_window (end = +30min > 0)
    (25, dt.datetime(1970, 1, 1, 0, 0, 0), 200, "click", 0.0, '{"k": 21}'),
    #  - 15 min before epoch: inside one gap — session end +15min > 0, so
    #    session_window KEEPS a pre-epoch row (the band the old ts >=
    #    epoch oracle floor wrongly excluded)
    (26, dt.datetime(1969, 12, 31, 23, 45, 0), 300, "click", 0.0, '{"k": 22}'),
    #  - exactly one gap before epoch: session end == 0 == wm, dropped
    #    INCLUSIVELY by session_window
    (27, dt.datetime(1969, 12, 31, 23, 30, 0), 300, "click", 0.0, '{"k": 23}'),
]

STREAMING_EVENT_QUERIES = [
    "streaming_hourly_metrics", "streaming_dashboard_metrics",
    "streaming_session_windows", "streaming_stateful_sessions",
    "streaming_click_attribution", "streaming_exactly_once_dedup",
    "streaming_sliding_windows", "streaming_top_users",
    "streaming_kmv_distinct", "streaming_user_ewma",
    "streaming_late_data_audit",
]

BATCH_EVENT_QUERIES = [
    "event_props_map_profile", "ab_test_readout", "events_kmv_distinct",
    "session_event_paths", "hourly_metrics_incremental",
    "user_activity_similarity", "events_weekly_seasonality", "hourly_metrics",
    "dashboard_metrics", "event_type_distribution",
    "conversion_by_duration_bucket", "latest_hour_conversion",
    "pipeline_status_union", "user_activity_profile", "session_first_event",
    "events_enriched", "recent_events_window", "session_metrics",
    "session_cart_contents", "events_json_deadletter",
    "skew_salted_event_counts", "user_retention_cohorts", "funnel_conversion",
    "daily_active_users", "event_type_markov", "events_rollup_hypertable",
    "events_anomaly_zscore", "events_sliding_windows", "user_entropy_profile",
    "hourly_gapfill_locf", "user_interarrival_stats", "user_value_ewma",
    "sql_gateway_hourly_revenue", "key_skew_profile",
    "kmv_audience_overlap", "events_zorder_stats",
    "events_countmin_heavy_hitters", "user_event_sequences",
    "watermark_delay_calibration", "user_bot_flags",
]


def build_fixture(spark) -> str:
    from e_commerce_click_stream_spark.io import TABLES, table

    out = tempfile.mkdtemp(prefix="ev_edge_")
    spark.createDataFrame(
        EDGE_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    for name in TABLES:
        if name == "events":
            continue
        table(spark, "/root/testdata/sf0.001", name).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))
    return out


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    from e_commerce_click_stream_spark.plans.registry import all_specs
    from e_commerce_click_stream_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="edge-events-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = build_fixture(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{out}/events.parquet/*.parquet'"
    )
    failures = []
    for name in BATCH_EVENT_QUERIES:
        if only and name not in only:
            continue
        spec = all_specs()[name]
        try:
            sdf = spec.builder(spark, out)
            scols = sorted(sdf.columns)
            srows = Counter(tuple(norm(r[c]) for c in scols) for r in sdf.collect())
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-ERR] {name}: {type(e).__name__} {str(e)[:100]}")
            failures.append(name)
            continue
        try:
            cur = con.execute(spec.oracle)
            ocn = [d[0] for d in cur.description]
            ocols = sorted(ocn)
            idx = [ocn.index(c) for c in ocols]
            orows = Counter(tuple(norm(r[i]) for i in idx) for r in cur.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"[ORACLE-ERR] {name}: {type(e).__name__} {str(e)[:100]}")
            failures.append(name)
            continue
        if scols != ocols:
            print(f"[SCHEMA] {name}: {scols} vs {ocols}")
            failures.append(name)
            continue
        if srows == orows:
            print(f"[ok] {name} ({sum(srows.values())} rows)")
        else:
            failures.append(name)
            print(f"[VALUE-MISMATCH] {name}")
            for r in sorted(srows - orows, key=repr):
                print("   spark-only :", r)
            for r in sorted(orows - srows, key=repr):
                print("   oracle-only:", r)
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
