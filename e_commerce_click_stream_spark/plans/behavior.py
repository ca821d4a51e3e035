"""User-behavior analytics over the ``events`` stream table.

Extends the reference's dashboard surface (reference
processor/streaming_processor.py:197-274 computes hourly/session
aggregates for Grafana) with the three classic product-analytics shapes a
clickstream warehouse serves: cohort retention, ordered funnels, and
DAU/WAU engagement. All are expressed as declarative DataFrame plans so
Catalyst keeps partial aggregation map-side and reuses the ``user_id``
hash partitioning across the window chains.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.registry import register

_RETENTION_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, ts::DATE AS day FROM events
),
firsts AS (
    SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
),
sizes AS (
    SELECT cohort_day, count(*) AS cohort_users FROM firsts GROUP BY cohort_day
)
SELECT f.cohort_day,
       date_diff('day', f.cohort_day, a.day) AS day_offset,
       count(DISTINCT a.user_id) AS active_users,
       max(s.cohort_users) AS cohort_users,
       round(count(DISTINCT a.user_id)::DOUBLE / max(s.cohort_users), 6)
           AS retention_rate
FROM activity a
JOIN firsts f ON f.user_id = a.user_id
JOIN sizes s ON s.cohort_day = f.cohort_day
GROUP BY f.cohort_day, day_offset
"""


@register("user_retention_cohorts", oracle=_RETENTION_SQL, tags=("behavior", "retention"))
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active date, one
    row per (cohort_day, day_offset) with the fraction of the cohort still
    active that day.

    Scale shape: the (user, day) distinct and the first-day agg both hash
    on ``user_id``, so the activity→firsts join is co-partitioned (one
    exchange feeds all three); cohort sizes are a date-cardinality table
    (tiny at any event volume) and broadcast."""
    activity = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(F.count("*").alias("n_cohort"))
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("long").alias("day_offset"),
            "active_users",
            F.col("n_cohort").alias("cohort_users"),
            F.round(F.col("active_users").cast("double") / F.col("n_cohort"), 6).alias(
                "retention_rate"
            ),
        )
    )


_FUNNEL_SQL = """
WITH w1 AS (
    SELECT user_id, ts, event_type,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
    FROM events
),
w2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
              OVER (PARTITION BY user_id) AS first_click
    FROM w1
),
w3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > first_click THEN ts END)
              OVER (PARTITION BY user_id) AS first_purchase
    FROM w2
)
SELECT user_id,
       max(first_view) AS first_view,
       max(first_click) AS first_click,
       max(first_purchase) AS first_purchase,
       CASE WHEN max(first_purchase) IS NOT NULL THEN 3
            WHEN max(first_click) IS NOT NULL THEN 2
            WHEN max(first_view) IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM w3
GROUP BY user_id
"""


@register("funnel_conversion", oracle=_FUNNEL_SQL, tags=("behavior", "funnel", "window"))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel per user: each step's first
    timestamp must follow the previous step's (a click before the first
    view doesn't count), plus the furthest stage reached (0-3).

    One hash exchange on ``user_id`` feeds all three window passes and the
    final group-by — Catalyst proves the partitioning is preserved, so the
    chain adds no further shuffles at any event volume."""
    w = Window.partitionBy("user_id")
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    e = e.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    e = e.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    agg = e.groupBy("user_id").agg(
        F.max("first_view").alias("first_view"),
        F.max("first_click").alias("first_click"),
        F.max("first_purchase").alias("first_purchase"),
    )
    stage = (
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .when(F.col("first_view").isNotNull(), 1)
        .otherwise(0)
    )
    return agg.withColumn("funnel_stage", stage.cast("long"))


_DAU_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, ts::DATE AS day FROM events
),
daily AS (
    SELECT ts::DATE AS day, count(DISTINCT user_id) AS dau, count(*) AS n_events
    FROM events GROUP BY day
),
wau AS (
    SELECT d.day, count(DISTINCT a.user_id) AS wau
    FROM daily d JOIN activity a
      ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
)
SELECT d.day, d.dau, d.n_events, w.wau,
       round(d.dau::DOUBLE / w.wau, 6) AS stickiness,
       round(avg(d.dau) OVER (ORDER BY d.day ROWS BETWEEN 6 PRECEDING
                              AND CURRENT ROW), 4) AS dau_7d_avg
FROM daily d JOIN wau w ON w.day = d.day
"""


@register("daily_active_users", oracle=_DAU_SQL, tags=("behavior", "engagement", "window"))
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement report: DAU, trailing-7-day WAU (true distinct users, not
    an average), DAU/WAU stickiness, and a 7-day rolling DAU average.

    WAU is a range join: the day grid (date-cardinality, tiny forever) is
    broadcast against distinct (user, day) activity, fanning each activity
    row out to at most 7 grid days before a hash agg on day — bounded
    blow-up, no all-pairs. The final rolling window runs over per-day rows
    only, so its single-partition sort is over date cardinality, never
    event cardinality."""
    events = table(spark, sf_dir, "events")
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("dau"),
        F.count("*").alias("n_events"),
    )
    grid = daily.select("day")
    wau = (
        activity.join(
            F.broadcast(grid.withColumnRenamed("day", "grid_day")),
            (F.col("day") >= F.date_sub(F.col("grid_day"), 6))
            & (F.col("day") <= F.col("grid_day")),
        )
        .groupBy(F.col("grid_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    rolling = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.join(wau, "day")
        .select(
            "day",
            "dau",
            "n_events",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .withColumn("dau_7d_avg", F.round(F.avg("dau").over(rolling), 4))
    )


_MARKOV_SQL = """
WITH seq AS (
    -- ts IS NOT NULL: an unstamped event has no position in a sequence,
    -- and the engines would order it at opposite ends (Spark NULLS
    -- FIRST, DuckDB NULLS LAST), silently shifting every transition
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events WHERE ts IS NOT NULL
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions,
       round(count(*)::DOUBLE
             / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p_transition
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_type_markov", oracle=_MARKOV_SQL, tags=("behavior", "markov", "window"))
def event_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical event-type transition matrix: per-user event sequences
    (ordered by ts with event_id tiebreak) yield (prev → next) counts and
    row-normalized transition probabilities — the observed counterpart of
    the reference generator's history-conditioned Markov mix (G3,
    reference producer/producer.py event-mix logic).

    One user_id exchange for the lag window, one hash agg on the 5×5
    transition key, then a window over ≤25 rows — nothing downstream of
    the first shuffle scales with event volume."""
    seq = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.lag("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("prev_type"),
        )
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return counts.withColumn(
        "p_transition",
        F.round(F.col("n_transitions").cast("double") / total, 6),
    )


_ROLLUP_SQL = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day_b,
       date_trunc('hour', ts) AS hour_b,
       date_trunc('minute', ts) AS minute_b,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
           AS revenue
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts),
                 date_trunc('minute', ts))
"""


@register("events_rollup_hypertable", oracle=_ROLLUP_SQL, tags=("behavior", "rollup", "timeseries"))
def events_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: minute, hour, day, and
    grand-total rollups of the event stream in ONE pass — the
    multi-granularity materialization a time-series store keeps per
    chunk, expressed as ROLLUP(day, hour, minute) (one Expand + one
    shuffle, never four scans). Coarser grains leave finer buckets NULL,
    exactly like a TimescaleDB continuous-aggregate hierarchy."""
    e = table(spark, sf_dir, "events")
    return (
        e.rollup(
            F.date_trunc("day", "ts").alias("day_b"),
            F.date_trunc("hour", "ts").alias("hour_b"),
            F.date_trunc("minute", "ts").alias("minute_b"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("revenue"),
        )
    )


_ANOMALY_SQL = """
WITH hourly AS (
    -- ts IS NOT NULL: a NULL hour group would sort at opposite ends of
    -- the trailing window per engine (NULLS FIRST vs LAST), shifting
    -- every hour's trailing stats
    SELECT date_trunc('hour', ts) AS hour_b, event_type, count(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
stats AS (
    SELECT hour_b, event_type, n,
           avg(n) OVER w AS mu,
           CASE WHEN count(n) OVER w >= 2 THEN stddev_samp(n) OVER w END AS sigma
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_b
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour_b, event_type, n,
       round(mu, 4) AS trailing_mean,
       round(sigma, 4) AS trailing_std,
       CASE WHEN sigma > 0 THEN round((n - mu) / sigma, 4) END AS zscore,
       coalesce(CASE WHEN sigma > 0 THEN abs((n - mu) / sigma) > 3.0 END, FALSE)
           AS is_anomaly
FROM stats
"""


@register("events_anomaly_zscore", oracle=_ANOMALY_SQL, tags=("behavior", "anomaly", "window"))
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection: each (event_type, hour) count is
    scored against the mean/stddev of its preceding 24 hours (current hour
    excluded, so an anomaly can't suppress itself); |z| > 3 flags. The
    count >= 2 guard keeps the one-sample stddev NULL on both engines
    (Spark would yield NaN, DuckDB NULL).

    The expensive shuffle is the hourly pre-aggregation; the window then
    runs over (type, hour) cardinality — time-dimension rows, not event
    rows — so the per-type sort is trivially bounded forever."""
    hourly = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("hour_b"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_b")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("n").over(w)
    sigma = F.when(F.count("n").over(w) >= 2, F.stddev_samp("n").over(w))
    stats = hourly.select("hour_b", "event_type", "n", mu.alias("mu"), sigma.alias("sigma"))
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return stats.select(
        "hour_b",
        "event_type",
        "n",
        F.round("mu", 4).alias("trailing_mean"),
        F.round("sigma", 4).alias("trailing_std"),
        F.when(F.col("sigma") > 0, F.round(z, 4)).alias("zscore"),
        F.coalesce(
            F.when(F.col("sigma") > 0, F.abs(z) > 3.0), F.lit(False)
        ).alias("is_anomaly"),
    )


_SLIDING_SQL = """
WITH slid AS (
    -- ts IS NOT NULL: Spark's window() silently drops unstamped rows;
    -- without the filter DuckDB would emit a NULL window_start group
    SELECT unnest([time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
                   for k in [0, 1, 2, 3]]) AS window_start,
           event_type, value
    FROM events WHERE ts IS NOT NULL
)
SELECT window_start::TIMESTAMP AS window_start,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
           AS revenue
FROM slid GROUP BY 1
"""


@register("events_sliding_windows", oracle=_SLIDING_SQL, tags=("behavior", "window", "hopping"))
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate: 1-hour windows sliding every 15 minutes
    (each event lands in exactly 4 windows) — the overlapping-window
    extension of the reference's tumbling T2, via ``F.window(slide=)``.
    Spark expands the 4 assignments with an internal generator before one
    hash agg on window start — same Expand-then-aggregate shape as the
    rollup, bounded 4x fan-out at any volume."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "purchases",
            "revenue",
        )
    )


_LTV_SQL = """
WITH firsts AS (
    SELECT o_custkey,
           date_trunc('month', min(o_orderdate))::TIMESTAMP AS cohort_month
    FROM orders GROUP BY o_custkey
),
cohort AS (
    SELECT f.cohort_month,
           date_diff('month', f.cohort_month,
                     date_trunc('month', o.o_orderdate)) AS month_offset,
           o.o_totalprice
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
monthly AS (
    SELECT cohort_month, month_offset,
           count(*) AS n_orders,
           sum(o_totalprice) AS rev_raw
    FROM cohort GROUP BY cohort_month, month_offset
)
SELECT cohort_month, month_offset, n_orders,
       round(rev_raw, 2) AS revenue,
       round(sum(rev_raw) OVER (PARTITION BY cohort_month
                                ORDER BY month_offset NULLS FIRST
                                ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
FROM monthly
"""


@register("customer_ltv_cohorts", oracle=_LTV_SQL, tags=("behavior", "ltv", "cohort", "window"))
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value triangle over ORDERS: customers cohorted by first
    order month, revenue and cumulative revenue per (cohort, month
    offset) — the monetary counterpart of user_retention_cohorts (which
    tracks presence, not spend).

    First-order agg and the cohort join both hash on o_custkey (one
    exchange feeds both); the cumulative window runs per cohort over
    month offsets — time-dimension cardinality, never order
    cardinality."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    offset = F.months_between(
        F.date_trunc("month", "o_orderdate"), F.col("cohort_month")
    ).cast("long")
    monthly = (
        orders.join(firsts, "o_custkey")
        .groupBy("cohort_month", offset.alias("month_offset"))
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("rev_raw"))
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "cohort_month",
        "month_offset",
        "n_orders",
        F.round("rev_raw", 2).alias("revenue"),
        F.round(F.sum("rev_raw").over(w), 2).alias("cum_revenue"),
    )


_ENTROPY_SQL = """
WITH per_type AS (
    SELECT user_id, event_type, count(*) AS c
    FROM events GROUP BY user_id, event_type
),
with_p AS (
    SELECT user_id, c,
           c * 1.0 / sum(c) OVER (PARTITION BY user_id) AS p
    FROM per_type
),
per_user AS (
    SELECT user_id, sum(c) AS n_events,
           count(*) AS n_types,
           round(-sum(p * ln(p)) / ln(2), 6) AS entropy_bits
    FROM with_p
    GROUP BY user_id
)
SELECT user_id, n_events::BIGINT AS n_events, n_types, entropy_bits,
       round(entropy_bits / (ln(5) / ln(2)), 6) AS entropy_norm
FROM per_user
"""


@register("user_entropy_profile", oracle=_ENTROPY_SQL, tags=("behavior", "entropy", "feature"))
def user_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix (bits, plus the
    fraction of the 5-type maximum) — the behavioral-diversity feature a
    bot/anomaly classifier consumes: near-0 = single-action automation,
    near-1 = uniformly mixed activity.

    Two key-local shuffles on user_id ((user, type) pre-agg, then the
    per-user fold over ≤5 rows); the entropy itself is plain column math
    — no UDF, fully codegen'd."""
    per_type = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
    )
    n_user = F.sum("c").over(Window.partitionBy("user_id"))
    p = F.col("c") * 1.0 / n_user
    with_p = per_type.select("user_id", "c", (-p * F.log(p)).alias("term"))
    max_bits = F.lit(math.log(5) / math.log(2))
    return (
        with_p.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("*").alias("n_types"),
            F.round(F.sum("term") / F.lit(math.log(2)), 6).alias("entropy_bits"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            "entropy_bits",
            F.round(F.col("entropy_bits") / max_bits, 6).alias("entropy_norm"),
        )
    )


_GAPFILL_SQL = """
WITH hourly AS (
    -- integer-cent mean: value is cents-valued, so the exact BIGINT sum
    -- + ONE division is bit-identical in any summation order (a double
    -- avg() flips the 4th decimal between engines on big groups), and
    -- floor(x*1e4+0.5)/1e4 instead of round(.,4): cent means land on
    -- EXACT 5th-decimal midpoints (e.g. 47.25375) where Spark's HALF_UP
    -- and DuckDB's double rounding disagree
    SELECT date_trunc('hour', ts) AS hour_b, event_type,
           count(*) AS n_events,
           floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100.0
                 / count(value) + 0.5) / 10000.0 AS observed_avg
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
    FROM events
),
grid AS (
    SELECT g.h AS hour_b, t.event_type
    FROM (SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
          FROM bounds) g
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
joined AS (
    SELECT g.hour_b, g.event_type,
           coalesce(h.n_events, 0) AS n_events,
           h.observed_avg
    FROM grid g LEFT JOIN hourly h
      ON h.hour_b = g.hour_b AND h.event_type = g.event_type
)
SELECT hour_b, event_type, n_events, observed_avg,
       last_value(observed_avg IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM joined
"""


@register("hourly_gapfill_locf", oracle=_GAPFILL_SQL, tags=("behavior", "timeseries", "gapfill"))
def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: the complete hour x event_type grid is
    generated (sequence + explode from a 1-row bounds aggregate — never
    collected), sparse hours join in with zero counts, and the average
    value is forward-filled per type (LOCF via last(ignorenulls)) — the
    densification step a dashboard or feature pipeline needs before
    resampling. Grid size is time-dimension x enum cardinality, so the
    left join's build side stays broadcastable at any event volume."""
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_b"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        # integer-cent mean + floor-rounding — see the oracle comment
        (
            F.floor(
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
                * 100.0
                / F.count("value")
                + 0.5
            )
            / 10000.0
        ).alias("observed_avg"),
    )
    bounds = events.agg(
        F.min(F.date_trunc("hour", "ts")).alias("h0"),
        F.max(F.date_trunc("hour", "ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour_b")
    )
    types = events.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    joined = grid.join(F.broadcast(hourly), ["hour_b", "event_type"], "left").select(
        "hour_b",
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "observed_avg",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "filled_avg", F.last("observed_avg", ignorenulls=True).over(w)
    )


_INTERARRIVAL_SQL = """
WITH gaps AS (
    SELECT user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS gap_us
    FROM events
)
SELECT user_id,
       count(gap_us) AS n_gaps,
       round(avg(gap_us) / 60000000.0, 4) AS mean_gap_min,
       round(min(gap_us) / 60000000.0, 4) AS min_gap_min,
       round(max(gap_us) / 60000000.0, 4) AS max_gap_min,
       round(stddev_samp(gap_us / 60000000.0), 4) AS std_gap_min,
       sum(CASE WHEN gap_us < 1000000 THEN 1 ELSE 0 END)::BIGINT AS sub_second_gaps
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("user_interarrival_stats", oracle=_INTERARRIVAL_SQL, tags=("behavior", "interarrival", "window"))
def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per user (mean/min/max/stddev in
    minutes, plus sub-second burst count) — the cadence features behind
    bot detection and session-gap tuning. Integer-microsecond lag math
    (the engine-wide timestamp discipline), one user_id exchange shared
    by the lag window and the aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    return (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(F.avg("gap_us") / 60000000.0, 4).alias("mean_gap_min"),
            F.round(F.min("gap_us") / 60000000.0, 4).alias("min_gap_min"),
            F.round(F.max("gap_us") / 60000000.0, 4).alias("max_gap_min"),
            F.round(F.stddev_samp(F.col("gap_us") / 60000000.0), 4).alias("std_gap_min"),
            F.sum(F.when(F.col("gap_us") < 1000000, 1).otherwise(0)).alias(
                "sub_second_gaps"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Windowed EWMA: time-decayed per-user engagement

EWMA_ALPHA = 0.3
EWMA_FRAME = 16  # rows in the decay frame (current row + 15 preceding)


def ewma_fold_exprs(vals_col: str = "vals"):
    """(weighted, norm) for the bounded-frame adjust=True EWMA fold over a
    time-ordered value array column: ONE definition shared by the batch
    query and its streaming twin (streaming/jobs.py), whose value-hash
    parity depends on the two folds staying bit-identical. Spark's
    transform lambda index is 0-based, DuckDB's is 1-based - the weight
    exponents account for it (size-1-i vs size-i)."""
    decay = 1 - EWMA_ALPHA
    weighted = F.expr(
        f"aggregate(transform({vals_col}, (x, i) -> x * pow({decay}, "
        f"size({vals_col}) - 1 - i)), cast(0.0 as double), (acc, x) -> acc + x)"
    )
    norm = (1 - F.pow(F.lit(decay), F.size(vals_col))) / EWMA_ALPHA
    return weighted, norm

_EWMA_SQL = f"""
WITH framed AS (
    -- coalesce(value, 0): Spark's collect_list DROPS NULL elements while
    -- DuckDB's list() keeps them, so a NULL value would shift every decay
    -- weight on one engine only; an unvalued event contributes 0 but
    -- still occupies its frame slot. ts IS NOT NULL: unstamped events
    -- have no position (Spark orders NULLS FIRST, DuckDB NULLS LAST).
    SELECT user_id, ts, event_id,
           list(coalesce(value, 0.0)) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {EWMA_FRAME - 1} PRECEDING
                                      AND CURRENT ROW) AS vals,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_events
    FROM events WHERE ts IS NOT NULL
),
scored AS (
    SELECT user_id, n_events,
           round(list_sum(list_transform(vals,
                     (x, i) -> x * pow({1 - EWMA_ALPHA}, len(vals) - i)))
                 / ((1 - pow({1 - EWMA_ALPHA}, len(vals))) / {EWMA_ALPHA}), 6)
               AS ewma_value
    FROM framed WHERE rn = 1
)
SELECT user_id, n_events, ewma_value FROM scored
"""


@register("user_value_ewma", oracle=_EWMA_SQL, tags=("behavior", "window", "timeseries"))
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event ``value`` per user
    (alpha=0.3), reported at each user's latest event — the time-decayed
    engagement score behind churn/recency models.

    Exact infinite-history EWMA is a sequential recurrence (y_i =
    a·x_i + (1-a)·y_{i-1}) — inherently stateful and unexpressible as one
    window pass. The scale-friendly form used here bounds the decay frame
    to the last 16 rows (weights below (1-a)^16 ≈ 0.003 are dropped) with
    pandas-style ``adjust=True`` normalization, making it a single
    windowed collect + array fold per row: one user_id exchange, no UDFs,
    no iteration. The final-row filter reuses the same exchange for its
    row_number. Spark's transform lambda index is 0-based, DuckDB's is
    1-based — the weight exponents account for it (size-1-i vs size-i)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(EWMA_FRAME - 1), Window.currentRow)
    vals = F.collect_list(F.coalesce(F.col("value"), F.lit(0.0))).over(frame)
    weighted, norm = ewma_fold_exprs("vals")
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            vals.alias("vals"),
            F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id"))).alias("rn"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n_events"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round(weighted / norm, 6).alias("ewma_value"),
        )
    )


# ---------------------------------------------------------------------------
# behavioral time-series similarity (PAPERS.md: "Time Series Similarity
# Search for Streaming Data in Distributed Systems", EDBT 2019 — the
# profile-vector formulation, not a code port)

SIMILARITY_TOP_K = 3

_ACTIVITY_SIM_SQL = f"""
WITH totals AS (
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
by_hour AS (
    SELECT user_id, extract(hour FROM ts) AS h, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
prof AS (
    SELECT t.user_id,
           list(coalesce(c.cnt, 0)::DOUBLE / t.n ORDER BY g.h) AS p
    FROM totals t
    CROSS JOIN (SELECT unnest(range(24)) AS h) g
    LEFT JOIN by_hour c ON c.user_id = t.user_id AND c.h = g.h
    GROUP BY t.user_id
),
scored AS (
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           round(list_dot_product(a.p, b.p)
                 / (sqrt(list_sum(list_transform(a.p, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.p, x -> x * x)))), 6) AS cosine
    FROM prof a JOIN prof b ON a.user_id != b.user_id
),
ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY user_a ORDER BY cosine DESC, user_b) AS rank
    FROM scored
)
SELECT user_a, user_b, cosine, rank FROM ranked WHERE rank <= {SIMILARITY_TOP_K}
"""


@register("user_activity_similarity", oracle=_ACTIVITY_SIM_SQL, tags=("behavior", "similarity", "timeseries"))
def user_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral time-series similarity: each user's hour-of-day activity
    histogram becomes a 24-dim share vector (one conditional-sum pass, no
    pivot shuffle beyond the user_id agg), then the top-3 most-similar
    users per user by cosine. The fixture's user population is small
    enough for the exact pair scan shown here; at corpus scale the SAME
    derived vectors feed the embedding ANN paths (sign-LSH banding / IVF
    cells) — this query is the feature-engineering stage, the pair scan
    its exact verifier. Share normalization uses each user's own event
    count, so heavy and light users with the same daily shape match."""
    hours = list(range(24))
    counts = F.array(
        *[
            F.sum(F.when(F.hour("ts") == h, 1).otherwise(0)).cast("double")
            for h in hours
        ]
    )
    # checkpoint: both sides of the pair join reference the profile —
    # lazily each side would re-run the full events aggregation. The
    # per-user norm is computed HERE, once per user (r15 guide §1.2
    # per-task work: the pair stage evaluated sqrt(Σp²) per PAIR — n²
    # array aggregates for a value that only varies per user); sqrt over
    # the same array with the same fold order yields the bit-identical
    # double, so every rounded cosine is unchanged.
    prof = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(counts.alias("c"), F.count("*").alias("n"))
        .select(
            "user_id",
            F.transform("c", lambda x: x / F.col("n")).alias("p"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform("p", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        )
        .localCheckpoint(eager=True)
    )
    # The pair-stage dot is the n² hot loop. zip_with+aggregate are
    # CodegenFallback expressions: every pair allocated a 24-element
    # product array and walked it through an interpreted fold. The
    # unrolled element sum is pure whole-stage-codegen arithmetic — no
    # allocation, no lambda dispatch — and bit-identical: the fold
    # computes (((0.0+x0)+x1)+…+x23), the unrolled sum ((x0+x1)+…+x23),
    # and 0.0+x0 == x0 exactly because every term is a product of
    # non-negative shares (never -0.0); the left-to-right addition order
    # is unchanged, so every round(·, 6) cosine is unchanged.
    dot = F.expr(" + ".join(f"pa[{h}]*pb[{h}]" for h in hours))
    a = prof.select(
        F.col("user_id").alias("user_a"),
        F.col("p").alias("pa"),
        F.col("nrm").alias("na"),
    )
    b = prof.select(
        F.col("user_id").alias("user_b"),
        F.col("p").alias("pb"),
        F.col("nrm").alias("nb"),
    )
    scored = a.join(b, F.col("user_a") != F.col("user_b")).select(
        "user_a",
        "user_b",
        F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("user_a").orderBy(F.desc("cosine"), F.asc("user_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIMILARITY_TOP_K)
        .select("user_a", "user_b", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# weekly seasonality: day-of-week indices over the daily event series

_SEASONALITY_SQL = """
WITH daily AS (
    SELECT ts::DATE AS d, count(*) AS n FROM events GROUP BY 1
),
tot AS (
    SELECT avg(n) AS g FROM daily
)
SELECT CAST(extract(isodow FROM daily.d) AS BIGINT) AS dow_iso,
       count(*) AS n_days,
       round(avg(daily.n), 4) AS avg_daily_events,
       round(stddev_samp(daily.n), 4) AS std_daily_events,
       round(avg(daily.n) / tot.g, 6) AS seasonal_index
FROM daily, tot
GROUP BY dow_iso, tot.g
"""


@register("events_weekly_seasonality", oracle=_SEASONALITY_SQL, tags=("behavior", "timeseries"))
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of the daily event series:
    per ISO weekday, the mean/stddev of daily counts and the seasonal
    index (weekday mean over the global daily mean) — the capacity-
    planning and anomaly-baseline profile. Daily rollup is one shuffle;
    the global mean rides in as a broadcast 1-row aggregate (never a
    single-partition window); weekday() + 1 gives ISO numbering in Spark
    to match DuckDB's extract(isodow)."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    tot = daily.agg(F.avg("n").alias("g"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy((F.expr("weekday(d)") + 1).cast("long").alias("dow_iso"), "g")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg("n"), 4).alias("avg_daily_events"),
            F.round(F.stddev_samp("n"), 4).alias("std_daily_events"),
            F.round(F.avg("n") / F.first("g"), 6).alias("seasonal_index"),
        )
        .drop("g")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: deterministic hash assignment + two-proportion
# z-test — the experimentation surface a clickstream warehouse serves

AB_VALUE_MIN = 100.0  # qualifying-purchase threshold; plain "any purchase"
# saturates at 100% conversion in this domain (every user buys eventually),
# which degenerates the pooled variance — the readout needs a non-trivial metric

_AB_SQL = f"""
WITH users AS (
    -- '||', never concat(): DuckDB concat() SKIPS a NULL argument, so a
    -- NULL user would hash as md5('ab:') where Spark's concat returns
    -- NULL — and an unattributable event belongs to no experiment arm
    -- anyway, so NULL users are excluded outright on both sides
    SELECT user_id,
           CAST(CAST(('0x' || substr(md5('ab:' || user_id), 1, 8))
                AS UBIGINT) AS BIGINT) % 2 AS variant,
           max(CASE WHEN event_type = 'purchase' AND value >= {AB_VALUE_MIN}
               THEN 1 ELSE 0 END) AS converted
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
),
arms AS (
    SELECT count(CASE WHEN variant = 0 THEN 1 END) AS n_a,
           count(CASE WHEN variant = 1 THEN 1 END) AS n_b,
           sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS conv_a,
           sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS conv_b
    FROM users
)
SELECT n_a, n_b,
       CAST(conv_a AS BIGINT) AS conv_a,
       CAST(conv_b AS BIGINT) AS conv_b,
       CASE WHEN n_a > 0 THEN round(conv_a * 1.0 / n_a, 6) END AS rate_a,
       CASE WHEN n_b > 0 THEN round(conv_b * 1.0 / n_b, 6) END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round((conv_b * 1.0 / n_b) - (conv_a * 1.0 / n_a), 6)
            END AS abs_lift,
       CASE WHEN n_a > 0 AND n_b > 0
                 AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
            THEN round(((conv_b * 1.0 / n_b) - (conv_a * 1.0 / n_a))
                       / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                              * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)), 4)
            END AS z_score
FROM arms
"""


@register("ab_test_readout", oracle=_AB_SQL, tags=("behavior", "experiment"))
def ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm experiment readout: users are assigned to variants by a
    seeded md5 hash (deterministic — the same user lands in the same arm
    on every rerun, engine, and epoch; no assignment table to store or
    join), conversion = a qualifying purchase, and the pooled two-proportion
    z-statistic decides significance. Rounded to 4 decimals — the z-test
    is a decision statistic, not a currency amount.

    Scale shape: one hash agg to user grain (the only shuffle —
    user_id-uniform), then a single-row conditional aggregate; no join,
    no window, nothing driver-side. At 100 TB this is the cheapest
    query in the engine: two partial+final agg pairs."""
    users = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= AB_VALUE_MIN),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("variant"),
            "converted",
        )
    )
    arms = users.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    conv = F.col("conv_a") + F.col("conv_b")
    rate_a = F.col("conv_a") * 1.0 / n_a
    rate_b = F.col("conv_b") * 1.0 / n_b
    pooled = conv * 1.0 / (n_a + n_b)
    # the z denominator is 0 when an arm is empty or conversion is 0%/100%
    # — ANSI mode (driver default) raises on it, and the oracle's NULL is
    # the right answer anyway: guard BOTH engines to NULL identically
    defined = (n_a > 0) & (n_b > 0) & (conv > 0) & (conv < n_a + n_b)
    z = F.when(
        defined,
        F.round(
            (rate_b - rate_a)
            / F.sqrt(pooled * (1 - pooled) * (1.0 / n_a + 1.0 / n_b)),
            4,
        ),
    )
    return arms.select(
        "n_a",
        "n_b",
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.when(n_a > 0, F.round(rate_a, 6)).alias("rate_a"),
        F.when(n_b > 0, F.round(rate_b, 6)).alias("rate_b"),
        F.when((n_a > 0) & (n_b > 0), F.round(rate_b - rate_a, 6)).alias("abs_lift"),
        z.alias("z_score"),
    )


# ---------------------------------------------------------------------------
# behavioral-sequence export: the training-dataset builder for sequence
# models (session2vec / next-event prediction) — each user's time-ordered
# event-type string, capped at a fixed context length

SEQ_MAX = 32  # context cap: row_number prunes before any list builds

_SEQUENCES_SQL = f"""
WITH placed AS (
    SELECT user_id,
           coalesce(event_type, 'null') AS et,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, coalesce(event_id, -9223372036854775807),
                          coalesce(event_type, ''))
)
SELECT user_id,
       max(n_events)::BIGINT AS n_events,
       least(max(n_events), {SEQ_MAX})::BIGINT AS seq_len,
       string_agg(et, '>' ORDER BY rn) AS sequence,
       md5(string_agg(et, '>' ORDER BY rn)) AS seq_fp
FROM placed
WHERE rn <= {SEQ_MAX}
GROUP BY user_id
"""


@register("user_event_sequences", oracle=_SEQUENCES_SQL,
          tags=("behavior", "sequence", "export", "window"))
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequence export (first SEQ_MAX events),
    with total event count, effective sequence length, the '>'-joined
    sequence string, and its md5 — the deterministic behavioral-sequence
    dataset a next-event model trains on. Ordering is total on every
    engine: (ts, event_id, event_type) with NULL id/type coalesced INSIDE
    the sort key (Spark orders NULLS FIRST, DuckDB NULLS LAST — a raw
    NULL key would silently permute ties), NULL event_type rendered as a
    'null' token, and rows with NULL user_id or NULL ts (unplaceable)
    excluded outright on both sides.

    Scale shape: one hash shuffle on user_id serves both window passes
    AND the final per-user aggregate (same partitioning, Catalyst adds no
    second exchange); the rn <= SEQ_MAX prune bounds the collected list
    at 32 structs per user BEFORE any array builds, so a hot user costs
    O(events) window work but never an unbounded collect."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    k_id = F.coalesce(F.col("event_id"), F.lit(-9223372036854775807))
    k_ty = F.coalesce(F.col("event_type"), F.lit(""))
    w = Window.partitionBy("user_id").orderBy("ts", k_id, k_ty)
    wc = Window.partitionBy("user_id")
    placed = ev.select(
        "user_id",
        F.coalesce(F.col("event_type"), F.lit("null")).alias("et"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_events"),
    ).filter(F.col("rn") <= SEQ_MAX)
    seq = F.concat_ws(
        ">",
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "et"))), lambda s: s["et"]
        ),
    )
    return placed.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.least(F.max("n_events"), F.lit(SEQ_MAX)).cast("long").alias("seq_len"),
        seq.alias("sequence"),
        F.md5(seq).alias("seq_fp"),
    )


# ---------------------------------------------------------------------------
# Watermark-delay calibration: simulate Structured Streaming's watermark
# progression over the event stream's ARRIVAL order and count what each
# candidate withWatermark delay would DROP. Spark's semantics, mirrored
# exactly: the engine keeps TWO watermark values per micro-batch — the
# EVICTION watermark (max-event-time over batches < k, minus the delay)
# and the LATE-EVENTS watermark, which is the PREVIOUS batch's value,
# i.e. derived from batches < k-1 (Spark separates them so a row is
# never dropped by a watermark it could not have observed; discovered
# empirically by streaming_late_data_audit — the r10 real-engine run
# dropped exactly one batch's worth fewer rows than the unlagged
# recurrence predicted, at two SFs). Late rows are filtered with the
# LAGGED value: a row in batch k is dropped iff ts <= max(epoch 0,
# max-event-time over batches < k-1, minus delay) — INCLUSIVE: equality
# with the watermark is late (confirmed empirically; an exactly-epoch row
# is therefore dropped at the initial watermark too). The epoch-0 floor is
# the r9 discovery (pre-epoch rows are late even in batch 1); the
# watermark never regresses. The readout that picks the delay BEFORE a
# stateful streaming job silently loses data.

WM_BATCH_SIZE = 1000  # arrival micro-batch granularity (event_id order)
WM_DELAY_GRID_MIN = (0, 1, 10, 60)  # candidate delays, minutes

# The watermark recurrence, factored so the SIMULATION oracle (grid over
# event_id arrival order) and the REAL-ENGINE audit oracle
# (streaming_late_data_audit, permuted arrival order, one delay) compose
# the IDENTICAL text — a hand-copied recurrence diverging silently is the
# exact twin-oracle failure mode the r9 review caught.
_WM_BM_WM_CTES = """bm AS (
    SELECT batch, max(ts_us) AS bmax FROM ev GROUP BY batch
),
wm AS (
    SELECT batch,
           max(bmax) OVER (ORDER BY batch
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               AS prior_max
    FROM bm
)"""


def _wm_dropped_sql(delay_sql: str) -> str:
    """The late predicate: epoch-0 floor, never-regressing prior max,
    INCLUSIVE comparison — the engine drops a row whose event time exactly
    equals the late-events watermark (r10 code-review finding, confirmed
    empirically: ts == prior-batch-max - delay is dropped, ts + 1s
    survives; likewise an exactly-epoch row is dropped at the initial
    watermark)."""
    return (
        "e.ts_us <= greatest(0, coalesce(w.prior_max, 0)\n"
        f"                                  - {delay_sql}::BIGINT * 60000000) AS dropped"
    )


_WM_CALIB_SQL = f"""
WITH ev AS (
    SELECT event_id, epoch_us(ts) AS ts_us, event_id // {WM_BATCH_SIZE} AS batch
    FROM events
    WHERE ts IS NOT NULL AND event_id IS NOT NULL
),
{_WM_BM_WM_CTES},
grid AS (
    SELECT unnest([{", ".join(str(d) for d in WM_DELAY_GRID_MIN)}]) AS delay_minutes
),
flagged AS (
    SELECT g.delay_minutes,
           {_wm_dropped_sql("g.delay_minutes")}
    FROM ev e JOIN wm w ON w.batch = e.batch, grid g
)
SELECT delay_minutes,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       round(sum(CASE WHEN dropped THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS drop_frac
FROM flagged
GROUP BY delay_minutes
"""


@register("watermark_delay_calibration", oracle=_WM_CALIB_SQL,
          tags=("streaming", "watermark", "calibration"))
def watermark_delay_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data loss per candidate watermark delay: events replay in
    arrival order (event_id) as WM_BATCH_SIZE micro-batches; the
    simulated LATE-EVENTS watermark for batch k is max(epoch 0, max
    event time over batches < k-1, minus delay), and a row is dropped
    iff ts <= that watermark (INCLUSIVE — boundary equality is late) —
    exactly Spark's semantics: the late-row filter uses the PREVIOUS
    batch's watermark
    (one-batch lag vs the eviction watermark; proven against the real
    engine by streaming_late_data_audit, which replays a permuted
    arrival order through an actual watermarked stream and hash-matches
    this recurrence), including the epoch-0 initialization that drops
    pre-epoch rows at ANY delay (the class the r9 streaming-oracle fix
    addressed; this op QUANTIFIES it). Per grid delay: events seen,
    events a stateful append-mode operator would drop, and the drop
    fraction — the number that picks the withWatermark argument before a
    job silently loses data. NULL-ts rows are excluded (the streaming
    window() drops them regardless of watermark); all comparisons in
    integer microseconds. One fidelity nuance: the engine floors its
    event-time stats to MILLISECONDS before subtracting the delay, so on
    sub-ms-grain timestamps the true watermark can sit up to 999 µs below
    this simulation's — streaming_late_data_audit therefore proves the
    recurrence on second-truncated times, where the two definitions
    coincide exactly (documented there).

    Scale shape: one batch-grain agg over the arrival stream, a prefix
    max over the tiny batch domain (|batches| rows — the only window),
    watermarks broadcast back onto events by batch id, and one
    grid-grain agg; the event-level join is a broadcast hash join at any
    corpus size because |batches| = |events| / {WM_BATCH_SIZE}."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.unix_micros("ts").alias("ts_us"),
            (F.col("event_id") / WM_BATCH_SIZE).cast("bigint").alias("batch"),
        )
    )
    bm = ev.groupBy("batch").agg(F.max("ts_us").alias("bmax"))
    # -2: the late-events watermark lags one batch behind eviction
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -2)
    wm = bm.select("batch", F.max("bmax").over(w).alias("prior_max"))
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d) for d in WM_DELAY_GRID_MIN])
        ).alias("delay_minutes")
    )
    watermark = F.greatest(
        F.lit(0).cast("bigint"),
        F.coalesce("prior_max", F.lit(0))
        - F.col("delay_minutes").cast("bigint") * 60_000_000,
    )
    flagged = (
        ev.join(F.broadcast(wm), "batch")
        .crossJoin(F.broadcast(grid))
        .select("delay_minutes", (F.col("ts_us") <= watermark).alias("dropped"))
    )
    return flagged.groupBy("delay_minutes").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).cast("bigint").alias(
            "n_dropped"
        ),
        F.round(
            F.sum(F.when(F.col("dropped"), 1).otherwise(0)) * 1.0 / F.count("*"), 6
        ).alias("drop_frac"),
    )


# ---------------------------------------------------------------------------
# Bot/automation flags: the behavioral-hygiene gate a pipeline runs before
# training on interaction data — scripted clients poison sequence models.
# Every heuristic is EXACT arithmetic (integer-µs gaps, distinct counts,
# integer volumes) so no float-tolerance class can split the engines:
# robotic cadence = one distinct inter-arrival gap, monotype = one event
# type at volume, volume outlier = 10x the mean per-user volume.

BOT_MIN_EVENTS = 5
BOT_VOLUME_X = 10

_BOT_FLAGS_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_type
    FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
gaps AS (
    SELECT user_id, event_type, ts_us,
           ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
               AS gap_us
    FROM ev
),
per_user AS (
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           round((max(ts_us) - min(ts_us)) / 60000000.0, 4) AS span_minutes,
           count(DISTINCT gap_us)::BIGINT AS n_distinct_gaps,
           count(DISTINCT event_type)::BIGINT AS n_types
    FROM gaps GROUP BY user_id
),
tot AS (SELECT avg(n_events) AS mean_events FROM per_user)
SELECT user_id, n_events, span_minutes, n_distinct_gaps, n_types,
       (n_events >= {BOT_MIN_EVENTS} AND n_distinct_gaps = 1)
           AS constant_cadence,
       (n_events >= {BOT_MIN_EVENTS} AND n_types = 1) AS monotype,
       (n_events > {BOT_VOLUME_X} * mean_events) AS volume_outlier,
       ((n_events >= {BOT_MIN_EVENTS} AND n_distinct_gaps = 1)
        OR (n_events >= {BOT_MIN_EVENTS} AND n_types = 1)
        OR n_events > {BOT_VOLUME_X} * mean_events) AS bot_suspect
FROM per_user, tot
"""


@register("user_bot_flags", oracle=_BOT_FLAGS_SQL,
          tags=("behavior", "hygiene", "bot-detection"))
def user_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation flags: robotic cadence (>= BOT_MIN_EVENTS
    events with exactly ONE distinct inter-arrival gap — human traffic
    never metronomes), monotype behavior (one event type at volume), and
    volume outliers (> BOT_VOLUME_X x the mean per-user event count),
    plus the disjunction a training-data pass drops on. Gaps are exact
    integer microseconds over the ts-sorted sequence (tie order cannot
    change the gap multiset); NULL-ts/user rows are excluded as
    unattributable.

    Scale shape: one per-user lag window (key-local, skew bounded by the
    hottest user) and one per-user agg, checkpointed because both the
    corpus mean and the output read it; the 1-row mean broadcasts back —
    no global window, no float-tolerance comparisons anywhere."""
    # gap stage deliberately NOT shared with user_interarrival_stats:
    # that op keeps NULL users/ts (distribution over everything observed)
    # and breaks ts ties by event_id; this one excludes unattributable
    # rows and needs only the gap MULTISET (tie order can't change it)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
    # checkpoint: the corpus mean AND the output both consume per_user —
    # without it the window + double countDistinct re-derive per branch
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round((F.max("ts_us") - F.min("ts_us")) / 60_000_000.0, 4).alias(
            "span_minutes"
        ),
        F.countDistinct("gap_us").alias("n_distinct_gaps"),
        F.countDistinct("event_type").alias("n_types"),
    ).localCheckpoint(eager=True)
    tot = per_user.agg(F.avg("n_events").alias("mean_events"))
    cadence = (F.col("n_events") >= BOT_MIN_EVENTS) & (F.col("n_distinct_gaps") == 1)
    monotype = (F.col("n_events") >= BOT_MIN_EVENTS) & (F.col("n_types") == 1)
    volume = F.col("n_events") > BOT_VOLUME_X * F.col("mean_events")
    return per_user.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "n_events",
        "span_minutes",
        "n_distinct_gaps",
        "n_types",
        cadence.alias("constant_cadence"),
        monotype.alias("monotype"),
        volume.alias("volume_outlier"),
        (cadence | monotype | volume).alias("bot_suspect"),
    )
