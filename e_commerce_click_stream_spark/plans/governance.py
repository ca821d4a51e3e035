"""SQL-gateway parity, data-quality gates, and skew diagnostics.

The reference's third entry point is raw SQL from dashboards and
notebooks (reference README / Grafana provisioning; SURVEY.md §3.3).
``sql_gateway_hourly_revenue`` proves that surface end-to-end: its
builder is ``spark.sql(...)`` over ``io.register_views`` — and the SQL
string submitted to Spark IS the DuckDB oracle, byte for byte, so the
gateway dialect is verified ANSI-portable, not merely similar.

The other two are the operational queries a warehouse runs about itself:
a dbt-style constraint report and the hot-key profile that decides when
a join needs salting (plans/clickstream.py::skew_salted_event_counts is
the treatment; this is the diagnosis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import register_views, table
from e_commerce_click_stream_spark.operators.sketches import kmv_frac, kmv_prune
from e_commerce_click_stream_spark.operators.textops import lower_folded
from e_commerce_click_stream_spark.plans.registry import register

# one SQL text, two engines — keep it in the ANSI intersection: no ::
# casts, no engine-specific functions, explicit aliases everywhere
_GATEWAY_SQL = """
SELECT date_trunc('hour', ts) AS hour_b,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
           AS revenue,
       round(avg(CASE WHEN event_type = 'purchase' THEN value END), 4)
           AS avg_purchase_value
FROM events
GROUP BY date_trunc('hour', ts)
"""


@register("sql_gateway_hourly_revenue", oracle=_GATEWAY_SQL, tags=("sql-gateway", "A4"))
def sql_gateway_hourly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-consumer entry point executed literally: the identical SQL
    text a Grafana panel would submit runs through ``spark.sql`` over the
    registered views here, and through DuckDB as the oracle — dialect
    portability is part of what's asserted. Plan-wise it compiles to the
    same partial+final hash agg as the DataFrame builders (Catalyst makes
    no distinction)."""
    register_views(spark, sf_dir)
    return spark.sql(_GATEWAY_SQL)


_DQ_SQL = """
SELECT 'lineitem_orphan_orderkey' AS check_name, count(*) AS violations
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'orders_duplicate_pk', count(*) FROM (
    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
) d
UNION ALL
SELECT 'events_null_user', count(*) FROM events WHERE user_id IS NULL
UNION ALL
SELECT 'events_unknown_type', count(*) FROM events
WHERE event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error')
UNION ALL
SELECT 'lineitem_nonpositive_price', count(*) FROM lineitem
WHERE l_extendedprice <= 0
UNION ALL
SELECT 'customer_broken_nation_fk', count(*)
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE n.n_nationkey IS NULL
"""


@register("dq_constraint_report", oracle=_DQ_SQL, tags=("data-quality", "anti-join"))
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style constraint report in one pass: referential integrity
    (orphaned lineitems, broken customer→nation FKs via anti joins),
    primary-key uniqueness, null keys, enum domain, and value ranges —
    each a named check with its violation count. Dimension-side checks
    broadcast; the orphan scan is the only fact-size anti join."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    orphans = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    )
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
    )
    null_user = events.filter(F.col("user_id").isNull())
    bad_type = events.filter(
        ~F.col("event_type").isin("view", "click", "purchase", "signup", "error")
    )
    bad_price = li.filter(F.col("l_extendedprice") <= 0)
    broken_fk = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey, "left_anti"
    )
    return (
        check("lineitem_orphan_orderkey", orphans)
        .unionAll(check("orders_duplicate_pk", dup_pk))
        .unionAll(check("events_null_user", null_user))
        .unionAll(check("events_unknown_type", bad_type))
        .unionAll(check("lineitem_nonpositive_price", bad_price))
        .unionAll(check("customer_broken_nation_fk", broken_fk))
    )


SKEW_TOP = 10

_SKEW_SQL = f"""
WITH per_key AS (
    SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
tot AS (
    SELECT sum(n_events) AS total_events, count(*) AS n_keys,
           avg(n_events) AS mean_per_key
    FROM per_key
)
SELECT p.user_id, p.n_events,
       round(p.n_events * 100.0 / t.total_events, 4) AS share_pct,
       round(p.n_events / t.mean_per_key, 4) AS x_mean
FROM per_key p, tot t
ORDER BY p.n_events DESC, p.user_id
LIMIT {SKEW_TOP}
"""


@register("key_skew_profile", oracle=_SKEW_SQL, tags=("skew", "diagnostics", "topk"))
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis: the SKEW_TOP heaviest user_ids with their
    event share and multiple-of-mean — the report that decides whether a
    downstream join/agg on this key needs salting or AQE skew handling.
    Per-key agg (one shuffle), 1-row totals broadcast, top-k via
    TakeOrderedAndProject with a user_id tiebreak — never a global
    sort."""
    per_key = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    tot = per_key.agg(
        F.sum("n_events").alias("total_events"),
        F.count("*").alias("n_keys"),
        F.avg("n_events").alias("mean_per_key"),
    )
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") * 100.0 / F.col("total_events"), 4).alias(
                "share_pct"
            ),
            F.round(F.col("n_events") / F.col("mean_per_key"), 4).alias("x_mean"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(SKEW_TOP)
    )


# ---------------------------------------------------------------------------
# deterministic training-order shuffle: shard manifest

N_TRAIN_SHARDS = 16

_SHARD_SQL = f"""
WITH hashed AS (
    SELECT doc_id, source, n_chars,
           md5('shard:' || doc_id) AS h
    FROM documents
)
SELECT CAST(CAST(('0x' || substr(h, 1, 8)) AS UBIGINT)
            % {N_TRAIN_SHARDS} AS BIGINT) AS shard,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       count(DISTINCT source) AS n_sources,
       min(CAST(CAST(('0x' || substr(h, 1, 15)) AS UBIGINT) AS BIGINT))
           AS min_hash_prefix,
       max(CAST(CAST(('0x' || substr(h, 1, 15)) AS UBIGINT) AS BIGINT))
           AS max_hash_prefix,
       sum(CAST(CAST(('0x' || substr(h, 9, 8)) AS UBIGINT) AS BIGINT))::BIGINT
           AS order_checksum
FROM hashed
GROUP BY shard
"""


@register("training_shard_manifest", oracle=_SHARD_SQL, tags=("sampling", "shuffle", "manifest"))
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle, audited as a manifest:
    every document is assigned a shard by a seeded md5 (so reruns, the
    oracle, and every epoch agree), and each shard reports its size,
    byte volume, source diversity, hash range (as the numeric 60-bit
    hash prefix — numeric min/max keeps the aggregate a HashAggregate;
    string min/max would force a SortAggregate over every partition),
    and an order-insensitive checksum over a second independent hash
    slice. The writing twin is
    ``df.repartition(shard).sortWithinPartitions(h)`` — this query is the
    audit that the shuffle is balanced and reproducible before an epoch
    is laid down.

    Scale shape: one hash agg on a uniform md5-derived key — shards are
    balanced by construction (binomial around n/16), so no salting is
    ever needed; the checksum sums 32-bit slices into a 64-bit
    accumulator (no overflow until ~2^31 docs per shard, and both
    engines wrap identically in 64-bit if ever exceeded)."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    hashed = docs.select(
        "source", "n_chars", h.alias("h")
    )
    shard = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long") % N_TRAIN_SHARDS
    ).alias("shard")
    return hashed.groupBy(shard).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")).alias(
            "min_hash_prefix"
        ),
        F.max(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")).alias(
            "max_hash_prefix"
        ),
        F.sum(F.conv(F.substring("h", 9, 8), 16, 10).cast("long")).cast("bigint").alias(
            "order_checksum"
        ),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch: a DETERMINISTIC mergeable
# cardinality estimator (Bar-Yossef et al. 2002; the theta-sketch core).
# Unlike HLL (hourly_metrics_approx, rows-only check), the md5-based KMV
# reproduces bit-identically in DuckDB, so the approximate operator gets
# a full value-hash oracle — and it self-grades against the exact count.

KMV_K = 64

_KMV_SQL = f"""
WITH du AS (
    -- NULL users are not users: they would also diverge the engines
    -- (DuckDB concat() skips NULLs; Spark propagates) and a NULL frac
    -- sorts NULLS FIRST in Spark windows but NULLS LAST in DuckDB
    SELECT DISTINCT event_type, user_id FROM events
    WHERE user_id IS NOT NULL
),
hashed AS (
    SELECT event_type, user_id,
           CAST(CAST(('0x' || substr(md5('kmv:' || user_id), 1, 15))
                AS UBIGINT) AS BIGINT) / 1152921504606846976.0 AS frac
    FROM du
),
ranked AS (
    SELECT event_type, frac,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY frac, user_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS exact_distinct
    FROM hashed
)
SELECT event_type,
       max(exact_distinct) AS exact_distinct,
       CASE WHEN max(exact_distinct) < {KMV_K} THEN max(exact_distinct)
            ELSE CAST(floor(({KMV_K} - 1)
                            / max(CASE WHEN rn = {KMV_K} THEN frac END) + 0.5)
                      AS BIGINT) END AS kmv_estimate,
       round(abs(CASE WHEN max(exact_distinct) < {KMV_K} THEN max(exact_distinct)
                      ELSE CAST(floor(({KMV_K} - 1)
                                / max(CASE WHEN rn = {KMV_K} THEN frac END) + 0.5)
                                AS BIGINT) END
                 - max(exact_distinct)) * 1.0 / max(exact_distinct), 4)
           AS rel_error
FROM ranked
WHERE rn <= {KMV_K}
GROUP BY event_type
"""


@register("events_kmv_distinct", oracle=_KMV_SQL, tags=("sketch", "approx", "cardinality"))
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a k-minimum-values sketch
    (k=64): keep each group's 64 smallest md5-derived hash fractions;
    estimate = (k−1)/frac_(k). The sketch is MERGEABLE (k smallest of a
    union = k smallest of the per-partition k-smallest), deterministic,
    and — because the hash is md5 — bit-reproducible in the oracle, so
    this approximate operator gets the full value-hash gate instead of
    the rows-only check HLL needs. Self-grades: emits the exact distinct
    count and the relative error beside the estimate.

    Scale shape: the per-group top-k runs as a rank-pushdown window
    (WindowGroupLimit keeps ≤ k rows per group per partition BEFORE the
    shuffle), so shuffle volume is groups × k, not users; the exact
    column is test-scale self-grading — production drops it and the
    plan collapses to the sketch alone."""
    from pyspark.sql import Window

    du = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    # exact count in its own hash-agg branch, NOT as an unordered window
    # beside the rank window: a count-over-full-group window forces every
    # row through the window sort and disables WindowGroupLimit pruning
    # (verified in the plan) — as a groupBy it stays a partial+final agg
    # and joins back over group cardinality (broadcast)
    counts = du.groupBy("event_type").agg(F.count("*").alias("exact_distinct"))
    frac = kmv_frac(F.col("user_id"))
    hashed = du.select("event_type", "user_id", frac.alias("frac"))
    w = Window.partitionBy("event_type").orderBy("frac", "user_id")
    ranked = hashed.select(
        "event_type",
        "frac",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= KMV_K)
    sketch = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == KMV_K, F.col("frac"))).alias("kth"),
        F.count("*").alias("n_in_sketch"),
    )
    # floor(x + 0.5), not round(): Spark rounds half-up, DuckDB half-away
    # (same convention as embedding_sq8_error) — exact-.5 estimates must
    # land identically in both engines
    est = F.when(F.col("n_in_sketch") < KMV_K, F.col("n_in_sketch")).otherwise(
        F.floor((KMV_K - 1) / F.col("kth") + 0.5).cast("bigint")
    )
    exact = F.col("exact_distinct")
    # null-safe join key: a NULL event_type is still a real group (the
    # oracle computes both branches in one grouped pass, so it keeps it);
    # a plain equi-join would silently drop it
    return sketch.join(
        F.broadcast(counts), sketch["event_type"].eqNullSafe(counts["event_type"])
    ).select(
        sketch["event_type"].alias("event_type"),
        exact.alias("exact_distinct"),
        est.alias("kmv_estimate"),
        F.round(F.abs(est - exact) * 1.0 / exact, 4).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# snapshot diff: what changed between two corpus versions — the audit a
# recurring crawl/curation pipeline runs before re-training on the new
# snapshot (added / removed / content-changed docs, per source)

_SNAPDIFF_SQL = """
WITH v1 AS (
    SELECT doc_id, source,
           md5(lower(translate(regexp_replace(trim(text), '\\s+', ' ', 'g'), 'İΣ', 'iσ'))) AS fp
    FROM documents
    WHERE CAST(CAST(('0x' || substr(md5('v1:' || doc_id), 1, 8))
               AS UBIGINT) AS BIGINT) % 10 < 9
),
v2 AS (
    SELECT doc_id, source,
           CASE WHEN CAST(CAST(('0x' || substr(md5('mut:' || doc_id), 1, 8))
                     AS UBIGINT) AS BIGINT) % 20 = 0
                THEN md5('mutated:' || doc_id)
                ELSE md5(lower(translate(regexp_replace(trim(text), '\\s+', ' ', 'g'), 'İΣ', 'iσ')))
                END AS fp
    FROM documents
    WHERE CAST(CAST(('0x' || substr(md5('v2:' || doc_id), 1, 8))
               AS UBIGINT) AS BIGINT) % 10 < 9
),
j AS (
    SELECT coalesce(v1.source, v2.source) AS source,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.fp <> v2.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT source, status, count(*) AS n_docs
FROM j
GROUP BY source, status
"""


@register("corpus_snapshot_diff", oracle=_SNAPDIFF_SQL,
          tags=("governance", "diff", "full-outer"))
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: per (source, status) counts of
    added / removed / changed / unchanged documents between two versions
    of the corpus — the change audit a recurring-crawl pipeline runs
    before retraining. The two versions are derived deterministically
    from the fixture (each drops a different md5-chosen ~10%, and v2
    mutates a ~5% slice's content), so the diff logic — full-outer join
    on doc_id, fingerprint comparison for content change — is exercised
    with all four statuses populated.

    Scale shape: both snapshot scans reduce to (doc_id, source, fp)
    before the join (fingerprints, not text, move through the shuffle);
    the full-outer join hashes on doc_id — uniform, no skew — and the
    status classification is a per-row CASE. At 100 TB this is two scans
    + one co-partitioned join; the output is source × 4 rows."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(lower_folded(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))

    def bucket(seed: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")

    v1 = docs.filter(bucket("v1:") % 10 < 9).select(
        "doc_id", "source", fp.alias("fp")
    )
    v2 = docs.filter(bucket("v2:") % 10 < 9).select(
        "doc_id",
        "source",
        F.when(
            bucket("mut:") % 20 == 0,
            F.md5(F.concat(F.lit("mutated:"), F.col("doc_id").cast("string"))),
        )
        .otherwise(fp)
        .alias("fp"),
    )
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return j.groupBy("source", "status").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# KMV set operations: audience overlap between event types from MERGED
# k-minimum-values sketches — union/intersection/jaccard distinct estimates
# without ever shuffling the full user sets together

_KMV_OVERLAP_SQL = f"""
WITH du AS (
    SELECT DISTINCT event_type, user_id FROM events
    WHERE user_id IS NOT NULL
),
hashed AS (
    SELECT event_type, user_id,
           CAST(CAST(('0x' || substr(md5('kmv:' || user_id), 1, 15))
                AS UBIGINT) AS BIGINT) / 1152921504606846976.0 AS frac
    FROM du
),
ranked AS (
    SELECT event_type, frac,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY frac, user_id) AS rn
    FROM hashed
),
sk AS (
    SELECT event_type, list(frac ORDER BY frac) AS s
    FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
),
counts AS (
    SELECT event_type, count(*) AS n FROM du GROUP BY event_type
),
inter AS (
    SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_inter
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.s AS ska, b.s AS skb,
           list_sort(list_distinct(list_concat(a.s, b.s)))[1:{KMV_K}] AS m
    FROM sk a JOIN sk b ON a.event_type < b.event_type
),
est AS (
    SELECT type_a, type_b,
           CASE WHEN len(m) < {KMV_K} THEN len(m)
                ELSE CAST(floor(({KMV_K} - 1) / m[len(m)] + 0.5) AS BIGINT)
           END AS union_est,
           len(list_intersect(m, list_intersect(ska, skb)))::DOUBLE / len(m)
               AS rho
    FROM pairs
)
SELECT e.type_a, e.type_b,
       ca.n + cb.n - coalesce(i.exact_inter, 0) AS exact_union,
       e.union_est,
       coalesce(i.exact_inter, 0) AS exact_intersection,
       CAST(floor(e.rho * e.union_est + 0.5) AS BIGINT) AS intersection_est,
       floor(e.rho * 10000 + 0.5) / 10000 AS jaccard_est
FROM est e
JOIN counts ca ON ca.event_type = e.type_a
JOIN counts cb ON cb.event_type = e.type_b
LEFT JOIN inter i ON i.ta = e.type_a AND i.tb = e.type_b
"""


@register("kmv_audience_overlap", oracle=_KMV_OVERLAP_SQL,
          tags=("sketch", "approx", "cardinality", "set-ops"))
def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every pair of event types, estimated from
    MERGED k-minimum-values sketches: |A∪B| from the k smallest hash
    fractions of the union-of-sketches (KMV is closed under union),
    jaccard from the fraction ρ of the merged sketch present in both
    input sketches, |A∩B| = ρ·|A∪B| — the theta-sketch set-operation
    workflow (Beyer et al., "On Synopses for Distinct-Value Estimation
    Under Multiset Operations", SIGMOD'07) on deterministic md5 hashes so
    the whole thing value-hash-verifies against DuckDB. Exact union /
    intersection ride along as self-grading columns.

    Scale shape: each type's sketch is k rows (WindowGroupLimit prunes
    to ≤k per partition pre-shuffle, as in events_kmv_distinct); the
    pair stage joins |types|² sketch ROWS (arrays of 64 doubles), never
    user sets — at 10⁹ users per type the merge still touches 64 values
    per pair. The exact columns are test-scale self-grading: production
    drops them and with them the only user-level self-join."""
    du = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds sketch, counts, and self-join
    )
    ranked = kmv_prune(
        du.select("event_type", "user_id", kmv_frac(F.col("user_id")).alias("frac")),
        KMV_K,
        tiebreak="user_id",
    )
    # |types| rows each; materialized so the a/b self-join and the two
    # count joins don't re-run the window resp. the count agg per branch
    sk = ranked.groupBy("event_type").agg(
        F.sort_array(F.collect_list("frac")).alias("s")
    ).localCheckpoint(eager=True)
    counts = du.groupBy("event_type").agg(
        F.count("*").alias("n")
    ).localCheckpoint(eager=True)
    inter = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.s").alias("ska"),
        F.col("b.s").alias("skb"),
        F.slice(F.array_sort(F.array_union("a.s", "b.s")), 1, KMV_K).alias("m"),
    )
    kth = F.element_at("m", F.size("m"))
    union_est = F.when(F.size("m") < KMV_K, F.size("m").cast("bigint")).otherwise(
        F.floor((KMV_K - 1) / kth + 0.5).cast("bigint")
    )
    rho = F.size(F.array_intersect("m", F.array_intersect("ska", "skb"))).cast(
        "double"
    ) / F.size("m")
    est = pairs.select(
        "type_a", "type_b", union_est.alias("union_est"), rho.alias("rho")
    )
    ca = counts.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        est.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .join(
            F.broadcast(inter),
            (F.col("ta") == F.col("type_a")) & (F.col("tb") == F.col("type_b")),
            "left",
        )
        .select(
            "type_a",
            "type_b",
            (F.col("na") + F.col("nb") - F.coalesce("exact_inter", F.lit(0))).alias(
                "exact_union"
            ),
            "union_est",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_intersection"),
            F.floor(F.col("rho") * F.col("union_est") + 0.5)
            .cast("bigint")
            .alias("intersection_est"),
            (F.floor(F.col("rho") * 10000 + 0.5) / 10000).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout planning: Morton-interleave (user, hour) and chunk the
# sort order into files; report per-file min-max envelopes on BOTH
# dimensions vs a plain time-sorted layout — the data-skipping audit behind
# OPTIMIZE ZORDER-style table maintenance

ZORDER_BITS = 8  # per-dimension bucket bits (256 buckets each)
ZORDER_FILE_ROWS = 512  # rows per simulated file chunk


def _morton_terms(u: str, h: str, div: str) -> str:
    """Interleaved 2×8-bit Morton code as pure integer arithmetic —
    ``div`` is the engine's integer-division operator ('DIV' for Spark,
    '//' for DuckDB); everything else is engine-portable."""
    terms = []
    for k in range(ZORDER_BITS):
        terms.append(f"(({u} {div} {1 << k}) % 2) * {1 << (2 * k + 1)}")
        terms.append(f"(({h} {div} {1 << k}) % 2) * {1 << (2 * k)}")
    return " + ".join(terms)


def _zorder_sql() -> str:
    # non-negative modulus on both engines (((x % m) + m) % m here, pmod in
    # the builder): both engines' % follows the dividend's sign, so a
    # negative user_id or pre-1970 ts would otherwise emit negative,
    # non-interleaved Morton codes. Quotients are exact integer division
    # (// resp. div), truncating toward zero in both engines.
    m = 1 << ZORDER_BITS
    morton = _morton_terms("u", "h", "//")
    return f"""
WITH base AS (
    SELECT event_id,
           ((user_id % {m}) + {m}) % {m} AS u,
           (((epoch_us(ts) // 3600000000) % {m}) + {m}) % {m} AS h,
           epoch_us(ts) AS us
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
coded AS (
    SELECT event_id, u, h, us, {morton} AS z FROM base
),
zfiles AS (
    SELECT u, h,
           (row_number() OVER (ORDER BY z, event_id) - 1)
               // {ZORDER_FILE_ROWS} AS file_id
    FROM coded
),
lfiles AS (
    SELECT u, h,
           (row_number() OVER (ORDER BY us, event_id) - 1)
               // {ZORDER_FILE_ROWS} AS file_id
    FROM coded
),
layouts AS (
    SELECT 'zorder' AS layout, file_id, u, h FROM zfiles
    UNION ALL
    SELECT 'linear' AS layout, file_id, u, h FROM lfiles
)
SELECT layout, file_id,
       count(*) AS n_rows,
       min(u) AS u_min, max(u) AS u_max,
       max(u) - min(u) + 1 AS u_span,
       min(h) AS h_min, max(h) AS h_max,
       max(h) - min(h) + 1 AS h_span
FROM layouts
GROUP BY layout, file_id
"""


@register("events_zorder_stats", oracle=_zorder_sql(),
          tags=("layout", "zorder", "data-skipping"))
def events_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit: interleave 8-bit (user, hour)
    buckets, chunk the resulting sort order into fixed-size files, and
    emit each file's min-max envelope on BOTH dimensions beside the same
    stats for a plain time-sorted layout. A z-ordered file covers a small
    RECTANGLE of (user, hour) space, so file-level min-max statistics
    prune scans for predicates on EITHER column — the audit a table-
    maintenance job (Delta/Iceberg OPTIMIZE ZORDER BY) runs to decide
    whether rewriting pays. Morton coding is plain integer arithmetic,
    identical in both engines.

    Scale shape: the global sort models the layout job itself (on a
    cluster: range-partition by z — a terasort, run rarely and amortized
    across every subsequent pruned scan); the audit output is one row
    per file, so the agg shuffles file-count rows, not events."""
    # pmod (not %) so negative user_ids / pre-epoch timestamps still land
    # in [0, 256) — % follows the dividend's sign in both engines and a
    # negative bucket would poison the Morton interleave; the hour quotient
    # is exact integer `div` (truncating, same as DuckDB //), not a
    # double-division round-trip
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            F.pmod(F.col("user_id"), F.lit(1 << ZORDER_BITS)).alias("u"),
            F.pmod(
                F.expr("unix_micros(ts) div 3600000000"), F.lit(1 << ZORDER_BITS)
            ).alias("h"),
            F.unix_micros("ts").alias("us"),
        )
    )
    coded = ev.select(
        "event_id", "u", "h", "us",
        F.expr(_morton_terms("u", "h", "DIV")).alias("z"),
    )
    from pyspark.sql import Window

    zw = Window.orderBy("z", "event_id")
    lw = Window.orderBy("us", "event_id")
    zfiles = coded.select(
        "u", "h",
        F.floor((F.row_number().over(zw) - 1) / ZORDER_FILE_ROWS).alias("file_id"),
    ).withColumn("layout", F.lit("zorder"))
    lfiles = coded.select(
        "u", "h",
        F.floor((F.row_number().over(lw) - 1) / ZORDER_FILE_ROWS).alias("file_id"),
    ).withColumn("layout", F.lit("linear"))
    return (
        zfiles.unionByName(lfiles)
        .groupBy("layout", "file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max"),
            (F.max("u") - F.min("u") + 1).alias("u_span"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
            (F.max("h") - F.min("h") + 1).alias("h_span"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimation over event users, graded
# against the exact heavy hitters

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP = 20


def _cms_col(d: int, key: str) -> str:
    """DuckDB row-d counter column for ``key``; the Spark twin is
    ``col_d`` inside the builder (same md5-prefix arithmetic)."""
    return (f"CAST(CAST(('0x' || substr(md5('cm{d}:' || {key}), 1, 8)) "
            f"AS UBIGINT) AS BIGINT) % {CMS_WIDTH}")


def _cms_sql() -> str:
    cells = "\n    UNION ALL\n    ".join(
        f"SELECT {d} AS d, {_cms_col(d, 'user_id')} AS col FROM ev"
        for d in range(CMS_DEPTH)
    )
    probes = ",\n           ".join(
        f"{_cms_col(d, 'user_id')} AS col{d}" for d in range(CMS_DEPTH)
    )
    mins = ", ".join(
        f"(SELECT c.n FROM counters c WHERE c.d = {d} AND c.col = t.col{d})"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH ev AS (
    SELECT user_id FROM events WHERE user_id IS NOT NULL
),
cells AS (
    {cells}
),
counters AS (
    SELECT d, col, count(*) AS n FROM cells GROUP BY d, col
),
exact AS (
    SELECT user_id, count(*) AS exact_n,
           row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank
    FROM ev GROUP BY user_id
),
top AS (
    SELECT user_id, exact_n, rank,
           {probes}
    FROM exact WHERE rank <= {CMS_TOP}
)
SELECT t.user_id, t.rank, t.exact_n,
       least({mins}) AS cms_estimate,
       least({mins}) - t.exact_n AS overcount
FROM top t
"""


@register("events_countmin_heavy_hitters", oracle=_cms_sql(),
          tags=("sketch", "approx", "frequency", "heavy-hitters"))
def events_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) over event user
    frequencies — depth 4 × width 256 counters on deterministic md5 row
    hashes, so the sketch is bit-reproducible in DuckDB and the
    never-underestimates guarantee is value-hash-gated: the top-20 exact
    heavy hitters ride along with their CMS estimate and (always ≥ 0)
    overcount.

    Scale shape: the counter table is ONE hash agg over depth×|events|
    cell rows into depth×width(=1024) counters — mergeable by addition
    across partitions, batches, or days, which is why CMS is the
    standard streaming-frequency primitive; the probe joins the top-k
    keys' 4 cells against the 1024-row counter table (broadcast). The
    exact branch is test-scale self-grading."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )

    def col_d(d: int) -> "F.Column":
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cm{d}:"), F.col("user_id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(CMS_WIDTH),
        )

    cells = ev.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), col_d(d).alias("col"))
                for d in range(CMS_DEPTH)
            ])
        ).alias("c")
    ).select("c.d", "c.col")
    # depth×width(=1024) rows, probed once per depth: materialize so the
    # 4 probe joins read the counter table instead of re-running the
    # explode+agg per branch
    counters = (
        cells.groupBy("d", "col").agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    )

    from pyspark.sql import Window

    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    w = Window.orderBy(F.desc("exact_n"), F.asc("user_id"))
    top = (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CMS_TOP)
        .select(
            "user_id", "rank", "exact_n",
            *[col_d(d).alias(f"col{d}") for d in range(CMS_DEPTH)],
        )
    )
    probed = top
    for d in range(CMS_DEPTH):
        cd = counters.filter(F.col("d") == d).select(
            F.col("col").alias(f"col{d}"), F.col("n").alias(f"n{d}")
        )
        probed = probed.join(F.broadcast(cd), f"col{d}")
    est = F.least(*[F.col(f"n{d}") for d in range(CMS_DEPTH)])
    return probed.select(
        "user_id",
        F.col("rank").cast("long").alias("rank"),
        "exact_n",
        est.alias("cms_estimate"),
        (est - F.col("exact_n")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch: mergeable equi-width bins + cumulative walk,
# graded against the exact percentiles — the third sketch family beside
# CMS (frequency) and KMV (cardinality)

QSK_BIN_CENTS = 100000  # $1000-wide bins over integer cents
QSK_QUANTILES = (0.5, 0.9, 0.99)


def _qsketch_sql() -> str:
    qrows = " UNION ALL ".join(f"SELECT {q} AS q" for q in QSK_QUANTILES)
    return f"""
WITH cents AS (
    SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
    FROM lineitem WHERE l_extendedprice IS NOT NULL
),
tot AS (SELECT count(*) AS n FROM cents),
qs AS ({qrows}),
bins AS (
    SELECT c // {QSK_BIN_CENTS} AS bin, count(*) AS bin_n
    FROM cents GROUP BY 1
),
bcum AS (
    SELECT bin, bin_n,
           sum(bin_n) OVER (ORDER BY bin) AS cum
    FROM bins
),
est AS (
    SELECT q.q,
           min(b.bin * {QSK_BIN_CENTS}
               + (q.q * t.n - (b.cum - b.bin_n)) / b.bin_n * {QSK_BIN_CENTS})
               AS est_cents
    FROM qs q, tot t, bcum b
    WHERE b.cum >= q.q * t.n
      AND b.bin = (SELECT min(b2.bin) FROM bcum b2, tot t2
                   WHERE b2.cum >= q.q * t2.n)
    GROUP BY q.q
),
vcum AS (
    SELECT c, count(*) AS vn,
           sum(count(*)) OVER (ORDER BY c) AS cum
    FROM cents GROUP BY c
),
exact AS (
    SELECT q.q, min(v.c) AS exact_cents
    FROM qs q, tot t, vcum v
    WHERE v.cum >= ceil(q.q * t.n)
    GROUP BY q.q
)
SELECT e.q::DOUBLE AS quantile,
       floor(x.est_cents / 100.0 * 100 + 0.5) / 100 AS est_price,
       e.exact_cents / 100.0 AS exact_price,
       floor(abs(x.est_cents - e.exact_cents) / e.exact_cents * 1000000 + 0.5)
           / 1000000 AS rel_error
FROM exact e JOIN est x ON x.q = e.q
"""


@register("lineitem_price_quantile_sketch", oracle=_qsketch_sql(),
          tags=("sketch", "approx", "quantile"))
def lineitem_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile sketch over lineitem prices: bin
    integer cents into $1000 buckets (one mergeable hash agg — counters
    add across partitions/batches, the property t-digest/KLL trade
    accuracy for), walk the cumulative histogram, and linearly
    interpolate p50/p90/p99 inside the crossing bin. The exact
    percentile (discrete: smallest value with cum ≥ ceil(q·n)) rides
    along with the relative error — the sketch grades itself the same
    way the KMV and CMS queries do.

    Scale shape: the sketch branch shuffles ~bins rows (price-range /
    $1000), never data rows; the exact branch's per-value cumulative
    walk is test-scale self-grading — production keeps only the
    histogram."""
    from pyspark.sql import Window

    cents = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("c")
        )
    )
    tot = cents.agg(F.count("*").alias("n"))
    qs = spark.range(len(QSK_QUANTILES)).select(
        F.element_at(
            F.array(*[F.lit(q) for q in QSK_QUANTILES]), (F.col("id") + 1).cast("int")
        ).alias("q")
    )
    bins = cents.groupBy((F.col("c") / QSK_BIN_CENTS).cast("bigint").alias("bin")).agg(
        F.count("*").alias("bin_n")
    )
    bcum = bins.withColumn("cum", F.sum("bin_n").over(Window.orderBy("bin")))
    # quantile probes: 3 rows × ~bins rows — broadcast the probes, keep
    # only the crossing bin (min bin with cum >= q*n), interpolate
    qb = (
        bcum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
    )
    wq = Window.partitionBy("q").orderBy("bin")
    est = (
        qb.withColumn("rn", F.row_number().over(wq))
        .filter("rn = 1")
        .select(
            "q",
            (
                F.col("bin") * QSK_BIN_CENTS
                + (F.col("q") * F.col("n") - (F.col("cum") - F.col("bin_n")))
                / F.col("bin_n")
                * QSK_BIN_CENTS
            ).alias("est_cents"),
        )
    )
    vcum = (
        cents.groupBy("c")
        .agg(F.count("*").alias("vn"))
        .withColumn("cum", F.sum("vn").over(Window.orderBy("c")))
    )
    ex = (
        vcum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(F.min("c").alias("exact_cents"))
    )
    return ex.join(F.broadcast(est), "q").select(
        F.col("q").alias("quantile"),
        (F.floor(F.col("est_cents") / 100.0 * 100 + 0.5) / 100).alias("est_price"),
        (F.col("exact_cents") / 100.0).alias("exact_price"),
        (
            F.floor(
                F.abs(F.col("est_cents") - F.col("exact_cents"))
                / F.col("exact_cents")
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# quality drift between corpus versions: the monitoring twin of
# corpus_snapshot_diff — not WHAT changed but whether the distribution
# a filter pipeline was tuned on still holds

_QDRIFT_SQL = """
WITH scored AS (
    SELECT doc_id, source, n_chars,
           CASE WHEN len(string_split_regex(trim(text), '\\s+')) > 0
                THEN CAST(floor(10000.0
                     * len(list_distinct(string_split_regex(trim(text), '\\s+')))
                     / len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                ELSE 0 END AS uq
    FROM documents WHERE text IS NOT NULL
),
v1 AS (
    SELECT source, count(*) AS n, sum(n_chars) AS chars, sum(uq) AS uqs
    FROM scored
    WHERE CAST(CAST(('0x' || substr(md5('v1:' || doc_id), 1, 8))
               AS UBIGINT) AS BIGINT) % 10 < 9
    GROUP BY source
),
v2 AS (
    SELECT source, count(*) AS n, sum(n_chars) AS chars,
           sum(CASE WHEN CAST(CAST(('0x' || substr(md5('mut:' || doc_id), 1, 8))
                         AS UBIGINT) AS BIGINT) % 20 = 0
                    THEN uq // 2 ELSE uq END) AS uqs
    FROM scored
    WHERE CAST(CAST(('0x' || substr(md5('v2:' || doc_id), 1, 8))
               AS UBIGINT) AS BIGINT) % 10 < 9
    GROUP BY source
)
SELECT coalesce(v1.source, v2.source) AS source,
       coalesce(v1.n, 0) AS n_v1,
       coalesce(v2.n, 0) AS n_v2,
       floor(v1.chars * 100.0 / v1.n + 0.5) / 100 AS mean_chars_v1,
       floor(v2.chars * 100.0 / v2.n + 0.5) / 100 AS mean_chars_v2,
       floor(v1.uqs * 1.0 / v1.n + 0.5) / 10000 AS mean_uq_v1,
       floor(v2.uqs * 1.0 / v2.n + 0.5) / 10000 AS mean_uq_v2,
       floor(v2.uqs * 1.0 / v2.n + 0.5) / 10000
           - floor(v1.uqs * 1.0 / v1.n + 0.5) / 10000 AS uq_drift
FROM v1 FULL OUTER JOIN v2 ON v1.source = v2.source
"""


@register("corpus_quality_drift", oracle=_QDRIFT_SQL,
          tags=("governance", "drift", "monitoring"))
def corpus_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality drift between two corpus versions — the check a
    recurring-crawl pipeline runs so a filter threshold tuned on last
    month's distribution isn't silently filtering this month's: document
    count, mean length, and mean unique-token ratio per source in v1 vs
    v2, with the ratio drift. Versions are the same deterministic splits
    as corpus_snapshot_diff; v2's mutated slice halves its unique ratio
    (modeling boilerplate injection) so the drift column is non-trivially
    exercised. All means are exact integer sums divided once
    (registry summation-order contract).

    Scale shape: one scan per version reduced to |sources| aggregate
    rows (partial+final agg), full-outer joined on source — never a
    doc-level join."""
    from e_commerce_click_stream_spark.operators.textops import tokens

    t = tokens()
    uq = F.when(
        F.size(t) > 0,
        F.floor(10000.0 * F.size(F.array_distinct(t)) / F.size(t)).cast("bigint"),
    ).otherwise(F.lit(0))
    scored = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "n_chars", uq.alias("uq"))
        # dominant cost (regex tokenize + distinct) feeds BOTH version
        # branches: materialize so it runs once, not twice
        .localCheckpoint(eager=True)
    )

    def split(tag: str):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{tag}:"), F.col("doc_id").cast("string"))), 1, 8),
                16, 10,
            ).cast("long") % 10 < 9
        )

    mut = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mut:"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long") % 20 == 0
    )
    v1 = scored.filter(split("v1")).groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum("uq").alias("uqs"),
    )
    v2 = scored.filter(split("v2")).groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(mut, F.floor(F.col("uq") / 2).cast("bigint")).otherwise(F.col("uq"))).alias("uqs"),
    )
    a, b = v1.alias("a"), v2.alias("b")
    mean2 = lambda s, n: F.floor(s * 100.0 / n + 0.5) / 100  # noqa: E731
    mean4 = lambda s, n: F.floor(s * 1.0 / n + 0.5) / 10000  # noqa: E731
    return a.join(b, F.col("a.source") == F.col("b.source"), "full_outer").select(
        F.coalesce("a.source", "b.source").alias("source"),
        F.coalesce("a.n", F.lit(0)).alias("n_v1"),
        F.coalesce("b.n", F.lit(0)).alias("n_v2"),
        mean2(F.col("a.chars"), F.col("a.n")).alias("mean_chars_v1"),
        mean2(F.col("b.chars"), F.col("b.n")).alias("mean_chars_v2"),
        mean4(F.col("a.uqs"), F.col("a.n")).alias("mean_uq_v1"),
        mean4(F.col("b.uqs"), F.col("b.n")).alias("mean_uq_v2"),
        (
            mean4(F.col("b.uqs"), F.col("b.n")) - mean4(F.col("a.uqs"), F.col("a.n"))
        ).alias("uq_drift"),
    )


# ---------------------------------------------------------------------------
# GDPR / right-to-be-forgotten: the erasure-propagation audit a pipeline
# runs BEFORE executing a delete — how many rows in every table an
# erasure request touches, including the second-hop cascade (lineitems of
# deleted orders) that a naive per-table delete orphans

_ERASE_PRED = "ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) % 10 = 3"

_ERASURE_SQL = f"""
WITH erased AS (
    SELECT c_custkey FROM customer WHERE {_ERASE_PRED}
)
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT c_custkey FROM erased))
           AS rows_affected,
       (SELECT count(*) FROM customer) AS total_rows
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM erased)),
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'lineitem',
       (SELECT count(*) FROM lineitem WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM erased))),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'events',
       (SELECT count(*) FROM events WHERE user_id IN (SELECT c_custkey FROM erased)),
       (SELECT count(*) FROM events)
"""

_ERASURE_WRAP = f"""
SELECT table_name, rows_affected, total_rows,
       round(CAST(rows_affected AS DOUBLE) / total_rows, 6) AS affected_frac
FROM ({_ERASURE_SQL}) t
"""


@register("user_erasure_audit", oracle=_ERASURE_WRAP,
          tags=("governance", "gdpr", "semi-join"))
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-propagation audit for a deterministic ~10% erasure cohort
    (md5-bucket of c_custkey — reproducible across engines and runs, like
    every sampling op here): per table, the row count a compliant delete
    removes and its fraction, following the FK cascade customer -> orders
    -> lineitem plus the events stream keyed by user_id. NULL keys can
    never match the cohort (semi-join semantics on both engines).

    Scale shape: the erasure cohort is a broadcast-sized key list (a
    delete request batch); every count is a broadcast LEFT SEMI join on
    the fact side — no fact table ever shuffles — and the two-hop
    lineitem cascade broadcasts the affected order KEYS, not the orders
    table. Four single-row aggregates unioned; at 100 TB each leg is one
    scan with a broadcast filter, the same plan a Delta/Iceberg DELETE
    compiles to before it rewrites files."""
    # same md5-bucket predicate as _ERASE_PRED (Column form: Spark's SQL
    # dialect spells the cast STRING, not VARCHAR)
    erase_pred = (
        F.ascii(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)) % 10 == 3
    )
    erased = table(spark, sf_dir, "customer").filter(erase_pred).select("c_custkey")

    def leg(name: str, hit_df: DataFrame, total_df: DataFrame) -> DataFrame:
        return hit_df.agg(F.count("*").alias("rows_affected")).crossJoin(
            total_df.agg(F.count("*").alias("total_rows"))
        ).select(F.lit(name).alias("table_name"), "rows_affected", "total_rows")

    def semi(df: DataFrame, key: str, cohort: DataFrame, ckey: str) -> DataFrame:
        return df.join(F.broadcast(cohort), df[key] == cohort[ckey], "left_semi")

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    # customer's affected rows ARE the cohort (c_custkey is the filter key
    # and the table's unique key) — no semi-join needed on that leg
    erased_orders = semi(orders, "o_custkey", erased, "c_custkey")
    out = (
        leg("customer", erased, cust)
        .unionByName(leg("orders", erased_orders, orders))
        .unionByName(leg(
            "lineitem",
            semi(li, "l_orderkey", erased_orders.select("o_orderkey"), "o_orderkey"),
            li,
        ))
        .unionByName(leg("events", semi(ev, "user_id", erased, "c_custkey"), ev))
    )
    return out.select(
        "table_name", "rows_affected", "total_rows",
        F.round(F.col("rows_affected").cast("double") / F.col("total_rows"), 6).alias(
            "affected_frac"
        ),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: the re-identification-risk readout a privacy review
# runs BEFORE a dataset ships — group the population by its
# quasi-identifiers (here: nation x market segment x account-balance
# band, the classic "not directly identifying but jointly narrowing"
# columns) and report the group-size distribution. Rows in groups of
# size < K are re-identifiable by linking; the k-anonymity level of the
# release is the smallest group size. Complements user_erasure_audit
# (delete propagation) and the PII scrub (direct identifiers).

K_ANON_THRESHOLD = 5

_K_ANON_SQL = f"""
WITH qi AS (
    SELECT c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
    FROM customer
),
grp AS (
    SELECT c_nationkey, c_mktsegment, bal_band, count(*)::BIGINT AS group_size
    FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
),
tot AS (SELECT sum(group_size)::DOUBLE AS total_rows FROM grp)
SELECT group_size,
       count(*)::BIGINT AS n_groups,
       (group_size * count(*))::BIGINT AS n_rows,
       round(group_size * count(*) / total_rows, 6) AS row_share,
       group_size < {K_ANON_THRESHOLD} AS at_risk
FROM grp, tot
GROUP BY group_size, total_rows
"""


@register("k_anonymity_audit", oracle=_K_ANON_SQL,
          tags=("governance", "privacy", "k-anonymity"))
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size distribution over the quasi-identifier tuple
    (nation, market segment, $1000 account-balance band): per observed
    group size, how many groups and rows sit there, the row share, and
    whether that size class is below the k=K_ANON_THRESHOLD
    re-identification threshold. The release's k-anonymity level is the smallest emitted
    group_size; the at_risk rows are what a suppression/generalization
    pass must fix.

    Scale shape: one groupBy over the quasi-identifier tuple (the only
    corpus-sized shuffle), then a groupBy over the tiny group-size
    domain with the 1-row total attached as a broadcast — no window
    over the full table, no self-join."""
    qi = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("group_size")
    )
    tot = grp.agg(F.sum("group_size").cast("double").alias("total_rows"))
    return (
        grp.groupBy("group_size")
        .agg(F.count("*").alias("n_groups"))
        .crossJoin(F.broadcast(tot))
        .select(
            "group_size",
            "n_groups",
            (F.col("group_size") * F.col("n_groups")).alias("n_rows"),
            F.round(
                F.col("group_size") * F.col("n_groups") / F.col("total_rows"), 6
            ).alias("row_share"),
            (F.col("group_size") < K_ANON_THRESHOLD).alias("at_risk"),
        )
    )
