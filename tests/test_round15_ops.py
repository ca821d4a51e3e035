"""Round-15 operator tests: the wedge-stream Bloom prefilter behind
``graph_triangle_count``'s SHUFFLE_HASH close path, and the
footprint-estimate sanity pins (VERDICT r14 #7).

The x10 probe read the old close path at 207 s, ~90 s of it Spark —
dominated by exchanging the full 410M-row wedge stream for a join whose
output is 18.8M triangles. The fix Bloom-prefilters wedges MAP-SIDE
against a dense bitmap over the closing edges; correctness rests on the
filter having no false negatives, which these tests pin directly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_edge_bloom_no_false_negatives_and_filters(spark):
    """Every (v, w) present in the edge set must pass the probe built
    from that edge set (a false negative silently DROPS triangles —
    the one failure mode the exact closing join cannot repair), and
    non-edges must be mostly rejected (the filter's entire point)."""
    from e_commerce_click_stream_spark.plans.graph import (
        _bloom_might_contain,
        _edge_bloom,
    )

    edges = spark.range(2000).select(
        (F.col("id") * 7 % 997).alias("v"), (F.col("id") * 13 % 991).alias("w")
    )
    m_bits = 1 << 16
    bf = _edge_bloom(spark, edges, m_bits)
    passed = (
        edges.join(F.broadcast(bf))
        .where(_bloom_might_contain(m_bits))
        .count()
    )
    assert passed == edges.count()  # zero false negatives

    non_edges = spark.range(4000).select(
        (F.col("id") + 5000).alias("v"), (F.col("id") * 3 + 7777).alias("w")
    )
    # subtract true collisions with the edge domain (keys, not hashes)
    true_hits = non_edges.join(edges, ["v", "w"], "left_semi").count()
    fp = (
        non_edges.join(F.broadcast(bf))
        .where(_bloom_might_contain(m_bits))
        .count()
        - true_hits
    )
    # 2000 keys in 64Ki bits = 32 bits/key, k=3 -> fpp well under 1%;
    # 5% leaves room for hash clumping without letting a broken filter
    # (e.g. mismatched build/probe positions passing everything) slip by
    assert fp / 4000 < 0.05, f"false-positive rate {fp}/4000"


def test_edge_bloom_probe_positions_match_build(spark):
    """A build/probe position mismatch shows up as ~100% rejection (the
    probe reads bits nobody set). Guard: a bitmap built at a DIFFERENT
    size must reject almost everything — proving the probe actually
    depends on the geometry it is handed rather than passing
    vacuously."""
    from e_commerce_click_stream_spark.plans.graph import (
        _bloom_might_contain,
        _edge_bloom,
    )

    edges = spark.range(500).select(
        F.col("id").alias("v"), (F.col("id") + 1).alias("w")
    )
    bf = _edge_bloom(spark, edges, 1 << 16)
    # probe with a SMALLER m_bits: positions stay in-bounds but mostly
    # land on words the build never set (a LARGER probe geometry would
    # index past the array and raise — the deliberate behavior: a
    # geometry mismatch must never silently drop wedges, and element_at,
    # unlike try_element_at+coalesce, fails loudly)
    mismatched = (
        edges.join(F.broadcast(bf))
        .where(_bloom_might_contain(1 << 15))
        .count()
    )
    assert mismatched < 500  # not a tautological always-true predicate


def test_triangle_shuffle_hash_close_plan_shape(spark):
    """The bucketed_close path must keep the r14 invariant (wedges are
    hashed and probed, never sorted) AND carry the r15 bloom: the plan
    contains the ShuffledHashJoin close, the bitmap's broadcast, and no
    sort over the wedge stream's join keys."""
    from e_commerce_click_stream_spark.plans.graph import graph_triangle_count

    df = graph_triangle_count(spark, SF_SMOKE, bucketed_close=True)
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    assert "ShuffledHashJoin" in tree
    # the bloom rides a 1-row broadcast into the wedge stream
    assert "BroadcastNestedLoopJoin" in tree
    assert "CartesianProduct" not in tree


# --- size-estimate sanity pins (VERDICT r14 #7) ---------------------------
# The size-derived checkpoint levels need row/doc counts without Spark
# jobs. r15 opened with bytes-per-row constants over parquet footprints
# and pinned their conservativeness — then the x10 sweep showed the
# whole class is unsalvageable on dictionary-compressing fixtures (the
# verbatim-copy scale probes compress ~5-10x, so any bytes//constant
# UNDERCOUNTS rows by that factor and flips levels to in-memory at
# pool-pinning sizes). The estimates now read EXACT row counts from
# parquet footers (ckptlevel.py::parquet_row_count); these pins hold it
# to exactness on every fixture shape, including the adversarial
# ultra-compressed one that broke the old estimates.


def test_parquet_row_count_exact_on_fixtures(spark):
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.operators.ckptlevel import (
        parquet_row_count,
    )

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        for tbl in ("lineitem", "documents"):
            assert parquet_row_count(sf, tbl) == table(spark, sf, tbl).count()


def test_parquet_row_count_exact_on_compressed_dir_fixture(spark, tmp_path):
    """The shape that broke the bytes-based estimates: a Spark-written
    DIRECTORY whose constant column dictionary-compresses to ~0 B/row.
    The footer count must stay exact where footprint // constant was
    off by orders of magnitude."""
    from e_commerce_click_stream_spark.operators.ckptlevel import (
        parquet_footprint,
        parquet_row_count,
    )

    dense = spark.range(200_000).selectExpr(
        "id AS l_orderkey", "1L AS l_partkey"
    )
    out = os.path.join(str(tmp_path), "lineitem.parquet")
    dense.coalesce(2).write.parquet(out)
    assert parquet_row_count(str(tmp_path), "lineitem") == 200_000
    # and the old failure mode is real: bytes//10 UNDERCOUNTS rows here
    # (~4 B/row after delta+dictionary encoding)
    assert parquet_footprint(str(tmp_path), "lineitem") // 10 < 200_000


def test_shingle_estimate_covers_real_text(spark):
    """The per-doc byte charge the exact doc count is multiplied by must
    keep covering the real average text size with room (the checkpoint
    holds k-word string arrays ~3x the text)."""
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.plans.dedup import SH_EST_BYTES_PER_DOC

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        avg_text = (
            table(spark, sf, "documents")
            .agg(F.avg(F.length("text")))
            .collect()[0][0]
        )
        assert SH_EST_BYTES_PER_DOC >= 3 * avg_text, (
            f"{sf}: avg text {avg_text:.0f} B x3 exceeds "
            f"SH_EST_BYTES_PER_DOC={SH_EST_BYTES_PER_DOC}"
        )


# --- LSH geometry past the corpus-plane clamp (VERDICT r14 #6) ------------


def test_lsh_projection_planes_identical_in_builder_and_oracle(spark, tmp_path):
    """The first corpus size past 2^16 * 8 = 524288 derives band_bits=17
    and switches the hyperplane source from corpus vectors to seeded
    Rademacher projections (md5-parity ±1 components). The pin mirrors
    the r14 boundary test one tier up: at n = 524289 the Spark builder
    and the DuckDB oracle must derive the same geometry AND produce
    identical band rows — proving the projection components are
    bit-identical across engines, not merely same-shaped. (The ≤16-bit
    corpus-plane tier is pinned at 600/2100 in test_round14_ops.py; the
    committed fixtures and the x10 probe never leave it.)"""
    import duckdb

    from e_commerce_click_stream_spark.plans.registry import all_specs
    from tests.test_round14_ops import _synth_embeddings

    n = 524_289
    d = str(tmp_path / "proj")
    os.makedirs(d)
    _synth_embeddings(d, n)

    spec = all_specs()["ann_lsh_buckets"]
    # Row-level cross-engine comparison on a deterministic vector SAMPLE
    # (vec_id % 257 == 0, ~2k vectors): the object under test is the 136
    # Rademacher planes, and every sampled vector's 17-bit band
    # signatures exercise every (plane, component) — a single differing
    # component flips sign-dots for ~half the sample on that plane, so
    # the sample detects any plane divergence while cutting the test
    # from 8.6 min (full 2.1M-row collect + compare in BOTH engines) to
    # seconds of row compare. The GEOMETRY (band_bits=17 from the
    # 524,289 hygiene-passed count, projection-source switch) is still
    # derived from the FULL corpus inside both the builder and the
    # oracle — that part is not sampled.
    sample = "vec_id % 257 = 0"
    n_sample = len(range(0, n, 257))
    rows = spec.builder(spark, d).where(sample).collect()
    assert all(len(r["band_sig"]) == 17 for r in rows)
    assert all(len(r["bucket_signature"]) == 68 for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    oracle = con.execute(
        f"SELECT * FROM ({spec.oracle}) WHERE {sample}"
    ).fetchall()
    con.close()
    s_rows = sorted(
        (r["vec_id"], r["bucket_signature"], r["band_id"], r["band_sig"])
        for r in rows
    )
    assert len(s_rows) == len(oracle) == n_sample * 4
    assert s_rows == sorted(tuple(r) for r in oracle)


# --- size-derived streaming replay partitions (r15 optimization) ----------


def test_replay_state_partitions_derivation(spark):
    """The replay readers derive the stateful-shuffle partition count from
    input bytes (~8 MiB/partition), floored at 4 and capped at the
    session's configured shuffle parallelism — so a tiny fixture replay
    stops paying per-micro-batch state-store lifecycle for partitions it
    does not need, while a cluster-sized replay keeps cluster
    parallelism (nothing local[32]-specific)."""
    from e_commerce_click_stream_spark.streaming import jobs as J

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))

    J._note_replay_size(spark, 2 << 20)  # 2 MiB -> floor
    assert J._replay_parts(spark) == str(min(4, cap))

    J._note_replay_size(spark, 100 << 20)  # 100 MiB -> 13 parts, capped
    assert J._replay_parts(spark) == str(min(13, cap))

    J._note_replay_size(spark, 1 << 40)  # 1 TiB -> always the session cap
    assert J._replay_parts(spark) == str(cap)


def test_run_to_completion_uses_derived_parts(spark):
    """run_to_completion clamps spark.sql.shuffle.partitions to the
    reader-derived value for the duration of the stream (and restores the
    session value after): the sink-side parquet/state layout of the tiny
    fixture replay must come out at the derived width, not the session
    default."""
    from tests.conftest import SF_SMOKE

    from e_commerce_click_stream_spark.streaming.jobs import (
        _replay_parts,
        read_events_stream,
        run_to_completion,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    derived = int(_replay_parts(spark))
    assert derived == 4  # all committed fixtures are < 8 MiB of events
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = run_to_completion(
        stream.groupBy("event_type").count(), "complete"
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert out.count() > 0


def test_cc_fixpoint_fused_convergence_matches_union_find(spark):
    """The r15 fused-prev fixpoint (convergence checked by a filter-count
    scan of the round checkpoint instead of a second new⋈old join job per
    round) must label exactly like a reference union-find — including on
    a chain whose diameter forces many propagation rounds, the shape
    where a wrong convergence test would return split components."""
    import random

    from e_commerce_click_stream_spark.plans.dedup import _cc_fixpoint

    rng = random.Random(1519)
    edges = [(i * 10, (i + 1) * 10) for i in range(23)]  # 23-hop chain
    edges += [
        (rng.randrange(300, 400), rng.randrange(300, 400)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    def union_find(es):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)  # min label wins
        return {n: find(n) for n in parent}

    out = _cc_fixpoint(spark.createDataFrame(edges, "doc_a long, doc_b long"))
    assert out.columns == ["node", "label"]  # consumer contract (unionByName)
    assert dict(map(tuple, out.collect())) == union_find(edges)
