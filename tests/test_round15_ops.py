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


# --- footprint-estimate sanity pins (VERDICT r14 #7) ----------------------
# The size-derived checkpoint levels estimate row/doc counts from parquet
# footprints with per-fixture-family constants. The SAFE direction is
# OVERESTIMATING rows (leans DISK_ONLY); a regenerated fixture that
# compresses better than the constant assumes would silently flip a
# checkpoint to in-memory at a size that OOMs. Pin, per family, that the
# constant stays on the conservative side of the REAL footprint ratio on
# the committed fixtures, and that a constructed violation goes red.


def _real_bytes_per_row(spark, sf_dir: str, tbl: str) -> float:
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.operators.ckptlevel import (
        parquet_footprint,
    )

    return parquet_footprint(sf_dir, tbl) / table(spark, sf_dir, tbl).count()


def test_lineitem_bytes_per_row_constant_conservative(spark):
    """graph.py sizes lineitem rows at footprint // 10: the estimate
    OVERCOUNTS rows iff real compressed bytes/row >= 10. The x10 probe
    fixture compresses to ~2.3 B/row (10 verbatim copies dedup
    beautifully), where the constant UNDERCOUNTS rows 4x — tolerable
    only because the derived level was DISK_ONLY regardless; the
    committed sf fixtures are the ones the in-memory fast path relies
    on, so they are the ones pinned."""
    from e_commerce_click_stream_spark.plans.graph import (
        _LINEITEM_BYTES_PER_ROW,
    )

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        real = _real_bytes_per_row(spark, sf, "lineitem")
        assert real >= _LINEITEM_BYTES_PER_ROW, (
            f"{sf}: lineitem stores {real:.1f} B/row < constant "
            f"{_LINEITEM_BYTES_PER_ROW} — row estimate would UNDERCOUNT"
        )


def test_documents_bytes_per_doc_constant_conservative(spark):
    """dedup.py estimates docs at footprint // 100 and charges
    SH_EST_BYTES_PER_DOC per doc for the shingle checkpoint. Safe iff
    (a) real compressed bytes/doc >= 100 (doc count overcounted) and
    (b) the shingle-array estimate per doc covers the real average text
    size with room (the checkpoint holds k-word string arrays ~3x the
    text)."""
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.plans.dedup import SH_EST_BYTES_PER_DOC

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        real = _real_bytes_per_row(spark, sf, "documents")
        assert real >= 100, (
            f"{sf}: documents store {real:.1f} B/doc < 100 — doc estimate "
            "would UNDERCOUNT"
        )
        avg_text = (
            table(spark, sf, "documents")
            .agg(F.avg(F.length("text")))
            .collect()[0][0]
        )
        assert SH_EST_BYTES_PER_DOC >= 3 * avg_text, (
            f"{sf}: avg text {avg_text:.0f} B x3 exceeds "
            f"SH_EST_BYTES_PER_DOC={SH_EST_BYTES_PER_DOC}"
        )


def test_footprint_pin_goes_red_on_violating_fixture(spark, tmp_path):
    """The pin is only worth keeping if a fixture that violates the
    bound actually fails it: write a parquet that compresses far below
    10 B/row and assert the lineitem check would reject it."""
    dense = spark.range(200_000).selectExpr(
        "id AS l_orderkey", "1L AS l_partkey"  # constant col -> ~0 B/row
    )
    out = os.path.join(str(tmp_path), "lineitem.parquet")
    dense.coalesce(1).write.parquet(out)
    from e_commerce_click_stream_spark.plans.graph import (
        _LINEITEM_BYTES_PER_ROW,
    )

    real = _real_bytes_per_row(spark, str(tmp_path), "lineitem")
    assert real < _LINEITEM_BYTES_PER_ROW  # the violation is detected


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
    rows = spec.builder(spark, d).collect()
    assert all(len(r["band_sig"]) == 17 for r in rows)
    assert all(len(r["bucket_signature"]) == 68 for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    oracle = con.execute(spec.oracle).fetchall()
    con.close()
    s_rows = sorted(
        (r["vec_id"], r["bucket_signature"], r["band_id"], r["band_sig"])
        for r in rows
    )
    assert len(s_rows) == len(oracle) == n * 4
    assert s_rows == sorted(tuple(r) for r in oracle)
