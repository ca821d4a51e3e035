"""Simulate the driver's verify pass against __spark_entry__.

Builds a VANILLA SparkSession (no engine-side config — the driver owns the
session), runs entry() as smoke, then every queries() entry at the given sf
dir and compares against oracle_sql() via DuckDB.

The comparison mirrors the driver's PANDAS-based hasher, not Python value
equality — this distinction has produced three rounds of gate-only failures
(int-vs-float r1, DECIMAL widths r4, HUGEINT + raw-array columns r5):

- the oracle side is fetched via ``rel.df()`` (pandas), so a DuckDB HUGEINT
  sum materializes as float64 and stringifies as ``149174.0`` while Spark's
  bigint gives ``149174`` — a real-gate hash mismatch that ``fetchall()``
  (Python ints both sides) can never see;
- rows are canonicalized with ``DataFrame.sort_values`` over every column,
  which raises ``TypeError: unhashable type: 'list'`` on array cells exactly
  as the driver's hasher does;
- cells are compared STRINGIFIED (the driver hashes strings), so int64 vs
  float64 dtype drift fails even when values are numerically equal.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def canon(pdf, date_cols=frozenset()):
    """Driver-faithful canonical form: columns sorted by name, rows sorted by
    every column (raises on unhashable cells, as the driver does), each cell
    stringified. Returns a list of row tuples of strings.

    ``date_cols`` names the columns that are DATE-typed in the EMITTING
    engine (DuckDB description dtype resp. Spark schema DateType). Only
    those collapse midnight timestamps to a bare ISO date: DuckDB DATE
    fetched via rel.df() lands as datetime64 while Spark's DateType stays
    datetime.date — yet DATE-emitting queries (daily_active_users,
    user_retention_cohorts) hash-matched at the r4 driver gate, so the
    driver normalizes that pair. Collapsing EVERY midnight timestamp would
    go further and hide a genuine DATE-vs-TIMESTAMP column-type divergence
    between engines, which the r4 evidence does not cover — a TIMESTAMP
    column keeps its midnight values distinct ('...T00:00:00') so such
    drift still fails here."""
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    cols = list(pdf.columns)

    def cell(v, is_date):
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return "<NULL>"
        if isinstance(v, pd.Timestamp):
            v = v.tz_localize(None) if v.tzinfo else v
            if is_date and v == v.normalize():
                return v.date().isoformat()
            return v.isoformat()
        return str(v)

    return [
        tuple(cell(v, c in date_cols) for c, v in zip(cols, row))
        for row in pdf.itertuples(index=False)
    ]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entrymod.entry(spark)
    n = df.count()
    print(f"[smoke] entry() -> {n} rows, schema: {df.schema.simpleString()}")
    assert n > 0

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    def release_dead_blocks() -> None:
        """Drop blocks pinned by COMPLETED queries (each query is fully
        collected before the next starts, so its localCheckpoint blocks
        and broadcasts are dead weight afterwards) and nudge the JVM GC
        so the ContextCleaner actually frees them — its periodic GC
        defaults to 30 MINUTES, far longer than a sweep. At the driver's
        sf0.01 this is a no-op; at probe scales (x10 on this 1 GiB
        vanilla heap) the accumulation across a 27-heavy-query sweep
        starved broadcast builds NONDETERMINISTICALLY (different queries
        failed in different sweeps, r14) — bench.py's _release_blocks
        discipline, applied between gate queries.

        INVARIANT (ADVICE r14 #4): no checkpointed DataFrame may outlive
        its query. This unpersists locally-checkpointed RDDs whose
        lineage is truncated and CANNOT be recomputed — safe only
        because each query is fully collected before the next starts and
        nothing is shared across queries. A future cross-query memoized
        checkpoint would fail here unrecoverably (missing-block errors);
        give such state a real store (operators/storelock.py) instead."""
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, builder in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        import pandas as pd

        release_dead_blocks()
        t0 = time.time()
        try:
            sdf = builder(spark, SF_DIR)
            s_cols = sorted(sdf.columns)
            # the driver collects Rows then builds a pandas frame from them
            s_pdf = pd.DataFrame(
                [tuple(r) for r in sdf.collect()], columns=list(sdf.columns)
            )
            from pyspark.sql.types import DateType

            s_dates = frozenset(
                f.name for f in sdf.schema.fields if isinstance(f.dataType, DateType)
            )
            s_norm = canon(s_pdf, s_dates)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_norm)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = sorted(rel.columns)
            d_dates = frozenset(
                c for c, t in zip(rel.columns, rel.types) if str(t) == "DATE"
            )
            # .df(), NOT .fetchall(): HUGEINT/DECIMAL materialize as float64
            # here exactly as in the driver's pandas fetch
            d_norm = canon(rel.df(), d_dates)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        if s_cols != d_cols:
            failures.append(name)
            print(f"[FAIL] {name}: cols spark={s_cols} duck={d_cols}")
        elif len(s_norm) != len(d_norm):
            failures.append(name)
            print(f"[FAIL] {name}: rows spark={len(s_norm)} duck={len(d_norm)}")
        elif s_norm != d_norm:
            failures.append(name)
            bad = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"[FAIL] {name}: values differ, e.g. {bad}")
        else:
            print(f"[OK]   {name}: {len(s_norm)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
