"""Simulate the driver's verify pass against __spark_entry__.

Builds a VANILLA SparkSession (no engine-side config — the driver owns the
session), runs entry() as smoke, then every queries() entry at the given sf
dir and compares against oracle_sql() via DuckDB: row count + sorted column
names + order-insensitive normalized value multiset.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm(v):
    """Type-sensitive normalization mirroring the driver's stringified hash.

    The driver stringifies values before hashing, so ``-1`` (int) and ``-1.0``
    (float) hash differently even though Python ``==`` treats them as equal.
    Tag every scalar with its type name so int-vs-float / bool-vs-int oracle
    drift fails HERE instead of in the real gate (this exact class of bug
    slipped through round 1 as lineitem_math_functions).
    """
    if v is None:
        return v
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


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

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, builder in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, SF_DIR)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = sorted(rel.columns)
            d_rows = [tuple(r) for r in rel.fetchall()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        idx_s = [list(sdf.columns).index(c) for c in s_cols]
        idx_d = [list(rel.columns).index(c) for c in d_cols]
        s_norm = sorted(
            (tuple(norm(r[i]) for i in idx_s) for r in s_rows), key=repr
        )
        d_norm = sorted(
            (tuple(norm(r[i]) for i in idx_d) for r in d_rows), key=repr
        )
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
