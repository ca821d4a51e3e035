from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from e_commerce_click_stream_spark.session import get_spark

    spark = get_spark(app_name="tests")
    # test-session-only: ~2050 tests run tiny fixtures through a shared
    # local[32] session; 32-way shuffles cost task-scheduling overhead
    # per stage that dominates at this data size (the suite must fit the
    # external verification window). AQE still coalesces; engine/bench
    # sessions are untouched (session.py defaults unchanged).
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle runner (sf0.001 for speed; the driver
    uses sf0.01)."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()
