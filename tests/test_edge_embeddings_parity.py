"""Cross-engine parity on an EDGE-CASE embeddings table for every
embeddings-only query.

Third edge matrix (after documents and events): the constructed fixture
adds the degenerate vectors a 100 TB embedding shard routinely contains
— an all-zero vector (failed encoder output: no direction, so every
cosine denominator is 0), a NULL embedding, a wrong-dimension vector,
a duplicate vector, and a NULL label. This matrix drove the shared
``_vecs`` input-hygiene gate (similarity.py) and its oracle twin,
including the DuckDB workaround of REBUILDING the gated list —
list_inner_product's NULL check scans the chunk's child buffer and
rejects clean rows when NULL and short vectors share a file."""

from __future__ import annotations

import math
import os
import re
import tempfile
from collections import Counter

import duckdb
import pytest

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()
_OTHER_TABLES = "region nation customer supplier part orders lineitem events documents".split()

EMB_ONLY = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None
    and "embeddings" in s.oracle
    and not any(re.search(rf"\b{t}\b", s.oracle) for t in _OTHER_TABLES)
)


@pytest.fixture(scope="module")
def emb_dir(spark):
    out = tempfile.mkdtemp(prefix="emb_edge_")
    base = table(spark, "/root/testdata/sf0.001", "embeddings").limit(20).collect()
    rows = [(r.vec_id, list(r.embedding), r.label) for r in base]
    dim = len(rows[0][1])
    rows += [
        (1000, [0.0] * dim, 1),  # zero vector: no direction
        (1001, None, 2),  # NULL embedding
        (1002, list(rows[0][1]), None),  # duplicate vector, NULL label
        (1003, [1.0] * 16, 3),  # wrong dimension
        (1004, [None] + [1.0] * 63, 4),  # NULL element: dot-product poison
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return out


@pytest.fixture(scope="module")
def emb_duck(emb_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_dir}/embeddings.parquet/*.parquet'"
    )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", EMB_ONLY)
def test_embeddings_query_parity_on_edge_fixture(spark, emb_dir, emb_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, emb_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect())
    cur = emb_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows


def test_quality_gate_buckets_partition_the_fixture(spark, emb_dir):
    [r] = SPECS["embedding_quality_gate"].builder(spark, emb_dir).collect()
    assert r.total_vectors == 25
    assert r.null_vectors == 1
    assert r.wrong_dim == 2  # the 16-dim vector + the NULL-element vector
    assert r.zero_vectors == 1
    assert r.clean_vectors == 21
    assert (
        r.null_vectors + r.wrong_dim + r.zero_vectors + r.clean_vectors
        == r.total_vectors
    )
