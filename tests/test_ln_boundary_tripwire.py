"""Tripwire for the transcendental-input micro-rounding class (ADVICE r10).

BM25 contributions and unigram-LM piece costs are made order-free and
hash-stable by micro-rounding doubles to BIGINT: ``floor(w * 1e6 + 0.5)``.
That kills summation-order drift, but the INPUT ``w`` still comes from
``ln(...)`` evaluated by two different libm implementations (DuckDB's vs
the JVM's Math.log). If ``w * 1e6 + 0.5`` ever lands within ~1 ulp of an
integer boundary on a fixture value, the two engines could floor to
different integers and split score_micro/cost_micro.

These tests measure the actual boundary distance of every such value at
all three fixture scales and fail — with the offending value — if any
sits closer than MIN_DIST. A double ulp at the ~1e7 magnitude of these
products is ~2e-9 and ln's cross-libm disagreement is ≤ 1-2 ulp of the
result, so 1e-7 gives ~50× headroom over the hazard while staying below
the observed minimum distances (3.4e-6 at sf0.1, larger at smaller SFs).

The pre-floor expressions are derived FROM the committed oracle SQL
(string surgery on the exact fragments), not re-implemented — so a
retune of k1/b/scale or the folded tokenization cannot silently leave
the tripwire testing a stale formula.

Residual class, documented: round(x, 6)-style readout columns (tfidf,
bigram NLL) share the same theoretical exposure at their last decimal;
they are derived FROM already-integer micro sums or are pure readouts
the hasher compares after identical rounding on both sides, so the
seven floors checked here (BM25 contrib, round-1 seed cost, round-2
usage cost, DSIR bucket log-ratio, NB bucket log-odds, NB class prior,
mix-sweep pow weight) are the only order-free-sum transcendental
inputs."""

from __future__ import annotations

import os

import duckdb
import pytest

from e_commerce_click_stream_spark.plans.text import (
    _BM25_CORE_SQL,
    _MIX_TEMP_SQL,
    _NB_CLASSIFIER_SQL,
    _BM25_SCALE,
    _DSIR_SQL,
    _UNI_SCALE,
    _UNIGRAM_TRAIN2_SQL,
    _unigram_seed_ctes,
)

MIN_DIST = 1e-7

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _connect(sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no fixtures at {sf_dir}")
    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _bm25_prefloor_sql() -> str:
    """De-floor the committed BM25 contrib and truncate the CTE chain
    after cands, yielding the raw double each engine floors."""
    core = _BM25_CORE_SQL
    de_floored = core.replace("floor(ln(1 +", "(ln(1 +", 1)
    assert de_floored != core, "BM25 floor( marker drifted — update this test"
    marker = f"* {_BM25_SCALE} + 0.5)::BIGINT AS contrib"
    assert marker in de_floored, "BM25 contrib marker drifted — update this test"
    de_floored = de_floored.replace(marker, f"* {_BM25_SCALE} + 0.5) AS preflr")
    cut = de_floored.find("),\nscored AS (")
    assert cut != -1, "BM25 scored CTE marker drifted — update this test"
    head = de_floored[: cut + 1]  # keep the ')' closing cands
    return (
        f"WITH {head} "
        "SELECT min(abs(preflr - round(preflr))) AS d, count(*) AS n FROM cands"
    )


def _unigram_prefloor_sql() -> str:
    seeds = _unigram_seed_ctes()
    marker = f"floor(-ln(k.seed_freq / t.total) * {_UNI_SCALE} + 0.5)::BIGINT"
    assert marker in seeds, "unigram cost marker drifted — update this test"
    return (
        f"WITH {seeds} "
        f"SELECT min(abs(p - round(p))) AS d, count(*) AS n FROM ("
        f"  SELECT -ln(k.seed_freq / t.total) * {_UNI_SCALE} + 0.5 AS p"
        f"  FROM ukept k, utot t)"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_bm25_contrib_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_bm25_prefloor_sql()).fetchone()
    assert n > 0, "BM25 tripwire matched zero candidate terms — vacuous"
    assert d > MIN_DIST, (
        f"a BM25 per-term product sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} candidates scanned) — cross-libm ln() disagreement "
        "could split score_micro between Spark and DuckDB; widen the scale "
        "or perturb the fixture analysis per ADVICE r10"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_unigram_cost_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_unigram_prefloor_sql()).fetchone()
    assert n > 0, "unigram tripwire matched zero vocab pieces — vacuous"
    assert d > MIN_DIST, (
        f"a unigram piece cost sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} pieces scanned) — cross-libm ln() disagreement "
        "could split cost_micro between Spark and DuckDB"
    )


def _unigram_round2_prefloor_sql() -> str:
    """The round-2 cost floor(-ln(used/total)*1e6+0.5) is the THIRD
    order-free-sum transcendental input (r11 review finding): its
    operands (round-1 usage counts) require the full round-1 DP, so the
    committed round-2 oracle is truncated right before vvocab and the
    pre-floor products are computed over uused × uusedtot."""
    sql = _UNIGRAM_TRAIN2_SQL
    cut = sql.find("vvocab AS MATERIALIZED (")
    assert cut != -1, "round-2 vvocab marker drifted — update this test"
    head = sql[:cut].rstrip().rstrip(",")  # drop the trailing comma after uusedtot
    return (
        f"{head} "
        f"SELECT min(abs(p - round(p))) AS d, count(*) AS n FROM ("
        f"  SELECT -ln(u.used_count / t.t) * {_UNI_SCALE} + 0.5 AS p"
        f"  FROM uused u, uusedtot t)"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_unigram_round2_cost_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_unigram_round2_prefloor_sql()).fetchone()
    assert n > 0, "round-2 tripwire matched zero used pieces — vacuous"
    assert d > MIN_DIST, (
        f"a round-2 unigram cost sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} pieces scanned) — cross-libm ln() disagreement "
        "could split r2_cost_micro (and the second DP's segmentations) "
        "between Spark and DuckDB"
    )


def _dsir_prefloor_sql() -> str:
    """The DSIR bucket log-ratio floor(ln(...)*1e6+0.5) is the fourth
    order-free-sum transcendental input (its micro-rounded λ multiplies
    into every document's integer dot product). Truncate the committed
    oracle before the lam CTE's floor and measure the raw products."""
    sql = _DSIR_SQL
    cut = sql.find("lam AS (")
    assert cut != -1, "DSIR lam marker drifted — update this test"
    head = sql[:cut].rstrip().rstrip(",")
    marker = "floor(ln("
    lam_body = sql[cut:]
    assert marker in lam_body, "DSIR floor marker drifted — update this test"
    inner_start = lam_body.index(marker) + len("floor(")
    inner_end = lam_body.index("+ 0.5)::BIGINT")
    expr = lam_body[inner_start:inner_end] + "+ 0.5"
    return (
        f"{head} "
        f"SELECT min(abs(p - round(p))) AS d, count(*) AS n FROM ("
        f"  SELECT {expr} AS p FROM bstats b, btot t)"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_dsir_lambda_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_dsir_prefloor_sql()).fetchone()
    assert n > 0, "DSIR tripwire matched zero buckets — vacuous"
    assert d > MIN_DIST, (
        f"a DSIR bucket log-ratio sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} buckets scanned) — cross-libm ln() disagreement "
        "could split lam_micro (and every doc score it multiplies into) "
        "between Spark and DuckDB"
    )


def _nb_weight_prefloor_sql() -> str:
    """The NB per-bucket log-odds floor(ln(...)*1e6+0.5) is the fifth
    order-free-sum transcendental input (r12): its micro weight
    multiplies into every document's integer dot product. Truncate the
    committed oracle before the nbw CTE and measure the raw products."""
    sql = _NB_CLASSIFIER_SQL
    cut = sql.find("nbw AS (")
    assert cut != -1, "NB nbw marker drifted — update this test"
    head = sql[:cut].rstrip().rstrip(",")
    body = sql[cut:]
    marker = "floor(ln("
    assert marker in body, "NB floor marker drifted — update this test"
    inner_start = body.index(marker) + len("floor(")
    inner_end = body.index("+ 0.5)::BIGINT AS w_micro")
    expr = body[inner_start:inner_end] + "+ 0.5"
    return (
        f"{head} "
        f"SELECT min(abs(p - round(p))) AS d, count(*) AS n FROM ("
        f"  SELECT {expr} AS p FROM bstats b, btot t)"
    )


def _nb_prior_prefloor_sql() -> str:
    """The NB class prior is the sixth (and a 1-row) floor: it adds into
    every log_odds_micro, so a boundary-straddling prior would shift the
    whole corpus by one micro unit on one engine only."""
    sql = _NB_CLASSIFIER_SQL
    cut = sql.find("prior AS (")
    assert cut != -1, "NB prior marker drifted — update this test"
    head = sql[:cut].rstrip().rstrip(",")
    body = sql[cut:]
    marker = "floor(ln("
    assert marker in body, "NB prior floor marker drifted — update this test"
    inner_start = body.index(marker) + len("floor(")
    inner_end = body.index("+ 0.5)::BIGINT AS prior_micro")
    expr = body[inner_start:inner_end] + "+ 0.5"
    return (
        f"{head} "
        f"SELECT min(abs(p - round(p))) AS d, count(*) AS n FROM ("
        f"  SELECT {expr} AS p FROM perdoc)"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_nb_weight_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_nb_weight_prefloor_sql()).fetchone()
    assert n > 0, "NB weight tripwire matched zero buckets — vacuous"
    assert d > MIN_DIST, (
        f"an NB bucket log-odds sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} buckets scanned) — cross-libm ln() disagreement "
        "could split w_micro (and every doc log-odds it multiplies into) "
        "between Spark and DuckDB"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_nb_prior_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_nb_prior_prefloor_sql()).fetchone()
    assert n == 1, "NB prior tripwire must see exactly one row"
    assert d > MIN_DIST, (
        f"the NB class prior sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} — cross-libm ln() disagreement could shift every "
        "log_odds_micro by one on one engine only"
    )


def _mix_pow_prefloor_sql() -> str:
    """The mix-sweep weight floor(pow(n, alpha)*1e6+0.5) is the seventh
    transcendental input — pow() instead of ln(), same cross-libm
    exposure (Java Math.pow is within 1 ulp, not correctly rounded).
    Truncate the committed oracle after wts and measure the raw
    products over every (source, alpha) cell."""
    sql = _MIX_TEMP_SQL
    cut = sql.find("wtot AS (")
    assert cut != -1, "mix wtot marker drifted — update this test"
    head = sql[:cut].rstrip().rstrip(",")
    marker = "floor(pow("
    assert marker in head, "mix floor marker drifted — update this test"
    inner_start = head.index(marker) + len("floor(")
    inner_end = head.index("+ 0.5)::BIGINT")
    expr = head[inner_start:inner_end] + "+ 0.5"
    # rebuild wts without the floor so the raw double is observable
    head_defloored = (
        head[: head.index(marker)]
        + expr
        + " AS preflr"
        + head[head.index("\n               AS weight_micro") + len("\n               AS weight_micro"):]
    )
    return (
        f"{head_defloored} "
        "SELECT min(abs(preflr - round(preflr))) AS d, count(*) AS n FROM wts"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_mix_pow_prefloor_clear_of_boundaries(sf_dir):
    con = _connect(sf_dir)
    d, n = con.execute(_mix_pow_prefloor_sql()).fetchone()
    assert n > 0, "mix-sweep tripwire matched zero cells — vacuous"
    assert d > MIN_DIST, (
        f"a mix-sweep pow() weight sits {d:.3e} from a floor() boundary on "
        f"{sf_dir} ({n} source x alpha cells scanned) — cross-libm pow() "
        "disagreement could split weight_micro (and every share/target "
        "derived from it) between Spark and DuckDB"
    )
