"""Synthetic slow-host A/B for the bench calibration normalizer.

VERDICT r11 #2: three of four rounds burned judge/builder cycles on
host-drift forensics because BENCH raw seconds move with hypervisor
weather. bench.py now times a frozen calibration probe in every sweep and
emits each headline time as a ratio to it. This test pins the property
that makes those ratios trustworthy: on a synthetically slowed host
(taskset to a fraction of the CPUs) the RAW seconds of a query move
substantially, but its RATIO to the calibrator moves far less — i.e. the
normalizer cancels uniform host slowness instead of merely describing it.

The A/B runs the probe + a frozen synthetic workload in two fresh
subprocesses (full JVM each, ~30 s apiece): once on all CPUs, once pinned
to 4. Margins are deliberately loose — the load point is 8x less CPU, so
raw time must at least double while the ratio stays within a band an
actual plan regression would blow through.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Subprocess payload: median-of-3 (with one untimed warmup each) of the
# bench calibrator probe and of a frozen CPU-bound "query" with a
# DIFFERENT plan shape (shuffle join + agg), so ratio stability is not an
# artifact of timing the same plan twice.
_PAYLOAD = r"""
import json, statistics, sys, time
sys.path.insert(0, %(repo)r)
from bench import _execute, _release_blocks, spark_probe
from e_commerce_click_stream_spark.session import get_spark

spark = get_spark(app_name="cal_ab")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def query():
    a = spark.range(0, 48_000_000, 1, 32).selectExpr(
        "id %% 2000003 AS k", "id AS v")
    b = spark.range(0, 2_000_003, 1, 8).selectExpr("id AS k", "id * 2 AS w")
    df = a.join(b, "k").selectExpr("k %% 1000 AS g", "v + w AS x") \
        .groupBy("g").agg({"x": "sum"})
    t0 = time.perf_counter(); _execute(df)
    return time.perf_counter() - t0

def med3(fn):
    _release_blocks(spark); fn()
    reps = []
    for _ in range(3):
        _release_blocks(spark)
        reps.append(fn())
    return statistics.median(reps)

print(json.dumps({"probe": med3(lambda: spark_probe(spark)),
                  "query": med3(query)}))
"""


def _run(extra_cmd: list[str]) -> dict:
    code = _PAYLOAD % {"repo": REPO}
    out = subprocess.run(
        extra_cmd + [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(shutil.which("taskset") is None, reason="no taskset")
@pytest.mark.skipif((os.cpu_count() or 0) < 16, reason="needs >=16 CPUs")
def test_ratio_stable_where_raw_seconds_move():
    # BOTH halves of the measurement are host-load-sensitive, not just
    # the vacuity precondition (taskset must slow the run >1.8x): an
    # ambient load spike during the all-CPU pass inflates ITS query/probe
    # ratio and trips the stability band on perfectly healthy code
    # (observed: fast 1.69 vs the typical 0.85 while another suite's JVMs
    # were draining — band read 1.98x). So the WHOLE attempt retries: the
    # property passes if any attempt lands a non-vacuous A/B inside the
    # band; a genuinely broken calibrator fails all three attempts (its
    # ratio drift is structural, not weather); a persistently vacuous
    # delta is an environmental SKIP — a precondition on the measurement
    # host, like the taskset/CPU-count skips above.
    vacuous = 0
    for _attempt in range(3):
        fast = _run([])
        slow = _run(["taskset", "-c", "0-3"])
        raw_drift = slow["query"] / fast["query"]
        if raw_drift <= 1.8:
            vacuous += 1
            continue
        ratio_fast = fast["query"] / fast["probe"]
        ratio_slow = slow["query"] / slow["probe"]
        ratio_drift = max(ratio_fast, ratio_slow) / min(ratio_fast, ratio_slow)
        if ratio_drift < raw_drift and ratio_drift < 1.6:
            return  # the property held: normalization cancels host slowness
    if vacuous == 3:
        pytest.skip(
            f"host under load: taskset moved raw seconds only "
            f"{raw_drift:.2f}x — the A/B would be vacuous here"
        )
    # persistent across retries -> a real calibration defect; report the
    # final attempt's numbers
    assert ratio_drift < raw_drift, (
        f"ratio drifted {ratio_drift:.2f}x vs raw {raw_drift:.2f}x — "
        "the calibrator is not cancelling host slowness"
    )
    assert ratio_drift < 1.6, (
        f"query/probe ratio moved {ratio_drift:.2f}x across the synthetic "
        f"host change (fast {ratio_fast:.2f}, slow {ratio_slow:.2f})"
    )


def test_ratio_drift_flags_moves_and_reads_all_artifact_shapes(tmp_path):
    """VERDICT r12 #6: the artifact reads itself — _ratio_drift diffs the
    current sweep's per-query probe-ratios against a prior BENCH artifact
    and flags >1.5x moves either way; it must understand bench.py's own
    output shape AND the driver wrapper whose 'tail' is the truncated
    last-2000-chars (queries_ratio survives there, the calibration
    version often does not)."""
    import json

    import bench

    base = {
        "queries_ratio": {"a": 1.0, "b": 0.5},
        "calibration": {"version": bench.CAL_VERSION},
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(base))
    out = bench._ratio_drift(
        {"a": 1.6, "b": 0.5, "c": 2.0}, bench.CAL_VERSION, str(p)
    )
    assert out["flagged"] == {
        "a": {"prev_ratio": 1.0, "cur_ratio": 1.6, "move_x": 1.6}
    }
    assert out["new_queries"] == ["c"] and out["dropped_queries"] == []
    # a shrink past 1/1.5 flags too (an accidental speedup on an
    # untouched line is the same "ratio moved" signal)
    out_dn = bench._ratio_drift({"a": 0.6, "b": 0.5}, bench.CAL_VERSION, str(p))
    assert out_dn["flagged"]["a"]["move_x"] == 0.6
    # in-band moves do not flag
    assert bench._ratio_drift(
        {"a": 1.4, "b": 0.4}, bench.CAL_VERSION, str(p)
    )["flagged"] == {}

    # driver-wrapper tail shape with the version truncated away
    tail = 'x": 1.2}, "queries_ratio": {"a": 1.0}, "value_ratio": 9.0}'
    p2 = tmp_path / "BENCH_r98.json"
    p2.write_text(json.dumps({"tail": tail, "parsed": None}))
    out2 = bench._ratio_drift({"a": 0.5}, bench.CAL_VERSION, str(p2))
    assert out2["flagged"]["a"]["move_x"] == 0.5
    assert out2["baseline_cal_version_unverified"] is True

    # calibration-version mismatch -> not a comparable baseline
    assert bench._ratio_drift({"a": 9.0}, bench.CAL_VERSION + 1, str(p)) is None


def test_ratio_drift_skips_cross_sf_baselines(tmp_path):
    """Ratios cancel host speed, not data volume — a baseline taken at a
    different scale factor must not be compared (an sf0.001 smoke sweep
    against the sf0.1 driver artifact flagged 12 phantom moves)."""
    import json

    import bench

    base = {
        "queries_ratio": {"a": 1.0},
        "calibration": {"version": bench.CAL_VERSION},
        "sf": 0.1,
    }
    p = tmp_path / "BENCH_r97.json"
    p.write_text(json.dumps(base))
    assert bench._ratio_drift({"a": 9.0}, bench.CAL_VERSION, str(p), 0.001) is None
    assert bench._ratio_drift({"a": 9.0}, bench.CAL_VERSION, str(p), 0.1) is not None


def test_baseline_paths_skips_non_round_filenames(tmp_path):
    """ADVICE r13: a file matching the BENCH_r*.json glob but not the
    numeric round pattern (BENCH_rerun.json) must be skipped, not raise
    AttributeError and kill the sweep's output line."""
    import bench

    for name in ("BENCH_r07.json", "BENCH_rerun.json", "BENCH_r10.json"):
        (tmp_path / name).write_text("{}")
    paths = bench._baseline_paths(str(tmp_path))
    assert [__import__("os").path.basename(p) for p in paths] == [
        "BENCH_r10.json",
        "BENCH_r07.json",
    ]


def test_ratio_drift_sub_second_lines_exempt_but_listed(tmp_path):
    """VERDICT r13 #6: an in-band scheduling flicker on a sub-second
    line (fixed overhead dwarfing the work, e.g. BENCH_r13's phantom
    ann_ivf_probe_only flag) must not flag — it is exempted by current
    raw seconds and surfaced under sub_second_exempt instead."""
    import json

    import bench

    base = {
        "queries_ratio": {"a": 0.2, "b": 1.0},
        "calibration": {"version": bench.CAL_VERSION},
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(base))
    # 0.8 s raw is inside the exemption (raised to 1.0 s in r15: the
    # flicker band on these hosts reaches ~0.8 s — ann_ivf_probe_only
    # was flagged-then-adjudicated-as-noise at 0.7-0.8 s raw three
    # rounds running, VERDICT r14 #4)
    out = bench._ratio_drift(
        {"a": 0.45, "b": 1.0}, bench.CAL_VERSION, str(p),
        timings={"a": 0.8, "b": 2.0},
    )
    assert out["flagged"] == {}
    assert out["sub_second_exempt"] == ["a"]
    # the same move on a >= MIN_DRIFT_RAW_SEC line still flags
    out2 = bench._ratio_drift(
        {"a": 0.45, "b": 1.0}, bench.CAL_VERSION, str(p),
        timings={"a": 1.2, "b": 2.0},
    )
    assert out2["flagged"]["a"]["move_x"] == 2.25
    assert out2["sub_second_exempt"] == []


def test_ratio_drift_median_reference_and_self_skip(monkeypatch, tmp_path):
    """VERDICT r13 #6: the reference is the per-query MEDIAN across the
    newest comparable baselines, so one freak sweep cannot flag an
    untouched line; and a baseline byte-identical to the current sweep
    (a re-sweep diffing against its own recorded artifact — ADVICE r13)
    is excluded from the candidates."""
    import json

    import bench

    def wtab(name, ratios):
        p = tmp_path / name
        p.write_text(json.dumps({
            "queries_ratio": ratios,
            "calibration": {"version": bench.CAL_VERSION},
        }))
        return str(p)

    # newest sweep is a freak (a=3.0); the two before agree at 1.0
    paths = [
        wtab("BENCH_r19.json", {"a": 3.0}),
        wtab("BENCH_r18.json", {"a": 1.0}),
        wtab("BENCH_r17.json", {"a": 1.0}),
    ]
    monkeypatch.setattr(bench, "_baseline_paths", lambda here: paths)
    out = bench._ratio_drift({"a": 1.1}, bench.CAL_VERSION)
    assert out["flagged"] == {}  # vs median 1.0, not the freak 3.0
    assert out["baselines"] == [
        "BENCH_r19.json", "BENCH_r18.json", "BENCH_r17.json",
    ]

    # a baseline identical to the current sweep is a self-diff: skipped
    paths.insert(0, wtab("BENCH_r20.json", {"a": 1.1}))
    out2 = bench._ratio_drift({"a": 1.1}, bench.CAL_VERSION)
    assert "BENCH_r20.json" not in out2["baselines"]


def test_streaming_lines_normalized_by_streaming_probe(tmp_path):
    """VERDICT r14 #3: micro-batch scheduling cost swings ~3x with host
    load while batch compute holds, so loaded-host sweeps spuriously
    flagged streaming_* lines. The streaming probe measures that fixed
    cost; a streaming line whose move tracks the probe's move must NOT
    flag, while a batch line with the same move still does."""
    import json

    import bench

    base = {
        "queries_ratio": {"streaming_x": 1.0, "batch_y": 1.0},
        "calibration": {
            "version": bench.CAL_VERSION,
            "spark_probe_sec": 1.0,
            "streaming_probe_sec": 1.0,
        },
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(base))
    # loaded host: streaming probe ratio inflated 2.3x; the streaming
    # line inflated the same 2.3x (scheduling), the batch line too (a
    # real regression — batch ratios are load-invariant by design)
    out = bench._ratio_drift(
        {"streaming_x": 2.3, "batch_y": 2.3},
        bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0, "batch_y": 2.0},
        sprobe_ratio=2.3,
    )
    assert "streaming_x" not in out["flagged"]
    assert out["flagged"]["batch_y"]["move_x"] == 2.3
    assert out["streaming_norm"]["expected_move_x"] == 2.3

    # a streaming move WELL BEYOND what the probe explains still flags
    out2 = bench._ratio_drift(
        {"streaming_x": 4.0, "batch_y": 1.0},
        bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0, "batch_y": 2.0},
        sprobe_ratio=2.3,
    )
    assert out2["flagged"]["streaming_x"]["threshold_x"] == round(1.5 * 2.3, 2)


def test_streaming_threshold_relaxes_but_never_tightens(tmp_path):
    """A CALMER current host (probe moved down) must not tighten the
    up-threshold below 1.5x — normalization only excuses moves in the
    direction the probe explains."""
    import json

    import bench

    base = {
        "queries_ratio": {"streaming_x": 1.0},
        "calibration": {
            "version": bench.CAL_VERSION,
            "spark_probe_sec": 1.0,
            "streaming_probe_sec": 2.0,
        },
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(base))
    # probe halved (expected 0.5): an in-band 1.4x up-move stays clean,
    # and the down-band stretches to 1/(1.5 x 2) so the line following
    # the probe down (0.5x) is excused too
    out = bench._ratio_drift(
        {"streaming_x": 1.4}, bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0}, sprobe_ratio=1.0,
    )
    assert out["flagged"] == {}
    out2 = bench._ratio_drift(
        {"streaming_x": 0.5}, bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0}, sprobe_ratio=1.0,
    )
    assert out2["flagged"] == {}
    # but a 1.6x up-move on the calmer host still flags (no tightening,
    # no loosening either)
    out3 = bench._ratio_drift(
        {"streaming_x": 1.6}, bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0}, sprobe_ratio=1.0,
    )
    assert "streaming_x" in out3["flagged"]


def test_streaming_static_band_without_probe_baseline(tmp_path):
    """Baselines that predate the streaming probe fall back to the
    static 2.75x band for streaming_* lines (the observed pure-noise
    swing was 2.67x) — batch lines keep the 1.5x band."""
    import json

    import bench

    base = {
        "queries_ratio": {"streaming_x": 1.0, "batch_y": 1.0},
        "calibration": {"version": bench.CAL_VERSION},
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(base))
    out = bench._ratio_drift(
        {"streaming_x": 2.5, "batch_y": 2.5}, bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0, "batch_y": 2.0}, sprobe_ratio=1.2,
    )
    assert "streaming_x" not in out["flagged"]
    assert "batch_y" in out["flagged"]
    assert out["streaming_static_threshold_x"] == bench.STREAMING_STATIC_THRESHOLD_X
    out2 = bench._ratio_drift(
        {"streaming_x": 3.0}, bench.CAL_VERSION, str(p),
        timings={"streaming_x": 2.0}, sprobe_ratio=1.2,
    )
    assert "streaming_x" in out2["flagged"]
