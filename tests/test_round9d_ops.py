"""Invariant tests for the fourth r9 operator batch: watermark delay
calibration (hand-computed drops incl. the epoch-0 floor), quality-aware
canonical selection, curriculum phase structure, k-anonymity accounting,
truncation-recall bounds, and planted bot-cadence users."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()

B = dt.datetime(2024, 3, 1, 10, 0, 0)


def _write_events(spark, rows):
    out = tempfile.mkdtemp(prefix="r9d_events_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def _write_docs(spark, rows):
    out = tempfile.mkdtemp(prefix="r9d_docs_")
    spark.createDataFrame(
        [(i, t, lang, src, len(t) if t else 0) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


# ---------------------------------------------------------------------- #
# watermark_delay_calibration — hand-computed drops


def test_watermark_drops_match_hand_simulation(spark):
    def m(minutes):
        return B + dt.timedelta(minutes=minutes)

    rows = [
        # batch 0 (ids < 1000): on-time traffic, max ts = B+30min
        (1, m(0), 1, "view", 0.0, None),
        (2, m(30), 1, "view", 0.0, None),
        # batch 1 (ids 1000..1999): its LATE-EVENTS watermark is still the
        # epoch floor — the lagged semantics (batches < k-1) mean batch 0's
        # max does not bite until batch 2
        #  - on time
        (1000, m(31), 1, "view", 0.0, None),
        #  - pre-epoch: below the epoch-0 floor, dropped at EVERY delay
        (1001, dt.datetime(1969, 12, 31, 23, 0, 0), 1, "view", 0.0, None),
        # batch 2 (ids >= 2000): late watermark base is batch 0's max
        # (B+30min) — batch 1's max m(31) is NOT visible yet (the lag)
        #  - 5 min late: dropped at delay 0 and 1, kept at 10 and 60
        (2000, m(25), 1, "view", 0.0, None),
        #  - EXACTLY on the delay-10 watermark (B+30min - 10min): the
        #    inclusive predicate drops boundary equality (r10 finding)
        (2001, m(20), 1, "view", 0.0, None),
    ]
    sf = _write_events(spark, rows)
    out = {
        r["delay_minutes"]: r
        for r in SPECS["watermark_delay_calibration"].builder(spark, sf).collect()
    }
    assert set(out) == {0, 1, 10, 60}
    for d in out.values():
        assert d["n_events"] == 6
    # delay 0/1: the 5-min-late row, the boundary row AND the pre-epoch row
    assert out[0]["n_dropped"] == 3 and out[1]["n_dropped"] == 3
    # delay 10: the boundary row is ON the watermark — inclusive, dropped —
    # plus the pre-epoch row; delay 60: only the pre-epoch row
    assert out[10]["n_dropped"] == 2
    assert out[60]["n_dropped"] == 1
    assert out[60]["drop_frac"] == round(1 / 6, 6)


# ---------------------------------------------------------------------- #
# dedup_quality_keep — canonical structure


def test_quality_keep_picks_longest_member(spark):
    base = "the quick brown fox jumps over the lazy dog sat mat hat"
    rows = [
        (1, base, "en", "s"),
        (2, base + " extra", "en", "s"),  # near-dup, LONGER -> canonical
        (3, "completely different words about nothing shared here at all", "en", "s"),
    ]
    sf = _write_docs(spark, rows)
    out = SPECS["dedup_quality_keep"].builder(spark, sf).collect()
    assert {r["doc_id"] for r in out} == {1, 2}  # doc 3 is a singleton
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component_id"], []).append(r)
    for members in by_comp.values():
        canons = [r for r in members if r["is_canonical"]]
        assert len(canons) == 1
        canon = canons[0]
        assert all(r["canonical_doc"] == canon["doc_id"] for r in members)
        assert canon["n_tokens"] == max(r["n_tokens"] for r in members)
    assert next(r for r in out if r["doc_id"] == 2)["is_canonical"] is True


# ---------------------------------------------------------------------- #
# doc_curriculum_manifest — phase structure


def test_curriculum_phases_are_length_monotone(spark):
    rows = [(i, " ".join(["w"] * i), "en", "s") for i in range(1, 31)]
    sf = _write_docs(spark, rows)
    out = sorted(
        SPECS["doc_curriculum_manifest"].builder(spark, sf).collect(),
        key=lambda r: r["n_tokens"],
    )
    assert len(out) == 30
    # phase is non-decreasing in length, spans 1..10, equal lengths share
    phases = [r["phase"] for r in out]
    assert phases == sorted(phases)
    assert phases[0] == 1 and phases[-1] == 10
    # 30 docs / 10 deciles = exactly 3 per phase (all lengths distinct)
    from collections import Counter

    assert set(Counter(phases).values()) == {3}
    assert all(len(r["shuffle_key"]) == 32 for r in out)


# ---------------------------------------------------------------------- #
# k_anonymity_audit — accounting identities


def test_k_anonymity_rows_reassemble_population(spark):
    sf = "/root/testdata/sf0.001"
    out = SPECS["k_anonymity_audit"].builder(spark, sf).collect()
    from e_commerce_click_stream_spark.io import table

    total = table(spark, sf, "customer").count()
    assert sum(r["n_rows"] for r in out) == total
    for r in out:
        assert r["n_rows"] == r["group_size"] * r["n_groups"]
        assert r["at_risk"] == (r["group_size"] < 5)


# ---------------------------------------------------------------------- #
# embedding_truncation_recall — bounds


def test_truncation_recall_bounds(spark):
    out = SPECS["embedding_truncation_recall"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 30  # 3 widths x 10 queries
    for r in out:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall"] == r["n_hits"] / 5.0


# ---------------------------------------------------------------------- #
# user_bot_flags — planted automation


def test_bot_flags_on_planted_cadences(spark):
    def s(sec):
        return B + dt.timedelta(seconds=sec)

    rows = []
    # user 1: metronome — 6 events exactly 60s apart, mixed types
    for i in range(6):
        rows.append((i, s(60 * i), 1, ["view", "click"][i % 2], 0.0, None))
    # user 2: human-ish — irregular gaps, mixed types
    for j, sec in enumerate([0, 7, 19, 40, 90, 200]):
        rows.append((100 + j, s(sec), 2, ["view", "click", "purchase"][j % 3], 0.0, None))
    # user 3: monotype at volume, irregular gaps
    for j, sec in enumerate([0, 5, 17, 33, 61, 120]):
        rows.append((200 + j, s(sec), 3, "click", 0.0, None))
    sf = _write_events(spark, rows)
    out = {r["user_id"]: r for r in SPECS["user_bot_flags"].builder(spark, sf).collect()}
    assert out[1]["constant_cadence"] is True and out[1]["bot_suspect"] is True
    assert out[2]["constant_cadence"] is False and out[2]["monotype"] is False
    assert out[2]["bot_suspect"] is False
    assert out[3]["monotype"] is True and out[3]["bot_suspect"] is True
