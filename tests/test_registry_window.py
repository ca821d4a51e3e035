"""Guards on the driver-verification window.

The external correctness gate checks only the FIRST 50 registered
queries (dict-insertion order). These tests pin the window's
composition so a refactor can't silently push a must-verify query out
of it: every name in ``_VERIFY_FIRST`` must exist, land inside the
first 50, and keep its oracle; duplicates or dead names in the list
are registration bugs. The coverage guard (VERDICT r4 #5) additionally
requires every registered query to sit in the window OR hold an
ever-green driver row recorded in the committed ``evergreen.json`` —
so registering a new operator without giving it a verify slot fails CI
instead of shipping driver-unproven (the round-4 process slip)."""

from __future__ import annotations

import json
import os

from e_commerce_click_stream_spark.plans.registry import _VERIFY_FIRST, all_specs

WINDOW = 50

_EVERGREEN_PATH = os.path.join(os.path.dirname(__file__), "evergreen.json")


def _evergreen() -> dict[str, dict]:
    with open(_EVERGREEN_PATH) as f:
        return json.load(f)


def test_verify_first_names_all_registered():
    specs = all_specs()
    missing = [n for n in _VERIFY_FIRST if n not in specs]
    assert not missing, f"_VERIFY_FIRST names not registered: {missing}"


def test_verify_first_fits_window():
    assert len(_VERIFY_FIRST) <= WINDOW
    names = list(all_specs())
    window = set(names[:WINDOW])
    out = [n for n in _VERIFY_FIRST if n not in window]
    assert not out, f"_VERIFY_FIRST names pushed out of the window: {out}"


def test_no_duplicates_in_verify_first():
    assert len(set(_VERIFY_FIRST)) == len(_VERIFY_FIRST)


def test_window_queries_have_oracles():
    # rows-only specs give the driver a weaker check; keep sketches out of
    # the verified window (every windowed query must be hash-checkable)
    specs = all_specs()
    names = list(specs)[:WINDOW]
    no_oracle = [n for n in names if specs[n].oracle is None]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"


def test_every_registered_query_has_a_verify_slot_or_evergreen_row():
    """VERDICT r4 #5: no registration without driver proof or a slot.

    A query may ship only if it (a) sits inside the driver-verify window
    this round, or (b) already holds an ever-green driver CORRECTNESS row
    (tests/evergreen.json, regenerated from CORRECTNESS_r*.json by
    scripts/gen_evergreen.py). Anything else is a new operator that would
    ship never-driver-verified — the exact round-4 process slip."""
    specs = all_specs()
    evergreen = _evergreen()
    window = set(list(specs)[:WINDOW])
    unproven = [n for n in specs if n not in window and n not in evergreen]
    assert not unproven, (
        f"registered without a verify slot or ever-green driver row: {unproven}; "
        "add them to _VERIFY_FIRST (plans/registry.py) or regenerate "
        "tests/evergreen.json"
    )


def test_evergreen_names_still_registered():
    # a renamed/deleted query must not leave a dangling evergreen entry
    # silently satisfying the coverage guard for a name that no longer runs
    specs = all_specs()
    dangling = [n for n in _evergreen() if n not in specs]
    assert not dangling, f"evergreen.json names not registered: {dangling}"


def test_all_specs_raises_on_rotation_typo(monkeypatch):
    """ADVICE r10: all_specs() used to SKIP unknown rotation names with
    'if n in _REGISTRY' — a typo in the ~90 hand-edited rotation entries
    would silently forfeit its verify slot. It must raise instead."""
    import pytest

    from e_commerce_click_stream_spark.plans import registry as reg

    monkeypatch.setattr(reg, "_VERIFY_FIRST", reg._VERIFY_FIRST + ("no_such_query_xyz",))
    with pytest.raises(ValueError, match="no_such_query_xyz"):
        reg.all_specs()
    monkeypatch.setattr(reg, "_VERIFY_FIRST", reg._VERIFY_FIRST[:-1])
    monkeypatch.setattr(reg, "_VERIFY_NEXT", reg._VERIFY_NEXT + (reg._VERIFY_FIRST[0],))
    with pytest.raises(ValueError, match="BOTH rotation lists"):
        reg.all_specs()


def test_verify_next_names_registered_and_positioned():
    """_VERIFY_NEXT (the post-window overflow preference) gets the same
    hygiene as _VERIFY_FIRST: every name registered, no duplicates, no
    overlap with the window list, and the names actually occupy the
    positions immediately after the window."""
    from e_commerce_click_stream_spark.plans.registry import _VERIFY_NEXT

    specs = all_specs()
    missing = [n for n in _VERIFY_NEXT if n not in specs]
    assert not missing, f"_VERIFY_NEXT names not registered: {missing}"
    assert len(set(_VERIFY_NEXT)) == len(_VERIFY_NEXT)
    assert not set(_VERIFY_NEXT) & set(_VERIFY_FIRST)
    names = list(specs)
    start = len(_VERIFY_FIRST)
    assert tuple(names[start : start + len(_VERIFY_NEXT)]) == _VERIFY_NEXT
