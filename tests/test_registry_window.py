"""Guards on the driver-verification window.

The external correctness gate checks only the FIRST 50 registered
queries (dict-insertion order). These tests pin the window's
composition so a refactor can't silently push a must-verify query out
of it: every name in ``_VERIFY_FIRST`` must exist, land inside the
first 50, and keep its oracle; duplicates or dead names in the list
are registration bugs."""

from __future__ import annotations

from e_commerce_click_stream_spark.plans.registry import _VERIFY_FIRST, all_specs

WINDOW = 50


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
