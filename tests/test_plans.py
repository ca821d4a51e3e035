"""Physical-plan structure tests — the scale assertions from
scripts/plan_audit.py run under pytest (compile-only, no execution)."""

from __future__ import annotations

import pytest

from scripts.plan_audit import EXPECTATIONS, count_shuffles, formatted_plan
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(spark, name):
    import __spark_entry__ as entrymod

    rules = EXPECTATIONS[name]
    plan = formatted_plan(entrymod.queries()[name](spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    for frag in rules.get("contains", ()):
        assert frag in plan, f"{name}: plan missing {frag!r}\n{tree}"
    for frag in rules.get("not_contains", ()):
        assert frag not in tree, f"{name}: forbidden {frag!r}\n{tree}"
    if "max_exchanges" in rules:
        n = count_shuffles(plan)
        assert n <= rules["max_exchanges"], f"{name}: {n} shuffles\n{tree}"
