"""Query plans: every declared engine capability as a named (builder, oracle) pair."""

from e_commerce_click_stream_spark.plans.registry import QuerySpec, all_specs, register

__all__ = ["QuerySpec", "all_specs", "register"]
