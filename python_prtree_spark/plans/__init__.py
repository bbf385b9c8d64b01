"""Plan inspection helpers: assert pushdown/pruning/codegen properties of
the physical plans our operators produce (used by tests and bench)."""

from python_prtree_spark.plans.explain import explain_str, assert_no_cartesian

__all__ = ["explain_str", "assert_no_cartesian"]
