"""Physical-plan inspection. We grade ourselves on plan shape, not vibes:
joins must be equi-joins on cell (broadcast or shuffled hash/SMJ), scans
must prune columns, and nothing may degenerate into a cartesian product."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"plan contains {bad}:\n{plan}")
