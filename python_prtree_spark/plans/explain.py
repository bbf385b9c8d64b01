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


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for df's optimized plan, or None
    when unavailable. THE single home for this private-API touch
    (`_jdf.queryExecution()...stats()`): every broadcast/strategy gate in
    the engine (probe._pick_strategy, ann._gated_probe, knn_join) routes
    through here, so a PySpark major bump that moves the API breaks ONE
    function guarded by ONE canary test (tests/test_plans.py
    test_plan_size_estimate_canary) instead of silently disabling every
    gate. Estimation only — callers must treat the value as a hint and
    keep a hard post-materialization bound where driver memory is at
    stake (knn does)."""
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        return est if est > 0 else None
    except Exception:
        return None
