"""Retention cohort analysis over an event stream — the standard
product-analytics triangle (Amplitude/Mixpanel "retention" report):
users are cohorted by their first-seen period, and each later period
they return increments that cohort's retention cell.

Reference parity note: the reference engine (atksh/python_prtree) has no
temporal surface; this extends the events family (events_window /
sessionize / funnel / st_cube) — SURVEY.md §2.1b.

Scale shape: one entity-key groupBy for first-seen periods, one
(entity, period) distinct for activity (both partial-aggregated), one
entity-key join between the two (co-keyed — AQE plans it without a
broadcast-size gamble), and one map-side-combined groupBy on the tiny
(cohort, offset) pair. (entity, period) rows are unique after the
distinct, so the final count(*) IS the distinct-user count — no
count-distinct shuffle. Everything is integer epoch arithmetic:
bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["retention_cohorts"]


def retention_cohorts(
    events: DataFrame,
    period_sec: int = 86400,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (cohort_p, offset, n_active): for each first-seen period
    ``cohort_p`` (epoch-floored to ``period_sec``) and period offset
    >= 0, the exact number of cohort members active in that period.
    offset 0 is the cohort size by construction."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    p = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(int(period_sec) * 1_000_000)
        )
    ).cast("long")
    base = events.select(F.col(entity_col).alias("_e"), p.alias("_p"))
    cohorts = base.groupBy("_e").agg(F.min("_p").alias("_c"))
    activity = base.distinct()
    return (
        activity.join(cohorts, on="_e")
        .groupBy(
            F.col("_c").alias("cohort_p"),
            (F.col("_p") - F.col("_c")).cast("long").alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
