"""Ordered funnel analysis — the product-analytics staple (Mixpanel /
Amplitude funnels, ClickHouse ``windowFunnel``): how far each user
progresses through an ordered sequence of event types within a horizon
of their FIRST step-1 event.

Semantics (deterministic): t1 = the user's earliest step-1 event; t_k =
the earliest step-k event with t_{k-1} <= t_k <= t1 + horizon. A user
appears iff they completed step 1; ``n_steps`` counts the longest
prefix completed. Equal timestamps count (a step-2 event at exactly t1
qualifies — ClickHouse's non-strict mode).

Reference scope note: the reference engine (atksh/python_prtree) has no
temporal surface; this extends the events family (st_cube, asof_join,
sessionization).

Plan shape: one conditional-min aggregation per step (groupBy on the
user key — partial aggregation map-side) chained by an equi-join on the
same key; AQE reuses the partitioning, so K steps cost K keyed shuffles
with no row explosion and no per-user arrays (a power user with 10^6
events folds into one row per step — never a collect_list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "transition_counts"]


def funnel(
    events: DataFrame,
    steps: list[str],
    horizon_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (user_col, n_steps, t1_us, t_last_us): per user completing step 1,
    the completed prefix length, the anchor time, and the time of the
    last completed step (epoch micros)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if horizon_sec <= 0:
        raise ValueError(f"horizon_sec must be positive, got {horizon_sec}")
    h_us = int(horizon_sec) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("_u"), us.alias("_us"), F.col(type_col).alias("_t")
    )
    cur = (
        ev.where(F.col("_t") == steps[0])
        .groupBy("_u").agg(F.min("_us").alias("t1"))
        .withColumn("_prev", F.col("t1"))
        .withColumn("n", F.lit(1))
    )
    for k, step in enumerate(steps[1:], start=2):
        # only users still on the prefix attempt step k (a user who
        # missed step k-1 must not complete step k off the stale anchor)
        cand = cur.where(F.col("n") == k - 1).select("_u", "t1", "_prev")
        nxt = (
            ev.where(F.col("_t") == step)
            .join(cand, on="_u")
            .where((F.col("_us") >= F.col("_prev"))
                   & (F.col("_us") <= F.col("t1") + F.lit(h_us)))
            .groupBy("_u").agg(F.min("_us").alias(f"t{k}"))
        )
        cur = (
            cur.join(nxt, on="_u", how="left")
            .withColumn(
                "n",
                F.when(F.col(f"t{k}").isNotNull(), F.lit(k)).otherwise(F.col("n")),
            )
            .withColumn("_prev", F.coalesce(F.col(f"t{k}"), F.col("_prev")))
        )
    return cur.select(
        F.col("_u").alias(user_col),
        F.col("n").cast("int").alias("n_steps"),
        F.col("t1").cast("long").alias("t1_us"),
        F.col("_prev").cast("long").alias("t_last_us"),
    )


def transition_counts(
    events_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event streams
    (the "what do users do next" matrix behind funnel diagnostics and
    next-action models): for every consecutive pair of a user's events
    in (ts, event_id) order — the id tie-break makes simultaneous
    events deterministic, the repo-wide windows rule — count
    (src_type -> dst_type) occurrences across all users.

    Scale shape: ONE user-key window (lead), ONE tiny
    (src, dst)-key groupBy (cardinality = |event types|^2, map-side
    combined). No self-join.

    → (src, dst, n) rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    pairs = events_df.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
