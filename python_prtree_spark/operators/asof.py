"""As-of join (backward temporal join) — the time-series operator the
brief names explicitly among "operators Spark lacks": for every left row,
the latest right row with the same key and right_ts <= left_ts (optional
tolerance). kdb's aj, pandas merge_asof, DuckDB ASOF JOIN.

Reference scope note: the reference engine (atksh/python_prtree) has no
temporal surface; this extends the events/streaming family.

Spark-first plan — NOT a join at all: both sides union into one frame
tagged (right=0, left=1), ONE shuffle partitions by key and sorts by
(ts, tag, id); a running `last(right_payload, ignorenulls=True)` window
then hands every left row the most recent right row at or before it.
Cost: one exchange + one sort — the same price as a single sort-merge
join stage but with no join explosion, no range-condition nested loop,
and per-key skew bounded by the window's streaming frame (running frames
evaluate incrementally — no per-row rescan). The right payload is packed
into ONE struct column so the window state is a single value.

Tie semantics (deterministic, engine-independent): right rows at exactly
left_ts match (<=, the tag ordering); multiple right rows at the same
(key, ts) resolve to the LARGEST right id (the sort's final tie-break) —
document or pre-dedupe if the source can hold duplicates.

At 100 TB: one shuffle on the key, partial sort spill-safe; a hot key
serializes only its own window scan (linear), which is the floor any
as-of semantics implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.config import EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["asof_join", "interval_overlap_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str = "id",
    right_values: "list[str] | None" = None,
    tolerance_us: "int | None" = None,
    suffix: str = "_right",
) -> DataFrame:
    """→ every left row + (right_id, right_ts[, values])`suffix` columns of
    the latest right row with the same ``on`` key and right_ts <= left_ts
    (NULLs when none, or when the match is older than ``tolerance_us``
    microseconds). Timestamps compare as unix micros (tz-independent)."""
    right_values = list(right_values or [])
    lcols = [c for c in left.columns]

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    payload = F.struct(
        F.col(right_id).alias("_rid"),
        r_us.alias("_rus"),
        *[F.col(v).alias(v) for v in right_values],
    )
    r = right.select(
        F.col(on).alias("_k"), r_us.alias("_us"),
        F.lit(0).alias("_tag"),
        F.col(right_id).cast("long").alias("_ord"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    lf = left.select(
        F.col(on).alias("_k"), l_us.alias("_us"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_ord"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_us", "_tag", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        r.unionByName(lf)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    if tolerance_us is not None:
        m = m.withColumn(
            "_m",
            F.when(
                F.col("_us") - F.col("_m._rus") <= F.lit(int(tolerance_us)),
                F.col("_m"),
            ),
        )
    out = [F.col(f"_l_{c}").alias(c) for c in lcols]
    out.append(F.col("_m._rid").alias(f"{right_id}{suffix}"))
    out.append(F.col("_m._rus").alias(f"{right_ts}_us{suffix}"))
    out += [F.col(f"_m.{v}").alias(f"{v}{suffix}") for v in right_values]
    return m.select(*out)


def interval_overlap_join(
    a_df: DataFrame,
    b_df: DataFrame,
    cfg: EngineConfig,
    a_id: str = "a_id",
    b_id: str = "b_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Temporal interval-overlap join (the range-join family: "which
    sessions overlap which incidents", shipment windows vs maintenance
    windows, …): (a_id, b_id) for every pair of CLOSED intervals with
    start_a <= end_b AND start_b <= end_a — touching endpoints count,
    consistent with the engine's closed AABB predicate, of which this
    is literally the 1-D specialization.

    Implementation: intervals become degenerate-height boxes on the
    time axis (y pinned to the extent's midline) and route through the
    cell-routed ``batch_query`` — so banding, partition routing, AQE,
    and hot-cell salting (a hot cell IS a hot time window) come for
    free, and a naive inequality-join O(n*m) plan never appears.
    ``cfg.extent`` spans the time domain on x; its level picks the band
    width (band span = extent_x / 2^level).

    → (a_id, b_id) pairs, duplicate-free."""
    mid = 0.5 * (cfg.extent.ymin + cfg.extent.ymax)
    data = a_df.select(
        F.col(a_id).alias("id"),
        F.col(start_col).cast("double").alias("xmin"),
        F.lit(mid).alias("ymin"),
        F.col(end_col).cast("double").alias("xmax"),
        F.lit(mid).alias("ymax"),
    )
    probes = b_df.select(
        F.col(b_id).alias("qid"),
        F.col(start_col).cast("double").alias("xmin"),
        F.lit(mid).alias("ymin"),
        F.col(end_col).cast("double").alias("xmax"),
        F.lit(mid).alias("ymax"),
    )
    cand = _probe.batch_query(data, probes, cfg, "id", "qid")
    return cand.select(
        F.col("id").alias(a_id), F.col("qid").alias(b_id)
    )
