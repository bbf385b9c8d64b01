"""Streaming CUSUM monitoring — the stateful twin of
operators/evalstats.cusum_alarms (same two-form pattern as trajectory /
sessionization: the batch op is a pure window, this is the incremental
operator an unbounded metric stream needs).

State per entity is FOUR integers — the running CUSUM statistic, the
sample count, the running max statistic, and the alarm count —
O(live entities), independent of stream length; each micro-batch that
touches an entity emits its updated cumulative row (append mode).

Contract linking the two (tested): on an event-time-ordered stream, the
last emitted row per entity equals the batch ``cusum_alarms`` chart
folded to its final row — identical fixed-point arithmetic, so equality
is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cusum_stream"]

OUT_SCHEMA = "user_id long, n long, s_fp long, max_s_fp long, n_alarms long"
_STATE_SCHEMA = "s_fp long, n long, max_s_fp long, n_alarms long"


def cusum_stream(
    events: DataFrame,
    ref_fp: int,
    threshold_fp: int,
    scale: int = 100,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-entity Page-CUSUM: one cumulative row per entity
    per micro-batch that touched it. Works on a streaming OR batch
    DataFrame (same code path)."""
    import pandas as pd

    ref, thr = int(ref_fp), int(threshold_fp)

    def fn(key, pdfs, state):
        user_id = int(key[0])
        if state.exists:
            s, n, mx, na = state.get
        else:
            s = n = mx = na = 0
        touched = False
        # micro-batch rows arrive as multiple Arrow chunks in shuffle
        # order — materialize and sort the WHOLE group (task-sized by
        # contract) before folding, as in streaming/trajectory.py.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            ).sort_values(["_us", "_v", id_col], kind="stable")
            for v in pdf["_v"].to_numpy():
                touched = True
                s = max(0, s + int(v) - ref)
                n += 1
                mx = max(mx, s)
                if s > thr:
                    na += 1
        state.update((s, n, mx, na))
        if touched:
            yield pd.DataFrame(
                [(user_id, n, s, mx, na)],
                columns=["user_id", "n", "s_fp", "max_s_fp", "n_alarms"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.round(F.col(value_col) * F.lit(int(scale))).cast("long").alias("_v"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )