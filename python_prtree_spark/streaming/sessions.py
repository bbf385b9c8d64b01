"""Sessionization — gap-timeout event sessions per user, in two idiomatic
Spark forms:

  * ``sessionize_batch`` — pure window expressions (lag → new-session flag →
    running sum → groupBy), 100% JVM, ANSI-SQL-expressible (DuckDB-gated in
    the driver contract). All arithmetic on integer microseconds and
    fixed-point values so results are bit-identical across engines.
  * ``sessionize_stream`` — the custom STATEFUL streaming operator the
    batch form cannot express incrementally: ``applyInPandasWithState``
    keeps (open-session accumulator) per user across micro-batches and
    emits each session when a later event closes it. State size = one row
    per live user (bounded), not per event.

Contract linking the two (tested): on an event-time-ordered stream, the
emitted (closed) sessions equal the batch sessions minus each user's final
(still-open) session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize_batch", "sessionize_stream"]

SESSION_SCHEMA = (
    "user_id long, session_idx long, start_us long, end_us long, "
    "n_events long, sum_value_x100 long"
)
_STATE_SCHEMA = (
    "last_us long, session_idx long, start_us long, n_events long, "
    "sum_value_x100 long"
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_idx, start_us, end_us, n_events, sum_value_x100):
    a new session starts when the gap to the previous event exceeds
    ``gap_minutes``. Deterministic ordering by (ts, event_id); value summed
    as round(value*100) integers (exact in any engine)."""
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    lag_us = F.lag(us).over(w)
    new_s = F.when(lag_us.isNull() | ((us - lag_us) > gap_us), 1).otherwise(0)
    sidx = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vq = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.select(
            F.col(user_col).alias("user_id"), us.alias("_us"),
            sidx.alias("session_idx"), vq.alias("_vq"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_vq").alias("sum_value_x100"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin: per-user open-session state across micro-batches;
    emits a session row whenever a later event closes it (gap exceeded).
    The final open session per user stays in state (a production job closes
    it with a processing-time timeout; the equivalence test accounts for
    it). Works on a streaming OR batch DataFrame (same code path)."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        user_id = int(key[0])
        if state.exists:
            last_us, sidx, start_us, n_ev, sumv = state.get
        else:
            last_us = sidx = start_us = n_ev = sumv = None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["_us", "event_id"], kind="stable")
            for us, vq in zip(pdf["_us"].to_numpy(), pdf["_vq"].to_numpy()):
                us, vq = int(us), int(vq)
                if last_us is None:
                    sidx, start_us, n_ev, sumv = 1, us, 1, vq
                elif us - last_us > gap_us:
                    out.append((user_id, sidx, start_us, last_us, n_ev, sumv))
                    sidx, start_us, n_ev, sumv = sidx + 1, us, 1, vq
                else:
                    n_ev += 1
                    sumv += vq
                last_us = us
        state.update((last_us, sidx, start_us, n_ev, sumv))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_idx", "start_us", "end_us",
                         "n_events", "sum_value_x100"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.col("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.round(F.col(value_col) * 100).cast("long").alias("_vq"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
