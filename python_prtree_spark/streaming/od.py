"""Streaming origin–destination trip accumulation — the stateful twin of
operators/trajectory.od_matrix (same two-form pattern as sessionization /
trajectory: a window/aggregate batch op, plus the incremental operator
the batch form cannot express over an unbounded stream).

``od_trips_stream`` keeps one tiny state row per (entity, period) trip —
the (ts, id, tile) of the EARLIEST and LATEST ping seen so far — and
emits the updated trip row per micro-batch that touched it. Unlike the
trajectory fold, first/last extraction is ORDER-INDEPENDENT (a pure
lexicographic (ts, id) min/max), so out-of-order and cross-micro-batch
arrival need no per-group sort at all. The flow matrix is a downstream
groupBy over each trip's last emitted row.

State is bounded by an EVENT-TIME TIMEOUT: a trip's state row is
evicted once the watermark passes its period's end (plus the watermark
slack), so state is O(trips open within the watermark horizon) — never
O(all periods ever seen). The watermark is therefore also the lateness
contract: a ping arriving after its trip's eviction would open a fresh
partial trip (the standard Structured Streaming trade).

Contract linking the two (tested): after a bounded stream drains, the
LAST emitted row per (entity, period) carries exactly the (origin,
destination) tiles batch ``od_matrix`` computes, so the aggregated flow
counts agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["od_trips_stream"]

OD_TRIP_SCHEMA = (
    "user_id long, period long, o_tx long, o_ty long, d_tx long, d_ty long"
)
_STATE_SCHEMA = (
    "f_us long, f_id long, f_tx long, f_ty long, "
    "l_us long, l_id long, l_tx long, l_ty long"
)


def od_trips_stream(
    pings: DataFrame,
    zoom: int,
    period_sec: int = 86400,
    watermark: str = "1 day",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Streaming per-(entity, period) trip endpoints: one updated
    (origin, destination) row per trip per micro-batch that touched it
    (append mode); trip state evicted once the watermark passes the
    period end."""
    import pandas as pd

    from python_prtree_spark.functions.geo import lnglat_tile_cols

    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")

    period_ms = int(period_sec) * 1000

    def fn(key, pdfs, state):
        e, p = int(key[0]), int(key[1])
        if state.hasTimedOut:
            # watermark passed this trip's period end: evict
            state.remove()
            return
        if state.exists:
            f_us, f_id, f_tx, f_ty, l_us, l_id, l_tx, l_ty = state.get
            first = (f_us, f_id, f_tx, f_ty)
            last = (l_us, l_id, l_tx, l_ty)
        else:
            first = last = None
        touched = False
        for pdf in pdfs:
            for us, i, tx, ty in zip(
                pdf["_us"].to_numpy(), pdf[id_col].to_numpy(),
                pdf["_tx"].to_numpy(), pdf["_ty"].to_numpy(),
            ):
                touched = True
                row = (int(us), int(i), int(tx), int(ty))
                if first is None or row[:2] < first[:2]:
                    first = row
                if last is None or row[:2] > last[:2]:
                    last = row
        state.update(first + last)
        # evict when event time moves past this trip's period; a timeout
        # timestamp must sit above the current watermark, so clamp
        state.setTimeoutTimestamp(
            max((p + 1) * period_ms, state.getCurrentWatermarkMs() + 1))
        if touched:
            yield pd.DataFrame(
                [(e, p, first[2], first[3], last[2], last[3])],
                columns=["user_id", "period",
                         "o_tx", "o_ty", "d_tx", "d_ty"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    tx, ty = lnglat_tile_cols(F.col(lng), F.col(lat), zoom)
    period = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(int(period_sec) * 1_000_000)
        )
    ).cast("long")
    prepped = pings.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark).select(
        F.col(entity_col).alias("user_id"),
        period.alias("period"),
        F.col(id_col),
        # the watermarked timestamp column must stay in the stateful
        # operator's input or event-time timeouts are rejected
        F.col(ts_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        tx.alias("_tx"), ty.alias("_ty"),
    )
    return prepped.groupBy("user_id", "period").applyInPandasWithState(
        fn,
        outputStructType=OD_TRIP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
