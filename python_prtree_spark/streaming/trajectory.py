"""Streaming trajectory accumulation — the stateful twin of
operators/trajectory.trajectory_stats (same two-form pattern as
sessionization: a pure window/aggregate batch op, and the incremental
operator the batch form cannot express over an unbounded stream).

``trajectory_stream`` keeps one tiny state row per entity — the LAST ping
(timestamp, id, lng, lat) plus the running (n_pings, n_hops, total_m,
max_m) — across micro-batches via ``applyInPandasWithState``, and emits
the updated cumulative summary row per entity per micro-batch. State is
O(live entities), never O(pings).

Contract linking the two (tested): on an event-time-ordered stream, the
LAST emitted row per entity equals ``trajectory_stats`` run in batch over
all pings seen — hop math is the identical haversine → floor(d_km·1000)
fixed-point sequence, so the totals agree exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.operators.distance import EARTH_RADIUS_KM

__all__ = ["trajectory_stream"]

TRAJ_SCHEMA = "user_id long, n_pings long, n_hops long, total_m long, max_m long"
_STATE_SCHEMA = (
    "last_us long, last_lng double, last_lat double, "
    "n_pings long, n_hops long, total_m long, max_m long"
)


def _hop_m(plng, plat, lng, lat):
    """floor(haversine_km * 1000) — the batch operator's exact sequence."""
    sdphi = math.sin((math.radians(lat) - math.radians(plat)) / 2.0)
    sdlam = math.sin((math.radians(lng) - math.radians(plng)) / 2.0)
    h = sdphi * sdphi \
        + math.cos(math.radians(plat)) * math.cos(math.radians(lat)) * sdlam * sdlam
    return math.floor(
        2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(min(1.0, h))) * 1000.0
    )


def trajectory_stream(
    pings: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Streaming per-entity trajectory totals: one cumulative summary row
    per entity per micro-batch that touched it (append mode). Works on a
    streaming OR batch DataFrame (same code path)."""
    import pandas as pd

    def fn(key, pdfs, state):
        user_id = int(key[0])
        if state.exists:
            last_us, last_lng, last_lat, n_p, n_h, tot, mx = state.get
        else:
            last_us = last_lng = last_lat = None
            n_p = n_h = tot = mx = 0
        touched = False
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary shuffle order; sorting each chunk alone is not a global
        # (ts, id) order. Materialize the whole group once (per-entity data
        # is task-sized by contract) and sort it globally before folding.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ).sort_values(["_us", id_col], kind="stable")
            for us, g, t in zip(
                pdf["_us"].to_numpy(), pdf[lng].to_numpy(), pdf[lat].to_numpy()
            ):
                touched = True
                if last_us is not None:
                    hop = _hop_m(last_lng, last_lat, float(g), float(t))
                    n_h += 1
                    tot += hop
                    mx = max(mx, hop)
                n_p += 1
                last_us, last_lng, last_lat = int(us), float(g), float(t)
        state.update((last_us, last_lng, last_lat, n_p, n_h, tot, mx))
        if touched:
            yield pd.DataFrame(
                [(user_id, n_p, n_h, tot, mx)],
                columns=["user_id", "n_pings", "n_hops", "total_m", "max_m"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = pings.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(lng).alias(lng), F.col(lat).alias(lat),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRAJ_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
