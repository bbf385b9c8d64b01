"""trajectory_stats vs a brute-force haversine oracle: per-entity hop
ordering (ts, id tiebreak), single-ping entities, fixed-point sums."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from python_prtree_spark.operators.distance import EARTH_RADIUS_KM
from python_prtree_spark.operators.trajectory import trajectory_stats
from python_prtree_spark.plans import assert_no_cartesian, explain_str


def _hop_m(p, q):
    sdphi = math.sin((math.radians(q[1]) - math.radians(p[1])) / 2.0)
    sdlam = math.sin((math.radians(q[0]) - math.radians(p[0])) / 2.0)
    h = sdphi * sdphi \
        + math.cos(math.radians(p[1])) * math.cos(math.radians(q[1])) * sdlam * sdlam
    return math.floor(
        2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(min(1.0, h))) * 1000.0
    )


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (int(u), dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(s)),
             int(i), float(g), float(t))
            for u, s, i, g, t in rows
        ],
        "user_id long, ts timestamp, event_id long, lng double, lat double",
    )


def _oracle(rows):
    byu = {}
    for u, s, i, g, t in rows:
        byu.setdefault(u, []).append((s, i, g, t))
    out = {}
    for u, pings in byu.items():
        pings.sort()
        hops = [
            _hop_m((a[2], a[3]), (b[2], b[3]))
            for a, b in zip(pings, pings[1:])
        ]
        out[u] = (len(pings), len(hops), sum(hops), max(hops, default=0))
    return out


def test_trajectory_random_vs_oracle(spark):
    rng = np.random.default_rng(13)
    rows = [
        (int(rng.integers(0, 12)), float(rng.uniform(0, 1e5)), i,
         float(rng.uniform(-180, 180)), float(rng.uniform(-85, 85)))
        for i in range(400)
    ]
    got = {
        r["entity"]: (r["n_pings"], r["n_hops"], r["total_m"], r["max_m"])
        for r in trajectory_stats(_df(spark, rows)).collect()
    }
    assert got == _oracle(rows)


def test_trajectory_tiebreak_and_single_ping(spark):
    # two pings share a timestamp — event_id must break the tie, changing
    # the hop sequence; user 9 has one ping (0 hops)
    rows = [
        (1, 100.0, 5, 10.0, 0.0),
        (1, 100.0, 2, 0.0, 0.0),   # same ts, smaller id → FIRST
        (1, 200.0, 7, 20.0, 0.0),
        (9, 0.0, 1, 50.0, 50.0),
    ]
    got = {
        r["entity"]: (r["n_pings"], r["n_hops"], r["total_m"], r["max_m"])
        for r in trajectory_stats(_df(spark, rows)).collect()
    }
    assert got == _oracle(rows)
    assert got[9] == (1, 0, 0, 0)
    # hop order 2->5->7 = 10 deg + 10 deg, NOT 5->2->7 = 10 + 20
    assert got[1][2] == 2 * _hop_m((0.0, 0.0), (10.0, 0.0))


def test_trajectory_plan_single_shuffle_no_python(spark):
    rows = [(i % 5, float(i), i, float(i % 90), 0.0) for i in range(50)]
    df = trajectory_stats(_df(spark, rows))
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("hashpartitioning(entity") <= 1, plan
    assert "Window" in plan, plan


def test_trajectory_stream_equals_batch(spark, tmp_path):
    """Stream≡batch contract: after an event-time-ordered stream drains,
    the LAST emitted cumulative row per entity equals the batch
    trajectory_stats over all pings."""
    import os

    import pandas as pd

    from python_prtree_spark.streaming.trajectory import trajectory_stream

    rng = np.random.default_rng(17)
    n = 300
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.cumsum(rng.integers(1, 600, n)), unit="s"),
        "user_id": rng.integers(0, 7, n),
        "lng": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-85, 85, n),
    }).sort_values(["ts", "event_id"]).reset_index(drop=True)

    src = str(tmp_path / "pings_in")
    os.makedirs(src)
    for i, lo in enumerate(range(0, n, 100)):
        spark.createDataFrame(pdf.iloc[lo:lo + 100]).coalesce(1).write.parquet(
            f"{src}/t={i:02d}"
        )
    schema = "event_id long, ts timestamp, user_id long, lng double, lat double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/t=*")
    )
    emitted = []
    q = (
        trajectory_stream(stream)
        .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    last = {}
    for r in emitted:  # foreachBatch order = micro-batch order
        last[r["user_id"]] = (r["n_pings"], r["n_hops"], r["total_m"], r["max_m"])
    batch = {
        r["entity"]: (r["n_pings"], r["n_hops"], r["total_m"], r["max_m"])
        for r in trajectory_stats(spark.createDataFrame(pdf)).collect()
    }
    assert last == batch
    # multiple batches actually touched each user (cumulative rows grew)
    assert len(emitted) > len(last)
