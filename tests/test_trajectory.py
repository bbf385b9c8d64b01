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


def _od_oracle(rows, zoom, period_sec):
    """rows: (user, sec, event_id, lng, lat) -> {(o_tx,o_ty,d_tx,d_ty): n}"""
    n_tiles = 1 << zoom

    def tile(g, t):
        tx = max(0, min(n_tiles - 1, math.floor((g + 180.0) / 360.0 * n_tiles)))
        lat_r = math.radians(t)
        ty = max(0, min(n_tiles - 1, math.floor(
            (1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r))
             / math.pi) / 2.0 * n_tiles)))
        return tx, ty

    base = dt.datetime(2024, 1, 1)
    trips = {}
    for u, s, i, g, t in rows:
        epoch = (base + dt.timedelta(seconds=float(s))
                 - dt.datetime(1970, 1, 1)).total_seconds()
        p = math.floor(epoch * 1_000_000 / (period_sec * 1_000_000))
        trips.setdefault((u, p), []).append((s, i, g, t))
    flows = {}
    for pings in trips.values():
        pings.sort()
        o = tile(pings[0][2], pings[0][3])
        d = tile(pings[-1][2], pings[-1][3])
        key = (*o, *d)
        flows[key] = flows.get(key, 0) + 1
    return flows


def test_od_matrix_random_vs_oracle(spark):
    from python_prtree_spark.operators.trajectory import od_matrix

    rng = np.random.default_rng(17)
    rows = [
        (int(u), float(s), int(i), float(g), float(t))
        for i, (u, s, g, t) in enumerate(zip(
            rng.integers(0, 12, 200),
            rng.uniform(0, 5 * 86400, 200),
            rng.uniform(-179, 179, 200),
            rng.uniform(-80, 80, 200),
        ))
    ]
    got = {
        (r["o_tx"], r["o_ty"], r["d_tx"], r["d_ty"]): r["flows"]
        for r in od_matrix(_df(spark, rows), zoom=6, period_sec=86400).collect()
    }
    assert got == _od_oracle(rows, 6, 86400)


def test_od_matrix_single_ping_trip_is_self_loop(spark):
    """A (user, period) with one ping has origin == destination."""
    from python_prtree_spark.operators.trajectory import od_matrix

    rows = [(1, 10.0, 0, 10.0, 20.0)]
    out = od_matrix(_df(spark, rows), zoom=6, period_sec=86400).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["o_tx"], r["o_ty"]) == (r["d_tx"], r["d_ty"])
    assert r["flows"] == 1


def test_od_matrix_tiebreak_on_event_id(spark):
    """Two pings at the SAME timestamp: event_id orders them, so the
    lower id is the origin and the higher the destination."""
    from python_prtree_spark.operators.trajectory import od_matrix

    rows = [(1, 50.0, 2, 100.0, 0.0), (1, 50.0, 1, -100.0, 0.0)]
    r = od_matrix(_df(spark, rows), zoom=6, period_sec=86400).collect()[0]
    assert r["o_tx"] < 32 < r["d_tx"]  # west origin, east destination


def test_od_matrix_plan_two_shuffles_no_python(spark):
    from python_prtree_spark.operators.trajectory import od_matrix

    df = _df(spark, [(1, 0.0, 0, 0.0, 0.0)])
    out = od_matrix(df, zoom=6)
    assert_no_cartesian(out)
    plan = explain_str(out)
    assert "pythonUDF" not in plan and "MapInPandas" not in plan, plan


def test_od_matrix_rejects_bad_period(spark):
    import pytest

    from python_prtree_spark.operators.trajectory import od_matrix

    with pytest.raises(ValueError):
        od_matrix(_df(spark, [(1, 0.0, 0, 0.0, 0.0)]), zoom=6, period_sec=0)


def test_od_trips_stream_equals_batch(spark, tmp_path):
    """Stream≡batch contract: after a SHUFFLED (out-of-order) stream
    drains, the LAST emitted row per (entity, period) carries the batch
    od_matrix origin/destination tiles, so the aggregated flows match."""
    import os

    import pandas as pd

    from python_prtree_spark.operators.trajectory import od_matrix
    from python_prtree_spark.streaming.od import od_trips_stream

    rng = np.random.default_rng(29)
    n = 240
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 4 * 86400, n), unit="s"),
        "user_id": rng.integers(0, 6, n),
        "lng": rng.uniform(-170, 170, n),
        "lat": rng.uniform(-80, 80, n),
    })
    # deliberately NOT time-ordered: min/max folding is order-independent
    pdf = pdf.sample(frac=1.0, random_state=1).reset_index(drop=True)

    src = str(tmp_path / "od_in")
    os.makedirs(src)
    for i, lo in enumerate(range(0, n, 80)):
        spark.createDataFrame(pdf.iloc[lo:lo + 80]).coalesce(1).write.parquet(
            f"{src}/t={i:02d}")
    schema = "event_id long, ts timestamp, user_id long, lng double, lat double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/t=*")
    )
    emitted = []
    q = (
        # watermark wider than the (shuffled) data span: no row is late,
        # so stream == batch exactly; the eviction timeout path is still
        # exercised on every state update
        od_trips_stream(stream, zoom=6, period_sec=86400,
                        watermark="10 days")
        .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "od_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    last = {}
    for r in emitted:  # foreachBatch order = micro-batch order
        last[(r["user_id"], r["period"])] = (
            r["o_tx"], r["o_ty"], r["d_tx"], r["d_ty"])
    flows = {}
    for od in last.values():
        flows[od] = flows.get(od, 0) + 1
    batch = {
        (r["o_tx"], r["o_ty"], r["d_tx"], r["d_ty"]): r["flows"]
        for r in od_matrix(
            spark.createDataFrame(pdf, schema), zoom=6, period_sec=86400
        ).collect()
    }
    assert flows == batch and len(flows) > 10
