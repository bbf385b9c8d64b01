"""trajectory_stats vs a brute-force haversine oracle: per-entity hop
ordering (ts, id tiebreak), single-ping entities, fixed-point sums."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

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


def _dp_reference(pts, eps):
    """Stack-based DP on pre-projected (x, y) meters; returns kept idx."""
    import math as _m

    n = len(pts)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = pts[a]
        bx, by = pts[b]
        dx, dy = bx - ax, by - ay
        L = _m.hypot(dx, dy)
        best, bi = -1.0, -1
        for i in range(a + 1, b):
            px_, py_ = pts[i]
            if L == 0.0:
                d = _m.hypot(px_ - ax, py_ - ay)
            else:
                d = abs(dy * (px_ - ax) - dx * (py_ - ay)) / L
            if d > best:
                best, bi = d, i
        if best > eps:
            keep[bi] = True
            stack.append((a, bi))
            stack.append((bi, b))
    return {i for i, k in enumerate(keep) if k}


def _project(lngs, lats):
    import math as _m

    from python_prtree_spark.operators.distance import EARTH_RADIUS_KM

    mdeg = EARTH_RADIUS_KM * 1000.0 * _m.pi / 180.0
    lat0, lng0 = lats[0], lngs[0]
    return [
        ((g - lng0) * _m.cos(_m.radians(lat0)) * mdeg, (t - lat0) * mdeg)
        for g, t in zip(lngs, lats)
    ]


@pytest.mark.parametrize("eps", [0.0, 500.0, 50_000.0])
def test_trajectory_simplify_matches_reference(spark, eps):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    rng = np.random.default_rng(31)
    rows = []
    for u in range(5):
        base_lng, base_lat = rng.uniform(-100, 100), rng.uniform(-60, 60)
        for i in range(40):
            rows.append((u, float(i * 60), u * 100 + i,
                         base_lng + rng.uniform(-0.05, 0.05),
                         base_lat + rng.uniform(-0.05, 0.05)))
    got = trajectory_simplify(_df_pings(spark, rows), eps).collect()
    kept = {}
    for r in got:
        kept.setdefault(r["user_id"], set()).add(r["event_id"])
    for u in range(5):
        sub = sorted((r for r in rows if r[0] == u), key=lambda r: (r[1], r[2]))
        pts = _project([r[3] for r in sub], [r[4] for r in sub])
        exp = {sub[i][2] for i in _dp_reference(pts, eps)}
        assert kept[u] == exp, (u, eps)


def _df_pings(spark, rows):
    return spark.createDataFrame(
        [
            (int(u), dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
             int(i), float(g), float(t))
            for u, s, i, g, t in rows
        ],
        "user_id long, ts timestamp, event_id long, lng double, lat double",
    )


def test_trajectory_simplify_endpoints_and_collinear(spark):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    # perfectly collinear equator track: everything but endpoints drops
    rows = [(1, float(i), i, float(i) * 0.01, 0.0) for i in range(10)]
    got = trajectory_simplify(_df_pings(spark, rows), 1.0).collect()
    assert sorted(r["event_id"] for r in got) == [0, 9]
    # a sharp detour survives any small epsilon
    rows[5] = (1, 5.0, 5, 0.05, 0.5)  # ~55 km off the line
    got2 = trajectory_simplify(_df_pings(spark, rows), 1000.0).collect()
    assert 5 in {r["event_id"] for r in got2}
    # short tracks pass through untouched
    short = [(2, 0.0, 0, 1.0, 1.0), (2, 1.0, 1, 2.0, 2.0)]
    got3 = trajectory_simplify(_df_pings(spark, short), 1e9).collect()
    assert len(got3) == 2


def test_trajectory_simplify_rejects_bad_epsilon(spark):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    with pytest.raises(ValueError):
        trajectory_simplify(_df_pings(spark, [(1, 0.0, 0, 0.0, 0.0)]), -1.0)


def _dp_reference_coords(lngs, lats, eps_deg):
    """Pure-python-int DP twin of units='coords': exact integer cross
    products, the shared-double threshold expression, first-max ties."""
    import math as _m

    xs = [int(_m.floor(g * 1e6 + 0.5)) for g in lngs]
    ys = [int(_m.floor(t * 1e6 + 0.5)) for t in lats]
    eps2 = (eps_deg * 1e6) * (eps_deg * 1e6)
    n = len(xs)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        dx, dy = xs[b] - xs[a], ys[b] - ys[a]
        L2 = dx * dx + dy * dy
        best, bi = -1, -1
        for i in range(a + 1, b):
            if L2 == 0:
                s = (xs[i] - xs[a]) ** 2 + (ys[i] - ys[a]) ** 2
            else:
                s = abs(dy * (xs[i] - xs[a]) - dx * (ys[i] - ys[a]))
            if s > best:
                best, bi = s, i
        split = (float(best) > eps2 if L2 == 0
                 else float(best) * float(best) > eps2 * float(L2))
        if split:
            keep[bi] = True
            stack.append((a, bi))
            stack.append((bi, b))
    return {i for i, k in enumerate(keep) if k}


@pytest.mark.parametrize("eps", [0.0, 0.02, 5.0])
def test_trajectory_simplify_coords_matches_reference(spark, eps):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    rng = np.random.default_rng(47)
    rows = []
    for u in range(4):
        base_lng, base_lat = rng.uniform(-100, 100), rng.uniform(-60, 60)
        for i in range(35):
            rows.append((u, float(i * 60), u * 100 + i,
                         base_lng + rng.uniform(-3.0, 3.0),
                         base_lat + rng.uniform(-3.0, 3.0)))
    got = trajectory_simplify(_df_pings(spark, rows), eps,
                              units="coords").collect()
    kept = {}
    for r in got:
        kept.setdefault(r["user_id"], set()).add(r["event_id"])
    for u in range(4):
        sub = sorted((r for r in rows if r[0] == u), key=lambda r: (r[1], r[2]))
        exp = {sub[i][2] for i in
               _dp_reference_coords([r[3] for r in sub],
                                    [r[4] for r in sub], eps)}
        assert kept[u] == exp, (u, eps)


def test_trajectory_simplify_coords_degenerate_chord(spark):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    # identical endpoints: deviation must fall back to point distance,
    # so the far loop apex survives any eps below its distance
    rows = [(1, 0.0, 0, 10.0, 10.0), (1, 1.0, 1, 10.0, 10.000001),
            (1, 2.0, 2, 12.0, 10.0), (1, 3.0, 3, 10.0, 10.0)]
    got = trajectory_simplify(_df_pings(spark, rows), 1.0,
                              units="coords").collect()
    assert {r["event_id"] for r in got} == {0, 2, 3}


def test_trajectory_simplify_rejects_bad_units(spark):
    from python_prtree_spark.operators.trajectory import trajectory_simplify

    with pytest.raises(ValueError):
        trajectory_simplify(_df_pings(spark, [(1, 0.0, 0, 0.0, 0.0)]),
                            1.0, units="feet")


def _hausdorff_reference(tracks, tau_deg):
    """Brute-force symmetric Hausdorff over integer microdegrees."""
    import math as _m

    def quant(t):
        return [(int(_m.floor(g * 1e6 + 0.5)), int(_m.floor(la * 1e6 + 0.5)))
                for g, la in t]

    q = {e: set(quant(t)) for e, t in tracks.items()}
    tau2 = (tau_deg * 1e6) * (tau_deg * 1e6)
    out = {}
    for ea in sorted(q):
        for eb in sorted(q):
            if ea >= eb:
                continue
            h = 0
            for src, dst in ((q[ea], q[eb]), (q[eb], q[ea])):
                for (x, y) in src:
                    nn = min((x - u) ** 2 + (y - v) ** 2 for u, v in dst)
                    h = max(h, nn)
            if float(h) <= tau2:
                out[(ea, eb)] = h
    return out


def _df_tracks(spark, tracks):
    rows = [(e, float(g), float(la))
            for e, t in tracks.items() for g, la in t]
    return spark.createDataFrame(rows, "user_id long, lng double, lat double")


def test_trajectory_hausdorff_matches_reference(spark):
    from python_prtree_spark.operators.trajectory import (
        trajectory_hausdorff_join,
    )

    rng = np.random.default_rng(53)
    tracks = {}
    for e in range(6):
        cx, cy = (e % 3) * 50.0 - 20.0, (e % 3) * 30.0 - 30.0
        tracks[e] = [(cx + rng.uniform(-1, 1), cy + rng.uniform(-1, 1))
                     for _ in range(25)]
    got = {
        (r["entity_a"], r["entity_b"]): r["haus_d2"]
        for r in trajectory_hausdorff_join(
            _df_tracks(spark, tracks), 1.2).collect()
    }
    assert got == _hausdorff_reference(tracks, 1.2)
    assert got, "expected at least one similar pair"


def test_trajectory_hausdorff_prunes_and_collapses(spark):
    from python_prtree_spark.operators.trajectory import (
        trajectory_hausdorff_join,
    )

    # two near-identical tracks + one far away; duplicates in track 2
    tracks = {
        1: [(0.0, 0.0), (0.5, 0.5), (1.0, 1.0)],
        2: [(0.0, 0.1), (0.5, 0.6), (1.0, 1.1), (1.0, 1.1), (0.0, 0.1)],
        3: [(80.0, 40.0), (80.5, 40.5)],
    }
    got = trajectory_hausdorff_join(_df_tracks(spark, tracks), 0.5).collect()
    assert {(r["entity_a"], r["entity_b"]) for r in got} == {(1, 2)}
    # H = max nearest dist = 0.1 deg = 100000 microdeg
    assert got[0]["haus_d2"] == 100000 ** 2
    # below the gap: nothing survives the final filter
    got2 = trajectory_hausdorff_join(_df_tracks(spark, tracks), 0.05).collect()
    assert got2 == []


def test_trajectory_hausdorff_rejects_bad_tau(spark):
    from python_prtree_spark.operators.trajectory import (
        trajectory_hausdorff_join,
    )

    with pytest.raises(ValueError):
        trajectory_hausdorff_join(_df_tracks(spark, {1: [(0, 0)]}), -0.1)
