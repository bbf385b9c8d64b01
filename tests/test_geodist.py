"""geo_distance_join (haversine ST_DWithin) vs numpy brute force:
global random points, antimeridian-wrap pairs, high-latitude adaptive
longitude windows, radius validation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from python_prtree_spark.operators.distance import (
    EARTH_RADIUS_KM,
    geo_distance_join,
)


def _hav_km(plng, plat, dlng, dlat):
    sdphi = math.sin((math.radians(dlat) - math.radians(plat)) / 2.0)
    sdlam = math.sin((math.radians(dlng) - math.radians(plng)) / 2.0)
    h = sdphi * sdphi \
        + math.cos(math.radians(plat)) * math.cos(math.radians(dlat)) * sdlam * sdlam
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(min(1.0, h)))


def _df(spark, rows, id_col):
    return spark.createDataFrame(
        [(int(i), float(g), float(t)) for i, g, t in rows],
        f"{id_col} long, lng double, lat double",
    )


def _oracle(probes, data, r):
    out = {}
    for qid, plng, plat in probes:
        for did, dlng, dlat in data:
            d = _hav_km(plng, plat, dlng, dlat)
            if d <= r:
                out[(qid, did)] = math.floor(d * 1000.0)
    return out


def _run(spark, probes, data, r):
    got = {
        (row["qid"], row["id"]): row["dist_m"]
        for row in geo_distance_join(
            _df(spark, data, "id"), _df(spark, probes, "qid"), r
        ).collect()
    }
    assert got == _oracle(probes, data, r)
    return got


def test_geo_distance_random_globe(spark):
    rng = np.random.default_rng(7)
    data = [(i, rng.uniform(-180, 180), rng.uniform(-85, 85)) for i in range(400)]
    probes = [(i, rng.uniform(-180, 180), rng.uniform(-85, 85)) for i in range(60)]
    got = _run(spark, probes, data, 1500.0)
    assert len(got) > 0


def test_geo_distance_antimeridian_wrap(spark):
    # 0.2 degrees of longitude apart across the +-180 seam (~22 km at
    # equator): the wrap split must keep the pair as a candidate
    data = [(1, -179.9, 0.0), (2, 179.0, 50.0)]
    probes = [(10, 179.9, 0.0)]
    got = _run(spark, probes, data, 50.0)
    assert (10, 1) in got


def test_geo_distance_high_latitude_window(spark):
    # at lat 82 a 10-degree longitude gap is ~155 km — inside a 200 km
    # radius only because the lambda window widens with latitude
    data = [(1, 10.0, 82.0), (2, 10.0, 0.0)]
    probes = [(10, 0.0, 82.0), (11, 0.0, 0.0)]
    got = _run(spark, probes, data, 200.0)
    assert (10, 1) in got
    assert (11, 2) not in got  # same gap at the equator is ~1113 km


def test_geo_distance_polar_cap_full_parallel(spark):
    # a probe whose radius cap reaches past the pole must see every
    # longitude at that latitude
    data = [(1, 179.0, 89.5), (2, -91.0, 89.3)]
    probes = [(10, 0.0, 89.9)]
    got = _run(spark, probes, data, 150.0)
    assert (10, 1) in got and (10, 2) in got


def test_geo_distance_rejects_bad_radius(spark):
    d = _df(spark, [(1, 0.0, 0.0)], "id")
    p = _df(spark, [(1, 0.0, 0.0)], "qid")
    with pytest.raises(ValueError, match="radius_km"):
        geo_distance_join(d, p, -1.0)
    with pytest.raises(ValueError, match="radius_km"):
        geo_distance_join(d, p, float("nan"))


def test_geo_distance_pairs_self_join(spark):
    from python_prtree_spark.operators.distance import geo_distance_pairs

    rng = np.random.default_rng(41)
    pts = [(i, rng.uniform(-180, 180), rng.uniform(-80, 80)) for i in range(150)]
    got = {
        (r["id_a"], r["id_b"]): r["dist_m"]
        for r in geo_distance_pairs(_df(spark, pts, "id"), 2000.0).collect()
    }
    exp = {}
    for i, (ia, ga, ta) in enumerate(pts):
        for ib, gb, tb in pts[i + 1:]:
            d = _hav_km(ga, ta, gb, tb)
            if d <= 2000.0:
                exp[(min(ia, ib), max(ia, ib))] = math.floor(d * 1000.0)
    assert got == exp
    assert got  # non-trivial at this radius


def _geo_knn_oracle(probes, data, k):
    out = {}
    for qid, plng, plat in probes:
        ranked = sorted(
            (math.floor(_hav_km(plng, plat, dlng, dlat) * 1000.0), did)
            for did, dlng, dlat in data
        )
        for rk, (dm, did) in enumerate(ranked[:k], start=1):
            out[(qid, did)] = (dm, rk)
    return out


def test_geo_knn_multi_round_vs_oracle(spark):
    from python_prtree_spark.operators.distance import geo_knn_join

    rng = np.random.default_rng(83)
    data = [(i, rng.uniform(-180, 180), rng.uniform(-80, 80)) for i in range(200)]
    probes = [(i, rng.uniform(-180, 180), rng.uniform(-80, 80)) for i in range(25)]
    # tiny initial radius: most probes resolve only after several expansions
    got = {
        (r["qid"], r["id"]): (r["dist_m"], r["rank"])
        for r in geo_knn_join(
            _df(spark, data, "id"), _df(spark, probes, "qid"), 4,
            initial_radius_km=50.0,
        ).collect()
    }
    assert got == _geo_knn_oracle(probes, data, 4)
    assert len(got) == 25 * 4


def test_geo_knn_fewer_than_k_and_validation(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.distance import geo_knn_join

    data = [(1, 0.0, 0.0), (2, 10.0, 10.0)]
    probes = [(9, 5.0, 5.0)]
    rows = geo_knn_join(
        _df(spark, data, "id"), _df(spark, probes, "qid"), 5,
        initial_radius_km=100.0,
    ).collect()
    assert {(r["qid"], r["id"], r["rank"]) for r in rows} == {(9, 1, 1), (9, 2, 2)} \
        or {(r["qid"], r["id"], r["rank"]) for r in rows} == {(9, 2, 1), (9, 1, 2)}
    assert len(rows) == 2  # only 2 data points exist
    with _pytest.raises(ValueError, match="k must be"):
        geo_knn_join(_df(spark, data, "id"), _df(spark, probes, "qid"), 0)
    with _pytest.raises(ValueError, match="initial_radius_km"):
        geo_knn_join(_df(spark, data, "id"), _df(spark, probes, "qid"), 1,
                     initial_radius_km=0.0)
