"""Exact Euclidean distance transform vs the brute-force definition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.edt import distance_transform, nearest_site


def _brute(feats, w, h):
    fx = feats["fx"].to_numpy(dtype=np.int64)
    fy = feats["fy"].to_numpy(dtype=np.int64)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    d2 = (
        (gx.ravel()[:, None] - fx[None, :]) ** 2
        + (gy.ravel()[:, None] - fy[None, :]) ** 2
    ).min(axis=1)
    return {(int(x), int(y)): int(d) for x, y, d in zip(gx.ravel(), gy.ravel(), d2)}


@pytest.mark.parametrize("seed,n", [(13, 25), (99, 4)])
def test_edt_matches_brute_force(spark, seed, n):
    rng = np.random.default_rng(seed)
    w, h = 40, 32
    feats = pd.DataFrame({
        "fx": rng.integers(0, w, n), "fy": rng.integers(0, h, n),
    })
    got = distance_transform(
        spark.createDataFrame(feats).repartition(8), w, h
    ).toPandas()
    assert len(got) == w * h
    want = _brute(feats, w, h)
    got_map = {(int(r.gx), int(r.gy)): int(r.d2) for r in got.itertuples()}
    assert got_map == want
    # zero exactly at feature pixels
    for r in feats.itertuples():
        assert got_map[(int(r.fx), int(r.fy))] == 0


@pytest.mark.parametrize("seed", [41])
def test_nearest_site_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    w, h, n = 32, 24, 15
    sites = pd.DataFrame({
        "site": rng.permutation(np.arange(100, 100 + n)).astype(np.int64),
        "fx": rng.integers(0, w, n), "fy": rng.integers(0, h, n),
    })
    got = nearest_site(
        spark.createDataFrame(sites).repartition(8), w, h
    ).toPandas()
    assert len(got) == w * h
    fx = sites["fx"].to_numpy()
    fy = sites["fy"].to_numpy()
    ids = sites["site"].to_numpy()
    for r in got.itertuples():
        dd = (r.gx - fx) ** 2 + (r.gy - fy) ** 2
        assert int(r.d2) == int(dd.min())
        assert int(r.site) == int(ids[dd == dd.min()].min())


def test_nearest_site_tie_breaks_to_smaller_id(spark):
    """Pixel equidistant from two sites -> the smaller id labels it,
    regardless of which site was listed first."""
    sites = pd.DataFrame({
        "site": [9, 2], "fx": [0, 6], "fy": [0, 0],
    })
    got = nearest_site(spark.createDataFrame(sites), 7, 1).toPandas()
    mid = got[(got["gx"] == 3) & (got["gy"] == 0)].iloc[0]
    assert int(mid.d2) == 9 and int(mid.site) == 2


def test_edt_single_feature_and_empty(spark):
    one = pd.DataFrame({"fx": [3], "fy": [5]})
    got = distance_transform(spark.createDataFrame(one), 8, 8).toPandas()
    gm = {(int(r.gx), int(r.gy)): int(r.d2) for r in got.itertuples()}
    assert gm[(0, 0)] == 9 + 25 and gm[(7, 7)] == 16 + 4
    empty = spark.createDataFrame(pd.DataFrame({"fx": [], "fy": []}),
                                  "fx long, fy long")
    assert distance_transform(empty, 8, 8).count() == 0
