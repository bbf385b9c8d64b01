"""Theil-Sen robust trend vs a brute-force reference + robustness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.qsketch import ols_trend, theil_sen


def _brute(ts, vs, scale=100):
    t = np.asarray(ts, dtype=np.int64)
    t = t - t.min()
    v = np.round(np.asarray(vs) * scale).astype(np.int64)
    slopes = []
    for i in range(len(t)):
        for j in range(len(t)):
            if t[i] < t[j]:
                slopes.append((
                    (v[j] - v[i]) / (t[j] - t[i]),
                    v[j] - v[i], t[j] - t[i],
                ))
    slopes.sort()
    n = len(slopes)
    _, num, den = slopes[(n + 2) // 2 - 1]
    resid = sorted(den * v - num * t)
    icept = resid[(len(resid) + 2) // 2 - 1]
    return num, den, icept


def test_theil_sen_matches_brute(spark):
    rng = np.random.default_rng(8)
    rows = []
    for g in range(4):
        m = 12 + g
        ts = np.sort(rng.choice(np.arange(1, 10_000) * 1000, m, replace=False))
        vs = 3.0 + 0.002 * ts / 1000 + rng.normal(0, 1.0, m)
        vs = np.round(vs, 2)
        for t, v in zip(ts, vs):
            rows.append({"g": g, "t": int(t), "v": float(v)})
    pdf = pd.DataFrame(rows)
    got = theil_sen(
        spark.createDataFrame(pdf).repartition(8), "g", "t", "v", scale=100
    ).toPandas().set_index("g")
    for g, sub in pdf.groupby("g"):
        num, den, icept = _brute(sub["t"].to_numpy(), sub["v"].to_numpy())
        r = got.loc[g]
        assert (int(r.slope_num), int(r.slope_den)) == (num, den)
        assert int(r.icept_num) == icept
        assert r.slope == num / den
        assert int(r.n_pts) == len(sub)
        assert int(r.n_pairs) == len(sub) * (len(sub) - 1) // 2


def test_theil_sen_robust_to_one_outlier(spark):
    """A perfect line plus one wild outlier: the slope is untouched."""
    t = np.arange(11, dtype=np.int64) * 100
    v = 1.0 + 0.05 * t  # slope 0.05/unit -> 5 fp-units per 1 t-unit... scale 100
    v[7] = 999.0
    pdf = pd.DataFrame({"g": 0, "t": t, "v": v})
    got = theil_sen(spark.createDataFrame(pdf), "g", "t", "v", scale=100).toPandas()
    r = got.iloc[0]
    # slope is in v-fixed-point units per t-unit: d(100*v)/dt = 5 exactly
    assert r.slope_num / r.slope_den == pytest.approx(5.0, rel=1e-12)
    # intercept at t = min(t): v(0) = 1.0 -> 100 fp-units (x slope_den)
    assert r.icept_num / r.slope_den == pytest.approx(100.0, rel=1e-12)


def test_ols_trend_matches_numpy_and_degenerates(spark):
    rng = np.random.default_rng(23)
    rows = []
    for g in range(3):
        m = 15
        ts = np.sort(rng.choice(np.arange(1, 5000), m, replace=False))
        vs = np.round(2.0 - 0.01 * ts + rng.normal(0, 0.5, m), 2)
        rows += [{"g": g, "t": int(t), "v": float(v)} for t, v in zip(ts, vs)]
    rows += [{"g": 9, "t": 100, "v": 5.0}]           # n=1 -> NULL slope
    rows += [{"g": 8, "t": 7, "v": 1.0}, {"g": 8, "t": 7, "v": 3.0}]  # t const
    pdf = pd.DataFrame(rows)
    got = ols_trend(
        spark.createDataFrame(pdf).repartition(8), "g", "t", "v", scale=100
    ).toPandas().set_index("g")
    for g in range(3):
        sub = pdf[pdf["g"] == g]
        t = sub["t"].to_numpy(dtype=np.int64)
        t = t - t.min()
        v = np.round(sub["v"].to_numpy() * 100).astype(np.int64)
        n = len(t)
        num = n * int((t * v).sum()) - int(t.sum()) * int(v.sum())
        den = n * int((t * t).sum()) - int(t.sum()) ** 2
        r = got.loc[g]
        assert (int(r.slope_num), int(r.slope_den)) == (num, den)
        assert r.slope == num / den
        # cross-check against numpy's lstsq slope
        coef = np.polyfit(t.astype(float), v.astype(float), 1)
        assert r.slope == pytest.approx(coef[0], rel=1e-9)
        assert r.icept == pytest.approx(coef[1], rel=1e-9)
    assert pd.isna(got.loc[9, "slope"]) and pd.isna(got.loc[8, "slope"])
    assert int(got.loc[8, "slope_den"]) == 0


def test_theil_sen_duplicate_timestamps_form_no_pair(spark):
    pdf = pd.DataFrame({
        "g": [0] * 4, "t": [10, 10, 20, 30], "v": [1.0, 9.0, 2.0, 3.0],
    })
    got = theil_sen(spark.createDataFrame(pdf), "g", "t", "v").toPandas()
    # pairs: (10a,20),(10a,30),(10b,20),(10b,30),(20,30) = 5; never (10a,10b)
    assert int(got["n_pairs"].iloc[0]) == 5
