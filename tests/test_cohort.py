"""retention_cohorts vs a pure-Python cohort oracle."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.cohort import retention_cohorts


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (int(u), dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(s)))
            for u, s in rows
        ],
        "user_id long, ts timestamp",
    )


def _oracle(rows, period_sec):
    epoch0 = (dt.datetime(2024, 1, 1)
              - dt.datetime(1970, 1, 1)).total_seconds()
    byu = {}
    for u, s in rows:
        p = math.floor((epoch0 + s) * 1_000_000 / (period_sec * 1_000_000))
        byu.setdefault(u, set()).add(p)
    out = {}
    for periods in byu.values():
        c = min(periods)
        for p in periods:
            key = (c, p - c)
            out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("seed", [2, 19])
def test_retention_matches_oracle(spark, seed):
    rng = np.random.default_rng(seed)
    rows = [
        (int(u), float(s))
        for u, s in zip(
            rng.integers(0, 25, 300), rng.uniform(0, 10 * 86400, 300))
    ]
    got = {
        (r["cohort_p"], r["offset"]): r["n_active"]
        for r in retention_cohorts(_df(spark, rows)).collect()
    }
    assert got == _oracle(rows, 86400)


def test_retention_offset_zero_is_cohort_size(spark):
    """Every user is active in their own first period — offset 0 counts
    the full cohort; later offsets never exceed it."""
    rng = np.random.default_rng(4)
    rows = [
        (int(u), float(s))
        for u, s in zip(
            rng.integers(0, 12, 150), rng.uniform(0, 6 * 86400, 150))
    ]
    out = retention_cohorts(_df(spark, rows)).toPandas()
    for c, sub in out.groupby("cohort_p"):
        size = sub.loc[sub["offset"] == 0, "n_active"]
        assert len(size) == 1
        assert (sub["n_active"] <= size.iloc[0]).all()
        assert (sub["offset"] >= 0).all()


def test_retention_dedups_within_period(spark):
    """Many events by one user in one period count once."""
    rows = [(1, 10.0), (1, 20.0), (1, 30.0), (1, 86400.0 + 5.0)]
    got = {
        (r["cohort_p"], r["offset"]): r["n_active"]
        for r in retention_cohorts(_df(spark, rows)).collect()
    }
    assert set(got.values()) == {1}
    assert sorted(o for _, o in got) == [0, 1]


def test_retention_rejects_bad_period(spark):
    with pytest.raises(ValueError):
        retention_cohorts(_df(spark, [(1, 0.0)]), period_sec=0)
