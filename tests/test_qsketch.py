"""Deterministic KLL-style quantile sketch: certified error bound."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.qsketch import quantile_sketch


def _df(spark, arr, parts=8):
    return spark.createDataFrame(
        pd.DataFrame({"v": arr}), "v double").repartition(parts)


@pytest.mark.parametrize("seed", [1, 8])
def test_sketch_quantiles_within_certificate(spark, seed):
    rng = np.random.default_rng(seed)
    arr = rng.normal(0, 100, 50_000)
    sk = quantile_sketch(_df(spark, arr), "v", k=256)
    assert sk.n == len(arr)
    # the certificate itself must be useful (not the trivial n bound)
    assert sk.max_rank_err < 0.05 * sk.n, sk.max_rank_err
    s = np.sort(arr)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        got = sk.quantile(q)
        target = max(1, -(-len(s) * int(round(q * 1000)) // 1000))
        # true rank of the returned value (1-based, rightmost)
        rank = int(np.searchsorted(s, got, side="right"))
        assert abs(rank - target) <= sk.max_rank_err, (q, rank, target)


def test_sketch_exact_when_no_compaction(spark):
    """Fewer than k values per partition: zero compactions, zero error —
    the sketch IS the sorted data and quantiles are exact nearest-rank."""
    arr = np.arange(100, dtype=float)
    sk = quantile_sketch(_df(spark, arr, parts=2), "v", k=256)
    assert sk.max_rank_err == 0
    s = np.sort(arr)
    for q in (0.1, 0.5, 1.0):
        target = max(1, -(-len(s) * int(round(q * 1000)) // 1000))
        assert sk.quantile(q) == s[target - 1]


def test_sketch_deterministic_for_fixed_partitioning(spark):
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 1, 20_000)
    pdf = pd.DataFrame({"v": arr, "p": np.arange(len(arr)) % 4})
    df = spark.createDataFrame(pdf).repartition(4, "p")
    a = quantile_sketch(df, "v", k=64)
    b = quantile_sketch(df, "v", k=64)
    assert a.max_rank_err == b.max_rank_err and a.n == b.n
    assert np.array_equal(a.values, b.values)
    assert np.array_equal(a.weights, b.weights)


def test_sketch_ignores_null_and_nan(spark):
    pdf = pd.DataFrame({"v": [1.0, None, np.nan, 3.0]})
    sk = quantile_sketch(spark.createDataFrame(pdf), "v")
    assert sk.n == 2
    assert sk.quantile(1.0) == 3.0


def test_sketch_rejects_bad_params(spark):
    df = _df(spark, np.arange(4, dtype=float), parts=1)
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", k=3)  # odd
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", k=2)  # too small
    sk = quantile_sketch(df, "v")
    with pytest.raises(ValueError):
        sk.quantile(0.0)
    with pytest.raises(ValueError):
        quantile_sketch(
            spark.createDataFrame(pd.DataFrame({"v": [None]}), "v double"),
            "v",
        ).quantile(0.5)
