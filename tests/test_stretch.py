"""percentile_stretch vs a brute nearest-rank clip-and-map."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from python_prtree_spark.operators.raster import percentile_stretch


def _df(spark, vals):
    rows = [(i // 16, (i % 16) // 4, i % 4, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _brute(vals, lo_q=2, hi_q=98, out_max=255):
    s = sorted(vals)
    n = len(s)

    def cut(q):
        return min(v for v, cum in zip(s, range(1, n + 1))
                   if cum * 100 >= n * q)

    p_lo, p_hi = cut(lo_q), cut(hi_q)
    den = max(1, p_hi - p_lo)
    return [math.floor((min(max(v, p_lo), p_hi) - p_lo) * out_max / den)
            for v in vals]


def _run(spark, vals, **kw):
    out = percentile_stretch(_df(spark, vals), **kw)
    got = {(r["tile"], r["r"], r["c"]): r["v8"] for r in out.collect()}
    return [got[(i // 16, (i % 16) // 4, i % 4)] for i in range(len(vals))]


def test_vs_brute(spark):
    vals = [((i * 37) % 90) + 5 for i in range(160)]
    vals[0], vals[1] = 1000, -50            # outliers to clip
    assert _run(spark, vals) == _brute(vals)


def test_output_range_and_clip(spark):
    vals = [10] * 50 + [20] * 50 + [9999]
    got = _run(spark, vals)
    assert min(got) == 0 and max(got) == 255
    assert got[100] == 255                  # outlier clips to top


def test_constant_raster(spark):
    # p_lo == p_hi -> den clamps to 1 -> everything maps to 0
    assert _run(spark, [7] * 30) == [0] * 30


def test_bad_quantiles(spark):
    with pytest.raises(ValueError, match="lo_q"):
        percentile_stretch(_df(spark, [1, 2]), lo_q=98, hi_q=2)
