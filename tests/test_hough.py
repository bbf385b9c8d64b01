"""hough_lines vs a brute-force accumulator, plus detection sanity."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import hough_lines, hough_table

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16


def _pix_df(spark, cells):
    side = 1 << CFG.level
    rows = [
        ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX), int(v))
        for (gx, gy), v in cells.items()
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _brute(cells, n_theta, rho_bin, min_votes):
    acc = {}
    for k, cq, sq in hough_table(n_theta):
        for (gx, gy), v in cells.items():
            rho_q = (gx * cq + gy * sq) // (4096 * rho_bin)
            key = (k, rho_q)
            n, s = acc.get(key, (0, 0))
            acc[key] = (n + 1, s + v)
    return {k: v for k, v in acc.items() if v[0] >= min_votes}


@pytest.mark.parametrize("n_theta,rho_bin,min_votes", [
    (8, 1, 1), (16, 2, 3), (12, 4, 2),
])
def test_vs_brute(spark, n_theta, rho_bin, min_votes):
    cells = {(x, y): 1 + (x * 3 + y * 5) % 7
             for x in range(16) for y in range(16)
             if (x * 11 + y * 4) % 9 < 4}
    out = hough_lines(_pix_df(spark, cells), CFG, px=PX,
                      n_theta=n_theta, rho_bin=rho_bin, min_votes=min_votes)
    got = {(r["theta_k"], r["rho_q"]): (r["votes"], r["wsum"])
           for r in out.collect()}
    assert got == _brute(cells, n_theta, rho_bin, min_votes)
    assert got


def test_detects_straight_lines(spark):
    # a horizontal line y=5 and a vertical line x=9, 12 pixels each,
    # plus scattered noise: the two top accumulator bins at the axis
    # angles must be exactly those lines.
    cells = {(x, 5): 1 for x in range(2, 14)}
    cells.update({(9, y): 1 for y in range(2, 14)})
    cells.update({(1, 1): 1, (14, 2): 1, (3, 12): 1})
    out = hough_lines(_pix_df(spark, cells), CFG, px=PX,
                      n_theta=8, rho_bin=1, min_votes=1).collect()
    by_votes = sorted(out, key=lambda r: -r["votes"])[:2]
    tops = {(r["theta_k"], r["rho_q"], r["votes"]) for r in by_votes}
    # theta_k=0 (cos=4096, sin=0): rho_q = gx -> vertical line x=9;
    # theta_k=4 of 8 (cos=0, sin=4096): rho_q = gy -> horizontal y=5.
    assert (0, 9, 12) in tops and (4, 5, 12) in tops


def test_negative_rho_bins(spark):
    # angles past pi/2 have negative cos: rho can go negative; floor
    # division must round toward -inf identically to the witness.
    cells = {(15, 0): 1, (15, 1): 1}
    n_theta = 8
    out = hough_lines(_pix_df(spark, cells), CFG, px=PX,
                      n_theta=n_theta, rho_bin=1, min_votes=1).collect()
    got = {(r["theta_k"], r["rho_q"]): (r["votes"], r["wsum"]) for r in out}
    assert got == _brute(cells, n_theta, 1, 1)
    assert any(rq < 0 for _, rq in got)


def test_errors(spark):
    df = _pix_df(spark, {(1, 1): 1})
    with pytest.raises(ValueError, match="power of two"):
        hough_lines(df, CFG, px=PX, rho_bin=3)
    with pytest.raises(ValueError, match="min_votes"):
        hough_lines(df, CFG, px=PX, min_votes=0)
    with pytest.raises(ValueError, match="n_theta"):
        hough_table(1)
