"""ripley_k vs brute ordered-pair counts."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.distance import ripley_k

CFG = EngineConfig(extent=Extent(0, 0, 101, 101), level=3)


def _pts_df(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "x", "y"]),
        "id long, x long, y long",
    )


def _brute(pts, radii):
    out = {}
    for r in radii:
        n = 0
        for i, a in enumerate(pts):
            for j, b in enumerate(pts):
                if i != j and (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 <= r * r:
                    n += 1
        out[r] = n
    return out


def _run(spark, pts, radii):
    out = ripley_k(_pts_df(spark, pts), radii, CFG)
    return {r["radius"]: r["n_pairs"] for r in out.collect()}


def test_vs_brute(spark):
    pts = [((i * 7368787) % 101, (i * 15485863) % 101) for i in range(80)]
    radii = [3, 8, 20, 50]
    got = _run(spark, pts, radii)
    assert got == _brute(pts, radii)
    # cumulative and monotone, all ladder rows present (even if equal)
    assert list(got) and all(
        got[a] <= got[b] for a, b in zip(radii, radii[1:])
    )


def test_two_clusters(spark):
    # tight pair + far cluster: r=2 sees only intra-cluster pairs
    pts = [(10, 10), (11, 10), (90, 90), (90, 91), (91, 90)]
    got = _run(spark, pts, [2, 5, 200])
    assert got == _brute(pts, [2, 5, 200])
    assert got[2] == 2 + 6          # 1 ordered pair + cluster of 3
    assert got[200] == 5 * 4        # everything


def test_zero_count_radii_kept(spark):
    pts = [(0, 0), (50, 50)]
    got = _run(spark, pts, [1, 2, 100])
    assert got == {1: 0, 2: 0, 100: 2}


def test_duplicate_coordinates_count(spark):
    # two ids at the same spot are a pair at every radius
    pts = [(5, 5), (5, 5), (60, 60)]
    got = _run(spark, pts, [1, 100])
    assert got == {1: 2, 100: 6}


def test_bad_ladder_rejected(spark):
    with pytest.raises(ValueError, match="ladder"):
        ripley_k(_pts_df(spark, [(1, 1)]), [5, 5], CFG)
    with pytest.raises(ValueError, match="ladder"):
        ripley_k(_pts_df(spark, [(1, 1)]), [], CFG)
