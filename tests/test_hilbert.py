"""hilbert_key_col vs the reference xy2d bit walk."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark.functions.tiling import hilbert_key_col


def _xy2d(order, x, y):
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _run(spark, pts, order):
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["x", "y"]), "x long, y long"
    )
    out = df.select("x", "y", hilbert_key_col("x", "y", order).alias("h"))
    return {(r["x"], r["y"]): r["h"] for r in out.collect()}


def test_order2_full_grid(spark):
    pts = [(x, y) for x in range(4) for y in range(4)]
    got = _run(spark, pts, 2)
    assert got == {(x, y): _xy2d(2, x, y) for x, y in pts}
    # a space-filling curve visits every cell exactly once
    assert sorted(got.values()) == list(range(16))


def test_order6_sample(spark):
    pts = [((i * 37) % 64, (i * 53) % 64) for i in range(300)]
    got = _run(spark, pts, 6)
    assert got == {(x, y): _xy2d(6, x, y) for x, y in set(pts)}


def test_locality_consecutive_keys_adjacent(spark):
    # the Hilbert property: consecutive d values are 4-neighbors
    pts = [(x, y) for x in range(8) for y in range(8)]
    got = _run(spark, pts, 3)
    byd = {d: xy for xy, d in got.items()}
    for d in range(63):
        (x1, y1), (x2, y2) = byd[d], byd[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
