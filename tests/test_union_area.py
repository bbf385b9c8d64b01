"""union_area (exact dissolved box-union measure) vs a brute-force
coordinate-compression sweep, plus measure-theory invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.polygon import union_area


def _brute_union_units(pdf, scale=1000):
    """Exact union area in 1/scale^2 units: global coordinate compression
    (no cells), integer arithmetic throughout."""
    x0 = np.round(pdf["xmin"].to_numpy() * scale).astype(np.int64)
    y0 = np.round(pdf["ymin"].to_numpy() * scale).astype(np.int64)
    x1 = np.round(pdf["xmax"].to_numpy() * scale).astype(np.int64)
    y1 = np.round(pdf["ymax"].to_numpy() * scale).astype(np.int64)
    keep = (x1 > x0) & (y1 > y0)
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    if len(x0) == 0:
        return 0
    xs = np.unique(np.concatenate([x0, x1]))
    total = 0
    for a, b in zip(xs[:-1], xs[1:]):
        sel = (x0 <= a) & (x1 >= b)
        if not sel.any():
            continue
        iv = sorted(zip(y0[sel], y1[sel]))
        cov, lo, hi = 0, None, None
        for s, e in iv:
            if lo is None:
                lo, hi = s, e
            elif s > hi:
                cov += hi - lo
                lo, hi = s, e
            else:
                hi = max(hi, e)
        cov += hi - lo
        total += int(b - a) * int(cov)
    return total


def _rand_boxes(seed, n=250, span=60.0):
    rng = np.random.default_rng(seed)
    mins = np.floor(rng.random((n, 2)) * span * 1000) / 1000.0
    ext = np.floor((0.5 + rng.random((n, 2)) * 7) * 1000) / 1000.0
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })


@pytest.mark.parametrize("seed", [3, 19])
def test_union_area_matches_brute_force(spark, seed):
    pdf = _rand_boxes(seed)
    got = union_area(spark.createDataFrame(pdf).repartition(8)).toPandas()
    want = _brute_union_units(pdf)
    assert len(got) == 1
    assert int(got["area_units"].iloc[0]) == want
    assert got["area"].iloc[0] == want / 1e6


def test_union_area_grouped_and_invariants(spark):
    pdf = _rand_boxes(7, n=300)
    pdf["g"] = pdf["id"] % 5
    got = union_area(spark.createDataFrame(pdf), "g").toPandas()
    assert len(got) == 5
    for g, sub in pdf.groupby("g"):
        row = got[got["gkey"] == g]
        want = _brute_union_units(sub)
        assert int(row["area_units"].iloc[0]) == want
        # union <= sum of areas (overlaps counted once)
        sum_units = int(
            np.sum(
                np.round((sub["xmax"] - sub["xmin"]) * 1000)
                * np.round((sub["ymax"] - sub["ymin"]) * 1000)
            )
        )
        assert want <= sum_units


def test_union_area_disjoint_equals_sum_and_nested_is_outer(spark):
    # disjoint boxes: union == sum; fully nested: union == outer box
    disj = pd.DataFrame({
        "xmin": [0.0, 10.0], "ymin": [0.0, 10.0],
        "xmax": [2.0, 13.0], "ymax": [3.0, 11.0],
    })
    got = union_area(spark.createDataFrame(disj)).toPandas()
    assert int(got["area_units"].iloc[0]) == 6_000_000 + 3_000_000
    nest = pd.DataFrame({
        "xmin": [0.0, 1.0], "ymin": [0.0, 1.0],
        "xmax": [8.0, 3.0], "ymax": [8.0, 3.0],
    })
    got2 = union_area(spark.createDataFrame(nest)).toPandas()
    assert int(got2["area_units"].iloc[0]) == 64_000_000


def test_union_area_cell_boundary_exactness(spark):
    # boxes meeting exactly at the 16.0 cell boundary: no double count,
    # no gap; degenerate (zero-width) boxes contribute nothing
    pdf = pd.DataFrame({
        "xmin": [14.0, 16.0, 20.0], "ymin": [0.0, 0.0, 0.0],
        "xmax": [16.0, 18.0, 20.0], "ymax": [1.0, 1.0, 5.0],
    })
    got = union_area(spark.createDataFrame(pdf)).toPandas()
    assert int(got["area_units"].iloc[0]) == 4_000_000
