"""mask_rle vs a brute-force per-row run scanner, plus round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.raster import mask_rle

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=3)


def _brute(pdf):
    out = []
    for (t, r), g in pdf[pdf["cnt"] != 0].groupby(["tile", "r"]):
        cs = sorted(g["c"])
        start = prev = cs[0]
        for c in cs[1:]:
            if c == prev + 1:
                prev = c
                continue
            out.append((t, r, start, prev - start + 1))
            start = prev = c
        out.append((t, r, start, prev - start + 1))
    return sorted(out)


@pytest.mark.parametrize("seed", [5, 19])
def test_rle_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    n = 4000
    pdf = pd.DataFrame({
        "tile": rng.integers(0, 16, n),
        "r": rng.integers(0, 16, n),
        "c": rng.integers(0, 16, n),
        "cnt": rng.integers(0, 3, n),  # zeros must be ignored
    }).drop_duplicates(["tile", "r", "c"])
    got = mask_rle(spark.createDataFrame(pdf).repartition(8), CFG).toPandas()
    assert sorted(map(tuple, got.to_numpy().tolist())) == _brute(pdf)


def test_rle_roundtrip_reconstructs_mask(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "tile": rng.integers(0, 4, 600),
        "r": rng.integers(0, 16, 600),
        "c": rng.integers(0, 16, 600),
        "cnt": 1,
    }).drop_duplicates(["tile", "r", "c"])
    rle = mask_rle(spark.createDataFrame(pdf), CFG).toPandas()
    rebuilt = {
        (t, r, c0 + i)
        for t, r, c0, ln in rle.itertuples(index=False)
        for i in range(ln)
    }
    assert rebuilt == set(map(tuple, pdf[["tile", "r", "c"]].to_numpy().tolist()))


def test_rle_solid_row_is_one_run(spark):
    pdf = pd.DataFrame({
        "tile": [7] * 16, "r": [3] * 16, "c": list(range(16)), "cnt": [9] * 16,
    })
    got = mask_rle(spark.createDataFrame(pdf), CFG).collect()
    assert len(got) == 1 and got[0].c0 == 0 and got[0].run_len == 16
