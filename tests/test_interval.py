"""interval_overlap_join vs a brute inequality scan."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.asof import interval_overlap_join

CFG = EngineConfig(extent=Extent(0.0, 0.0, 1000.0, 1.0), level=4)


def _df(spark, rows, id_name):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[id_name, "start", "end"]),
        f"{id_name} long, start double, end double",
    )


def _brute(a_rows, b_rows):
    return {(i, j) for i, s1, e1 in a_rows for j, s2, e2 in b_rows
            if s1 <= e2 and s2 <= e1}


def _run(spark, a_rows, b_rows):
    out = interval_overlap_join(
        _df(spark, a_rows, "a_id"), _df(spark, b_rows, "b_id"), CFG
    )
    return {(r["a_id"], r["b_id"]) for r in out.collect()}


def test_vs_brute(spark):
    a = [(i, float((i * 97) % 900), float((i * 97) % 900 + (i % 30) + 1))
         for i in range(120)]
    b = [(j, float((j * 131) % 920), float((j * 131) % 920 + (j % 15) + 2))
         for j in range(60)]
    assert _run(spark, a, b) == _brute(a, b)


def test_touching_counts_disjoint_does_not(spark):
    a = [(1, 10.0, 20.0)]
    b = [(1, 20.0, 30.0), (2, 20.00001, 30.0), (3, 0.0, 9.999)]
    assert _run(spark, a, b) == {(1, 1)}


def test_containment_and_band_straddle(spark):
    # one interval spanning many bands; one tiny one inside it
    a = [(7, 50.0, 800.0)]
    b = [(9, 400.0, 400.5), (10, 900.0, 950.0)]
    assert _run(spark, a, b) == {(7, 9)}


def test_no_duplicates_across_bands(spark):
    # both sides straddle several bands -> the pair must appear ONCE
    a = [(1, 100.0, 600.0)]
    b = [(2, 200.0, 700.0)]
    rows = interval_overlap_join(
        _df(spark, a, "a_id"), _df(spark, b, "b_id"), CFG
    ).collect()
    assert len(rows) == 1
