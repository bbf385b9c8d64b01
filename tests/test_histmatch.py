"""histogram_match vs a brute nearest-rank quantile mapping."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark.operators.raster import histogram_match


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _brute_map(src_vals, ref_vals):
    ss, rs = sorted(src_vals), sorted(ref_vals)
    n_s, n_r = len(ss), len(rs)
    out = {}
    for v in set(ss):
        cs = sum(1 for x in ss if x <= v)
        out[v] = min(w for w in set(rs)
                     if sum(1 for y in rs if y <= w) * n_s >= cs * n_r)
    return out


def _run(spark, src, ref):
    out = histogram_match(_df(spark, src), _df(spark, ref))
    return {(r["tile"], r["r"], r["c"]): r["v"] for r in out.collect()}


def _expect(src, ref):
    m = _brute_map([v for *_, v in src], [v for *_, v in ref])
    return {(t, r, c): m[v] for t, r, c, v in src}


def test_vs_brute(spark):
    src = [(t, r, c, (t * 7 + r * 3 + c) % 9 + 1)
           for t in range(4) for r in range(5) for c in range(5)]
    ref = [(t, r, c, ((t + r + c) % 5) * 10 + 3)
           for t in range(3) for r in range(4) for c in range(4)]
    assert _run(spark, src, ref) == _expect(src, ref)


def test_identity_on_same_histogram(spark):
    src = [(0, r, c, (r + c) % 4 + 1) for r in range(6) for c in range(6)]
    # same value multiset at different positions -> identity mapping
    ref = [(9, r, c, (r + c) % 4 + 1) for r in range(6) for c in range(6)]
    got = _run(spark, src, ref)
    assert got == {(t, r, c): v for t, r, c, v in src}


def test_constant_reference(spark):
    src = [(0, 0, 0, 1), (0, 0, 1, 5), (0, 0, 2, 9)]
    ref = [(0, 0, 0, 7), (0, 1, 0, 7)]
    got = _run(spark, src, ref)
    assert set(got.values()) == {7}


def test_shifted_uniform_maps_monotone(spark):
    src = [(0, 0, c, c + 1) for c in range(8)]          # 1..8
    ref = [(0, 1, c, c + 101) for c in range(8)]        # 101..108
    got = _run(spark, src, ref)
    assert got == {(0, 0, c): c + 101 for c in range(8)}


def test_empty_reference_rejected(spark):
    with pytest.raises(ValueError, match="empty"):
        histogram_match(_df(spark, [(0, 0, 0, 1)]), _df(spark, []))


def test_empty_source_ok(spark):
    out = histogram_match(_df(spark, []), _df(spark, [(0, 0, 0, 1)]))
    assert out.collect() == []
