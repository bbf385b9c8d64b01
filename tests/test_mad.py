"""mad_outliers vs a brute nearest-rank median/MAD fold."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark.operators.qsketch import mad_outliers


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "g", "value"]),
        "id long, g string, value double",
    )


def _med(vals):
    s = sorted(vals)
    return s[(len(s) + 2) // 2 - 1]   # upper nearest-rank


def _brute(rows, k=3, scale=100):
    out = {}
    groups = {}
    for i, g, val in rows:
        groups.setdefault(g, []).append((i, round(val * scale)))
    for g, members in groups.items():
        med = _med([v for _, v in members])
        mad = _med([abs(v - med) for _, v in members])
        for i, v in members:
            dev = abs(v - med)
            if dev > k * mad:
                out[i] = (g, v, med, mad, dev)
    return out


def _run(spark, rows, **kw):
    res = mad_outliers(_df(spark, rows), "g", "value", "id", **kw)
    return {r["id"]: (r["g"], r["v_fp"], r["med_fp"], r["mad_fp"], r["dev_fp"])
            for r in res.collect()}


def test_vs_brute(spark):
    rows = [(i, f"g{i % 3}", ((i * 37) % 100) / 4.0) for i in range(90)]
    rows += [(1000, "g0", 999.99), (1001, "g1", -500.25)]  # planted spikes
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert 1000 in got and 1001 in got


def test_tight_cluster_flags_only_spike(spark):
    rows = [(i, "a", 10.0 + (i % 5) / 100.0) for i in range(50)]
    rows.append((99, "a", 50.0))
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert set(got) == {99}


def test_zero_mad_flags_any_deviation(spark):
    # majority identical -> MAD 0 -> every differing row flagged
    rows = [(i, "z", 7.0) for i in range(10)] + [(50, "z", 7.01)]
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert set(got) == {50}


def test_k_threshold(spark):
    rows = [(i, "k", float(v)) for i, v in
            enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9])]
    # med=5, devs 0..4, mad=2: k=1 flags dev>2, k=2 flags dev>4 (none)
    got1 = _run(spark, rows, k_num=1, k_den=1)
    assert got1 == _brute(rows, k=1)
    assert len(got1) == 4
    assert _run(spark, rows, k_num=2, k_den=1) == _brute(rows, k=2) == {}
