"""CUSUM (prefix-form identity vs sequential recurrence) + exact AUC."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.evalstats import cusum_alarms, roc_auc


def test_cusum_equals_sequential_recurrence(spark):
    rng = np.random.default_rng(14)
    rows = []
    for g in range(5):
        vals = np.round(rng.normal(5.0, 2.0, 60), 2)
        if g == 2:
            vals[30:] += 4.0  # planted shift -> alarms
        for t, v in enumerate(vals):
            rows.append({"g": g, "t": t, "v": float(v)})
    pdf = pd.DataFrame(rows)
    got = cusum_alarms(
        spark.createDataFrame(pdf).repartition(8), "g", "t", "v",
        ref_fp=500, threshold_fp=2000, scale=100,
    ).toPandas().sort_values(["g", "t"])
    for g, sub in got.groupby("g"):
        src = pdf[pdf["g"] == g].sort_values("t")
        s = 0
        for (_, r), (_, x) in zip(sub.iterrows(), src.iterrows()):
            v = int(round(x["v"] * 100))
            s = max(0, s + v - 500)
            assert int(r["v_fp"]) == v
            assert int(r["s_fp"]) == s
            assert bool(r["alarm"]) == (s > 2000)
    # the planted-shift group alarms; a clean group mostly doesn't
    assert got[got["g"] == 2]["alarm"].any()


def _auc_brute(scores, labels):
    """Probability a random positive outranks a random negative,
    ties counting 1/2 — the ROC AUC definition."""
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (2 * wins + ties, 2 * len(pos) * len(neg))


def test_roc_auc_matches_definition(spark):
    rng = np.random.default_rng(6)
    rows = []
    for g in range(3):
        n = 80
        y = (rng.random(n) < 0.4).astype(np.int64)
        s = rng.integers(0, 20, n) + y * rng.integers(0, 10, n)
        rows += [{"g": g, "s": int(a), "y": int(b)} for a, b in zip(s, y)]
    pdf = pd.DataFrame(rows)
    got = roc_auc(
        spark.createDataFrame(pdf).repartition(8), "g", "s", "y"
    ).toPandas().set_index("g")
    for g, sub in pdf.groupby("g"):
        num, den = _auc_brute(sub["s"].to_numpy(), sub["y"].to_numpy())
        r = got.loc[g]
        assert (int(r.auc_num), int(r.auc_den)) == (num, den)
        assert r.auc == num / den
        assert 0.0 <= r.auc <= 1.0


def test_roc_auc_perfect_and_degenerate(spark):
    pdf = pd.DataFrame({
        "g": [0] * 4 + [1] * 2,
        "s": [1, 2, 9, 10, 5, 6],
        "y": [0, 0, 1, 1, 1, 1],   # g0 perfectly separated; g1 all-positive
    })
    got = roc_auc(spark.createDataFrame(pdf), "g", "s", "y").toPandas()
    got = got.set_index("g")
    assert got.loc[0, "auc"] == 1.0
    assert pd.isna(got.loc[1, "auc"]) and int(got.loc[1, "n_neg"]) == 0
