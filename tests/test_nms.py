"""NMS (greedy + dominance) vs a brute-force sequential oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.nms import nms_boxes, overlap_iou_pairs

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=3)


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter, ar_a + ar_b - inter


def _brute_greedy(pdf, t_num, t_den):
    order = pdf.sort_values(["score", "id"], ascending=[False, True])
    kept = []
    out = {}
    for _, r in order.iterrows():
        box = (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
        dead = False
        for kb in kept:
            inter, union = _iou(box, kb)
            if inter * t_den > t_num * union:
                dead = True
                break
        if not dead:
            kept.append(box)
        out[int(r["id"])] = not dead
    return out


def _brute_dominance(pdf, t_num, t_den):
    rows = pdf.to_dict("records")
    out = {}
    for r in rows:
        dead = False
        for a in rows:
            if (a["score"], -a["id"]) <= (r["score"], -r["id"]):
                continue
            inter, union = _iou(
                (a["xmin"], a["ymin"], a["xmax"], a["ymax"]),
                (r["xmin"], r["ymin"], r["xmax"], r["ymax"]),
            )
            if inter * t_den > t_num * union:
                dead = True
                break
        out[int(r["id"])] = not dead
    return out


def _dets(seed, n=300):
    rng = np.random.default_rng(seed)
    mins = rng.random((n, 2)) * 90
    ext = 1.0 + rng.random((n, 2)) * 8
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "score": rng.integers(0, 50, n),  # small range => real ties
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })


@pytest.mark.parametrize("seed", [7, 23])
@pytest.mark.parametrize("mode,brute", [
    ("greedy", _brute_greedy), ("dominance", _brute_dominance),
])
def test_nms_matches_brute_force(spark, seed, mode, brute):
    pdf = _dets(seed)
    got = nms_boxes(
        spark.createDataFrame(pdf).repartition(8), 1, 2, CFG, mode=mode
    ).toPandas()
    want = brute(pdf, 1, 2)
    assert len(got) == len(pdf)
    assert {int(r.id): bool(r.kept) for r in got.itertuples()} == want


def test_greedy_revives_chain_dominance_kills(spark):
    """A > B > C chain with IoU(A,B) > t, IoU(B,C) > t, IoU(A,C) <= t:
    greedy keeps C (its only suppressor B died), dominance kills it."""
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "score": [90, 80, 70],
        "xmin": [0.0, 6.0, 12.0], "ymin": [0.0, 0.0, 0.0],
        "xmax": [10.0, 16.0, 22.0], "ymax": [10.0, 10.0, 10.0],
    })
    sdf = spark.createDataFrame(pdf)
    g = {int(r.id): bool(r.kept)
         for r in nms_boxes(sdf, 1, 5, CFG, mode="greedy").collect()}
    d = {int(r.id): bool(r.kept)
         for r in nms_boxes(sdf, 1, 5, CFG, mode="dominance").collect()}
    assert g == {1: True, 2: False, 3: True}
    assert d == {1: True, 2: False, 3: False}


def test_iou_pairs_threshold_is_strict(spark):
    # identical boxes: IoU = 1 -> 1*den > num*1 must use strict >
    pdf = pd.DataFrame({
        "id": [1, 2], "score": [5, 4],
        "xmin": [0.0, 0.0], "ymin": [0.0, 0.0],
        "xmax": [4.0, 4.0], "ymax": [4.0, 4.0],
    })
    sdf = spark.createDataFrame(pdf)
    assert overlap_iou_pairs(sdf, 1, 1, CFG).count() == 0  # t=1: never >
    assert overlap_iou_pairs(sdf, 99, 100, CFG).count() == 1
