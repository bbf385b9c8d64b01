"""Panoptic matching + PQ vs hand-computed values and a brute twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.panoptic import (
    class_iou,
    confusion_matrix,
    panoptic_quality,
    segment_matches,
)


def _raster_df(spark, arr, label_offset=0):
    """Dense int array -> sparse (gx, gy, label) rows; 0 = void."""
    ys, xs = np.nonzero(arr)
    return spark.createDataFrame(pd.DataFrame({
        "gx": xs.astype(np.int64), "gy": ys.astype(np.int64),
        "label": arr[ys, xs].astype(np.int64) + label_offset,
    }))


def test_pq_hand_case(spark):
    """pred: segment 1 = 4px matching gt 1 exactly; segment 2 = 4px with
    2px overlap of gt 2's 4px (IoU 2/6 -> no match); gt 3 unmatched."""
    pred = np.zeros((8, 8), dtype=np.int64)
    gt = np.zeros((8, 8), dtype=np.int64)
    pred[0:2, 0:2] = 1
    gt[0:2, 0:2] = 1
    pred[4:6, 0:2] = 2
    gt[5:7, 0:2] = 2
    gt[0:2, 6:8] = 3
    m = segment_matches(
        _raster_df(spark, pred), _raster_df(spark, gt)
    ).toPandas().set_index(["plabel", "glabel"])
    assert m.loc[(1, 1), "n_i"] == 4 and bool(m.loc[(1, 1), "matched"])
    assert m.loc[(2, 2), "n_i"] == 2 and not bool(m.loc[(2, 2), "matched"])
    assert m.loc[(1, 1), "iou"] == 1.0
    assert m.loc[(2, 2), "iou"] == pytest.approx(2 / 6)
    pq = panoptic_quality(
        _raster_df(spark, pred), _raster_df(spark, gt)
    ).toPandas().iloc[0]
    # TP=1 (iou 1.0), FP=1, FN=2 -> PQ = 1.0 / (1 + 0.5 + 1.0) = 0.4
    assert (int(pq.n_pred), int(pq.n_gt)) == (2, 3)
    assert (int(pq.n_tp), int(pq.n_fp), int(pq.n_fn)) == (1, 1, 2)
    assert int(pq.sq_units) == 1_000_000_000
    assert pq.pq == pytest.approx(0.4)


def test_pq_identical_rasters_is_one(spark):
    rng = np.random.default_rng(3)
    arr = np.zeros((16, 16), dtype=np.int64)
    for i in range(1, 6):
        x, y = rng.integers(0, 12, 2)
        arr[y:y + 3, x:x + 3] = i
    a, b = _raster_df(spark, arr), _raster_df(spark, arr)
    pq = panoptic_quality(a, b).toPandas().iloc[0]
    assert int(pq.n_tp) == int(pq.n_pred) == int(pq.n_gt)
    assert int(pq.n_fp) == 0 and int(pq.n_fn) == 0
    assert pq.pq == pytest.approx(1.0, abs=1e-8)


def test_confusion_and_class_iou_brute(spark):
    rng = np.random.default_rng(12)
    pred = rng.integers(0, 4, (20, 20)).astype(np.int64)  # 0 = void
    gt = rng.integers(0, 4, (20, 20)).astype(np.int64)
    pdf = confusion_matrix(
        _raster_df(spark, pred), _raster_df(spark, gt)
    ).toPandas()
    # brute confusion over the union of labeled pixel sets
    want = {}
    for y in range(20):
        for x in range(20):
            p = int(pred[y, x]) or None
            g = int(gt[y, x]) or None
            if p is None and g is None:
                continue
            want[(p, g)] = want.get((p, g), 0) + 1
    got = {
        (None if pd.isna(r.pclass) else int(r.pclass),
         None if pd.isna(r.gclass) else int(r.gclass)): int(r.n)
        for r in pdf.itertuples()
    }
    assert got == want
    ious = class_iou(
        _raster_df(spark, pred), _raster_df(spark, gt)
    ).toPandas().set_index("cls")
    for c in (1, 2, 3):
        tp = want.get((c, c), 0)
        fp = sum(v for (p, g), v in want.items() if p == c and g != c)
        fn = sum(v for (p, g), v in want.items() if g == c and p != c)
        row = ious.loc[c]
        assert (int(row.n_tp), int(row.n_fp), int(row.n_fn)) == (tp, fp, fn)
        assert row.iou == tp / (tp + fp + fn)


def test_class_iou_identical_is_one(spark):
    arr = np.arange(1, 65, dtype=np.int64).reshape(8, 8) % 5 + 1
    ious = class_iou(_raster_df(spark, arr), _raster_df(spark, arr)).toPandas()
    assert (ious["iou"] == 1.0).all()
    assert (ious["n_fp"] == 0).all() and (ious["n_fn"] == 0).all()


def test_match_uniqueness_at_half(spark):
    """At t=1/2, every segment appears in at most one matched pair."""
    rng = np.random.default_rng(9)
    pred = np.zeros((24, 24), dtype=np.int64)
    gt = np.zeros((24, 24), dtype=np.int64)
    for i in range(1, 9):
        x, y = rng.integers(0, 19, 2)
        pred[y:y + 4, x:x + 4] = i
        gt[y + 1:y + 5, x:x + 4] = i + 100
    m = segment_matches(_raster_df(spark, pred), _raster_df(spark, gt)).toPandas()
    mm = m[m["matched"]]
    assert mm["plabel"].is_unique and mm["glabel"].is_unique
    assert (mm["iou"] > 0.5).all()
