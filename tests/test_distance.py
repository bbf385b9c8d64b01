"""Within-distance join (ST_DWithin analogue) vs a brute-force numpy
oracle — point-to-box Euclidean distance, closed (<= radius) semantics."""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.distance import distance_join
from tests.conftest import boxes_df, rand_boxes

EXT = Extent(0, 0, 120, 120)
CFG = EngineConfig(extent=EXT, level=3)


def _points_df(spark, pts: np.ndarray):
    import pandas as pd

    pdf = pd.DataFrame({
        "qid": np.arange(len(pts), dtype=np.int64),
        "x": pts[:, 0], "y": pts[:, 1],
    })
    return spark.createDataFrame(pdf, schema="qid long, x double, y double")


def _oracle(pts: np.ndarray, boxes: np.ndarray, r: float) -> dict[tuple[int, int], int]:
    dx = np.maximum(np.maximum(boxes[None, :, 0] - pts[:, None, 0:1][:, :, 0],
                               pts[:, None, 0:1][:, :, 0] - boxes[None, :, 2]), 0.0)
    dy = np.maximum(np.maximum(boxes[None, :, 1] - pts[:, None, 1:2][:, :, 0],
                               pts[:, None, 1:2][:, :, 0] - boxes[None, :, 3]), 0.0)
    d2 = dx * dx + dy * dy
    qi, di = np.nonzero(d2 <= r * r)
    return {
        (int(q), int(d)): int(np.floor(d2[q, d] * 1e6))
        for q, d in zip(qi, di)
    }


@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_distance_join_matches_oracle(spark, strategy):
    boxes = rand_boxes(400, 21, ext_max=4.0)
    rng = np.random.default_rng(22)
    pts = rng.random((120, 2)) * 100.0
    r = 3.0
    cfg = CFG.with_(strategy=strategy)
    got = {
        (r_["qid"], r_["id"]): r_["dist2_q"]
        for r_ in distance_join(boxes_df(spark, boxes), _points_df(spark, pts),
                                r, cfg).collect()
    }
    assert got == _oracle(pts, boxes, r)


def test_distance_join_zero_radius_is_containment(spark):
    """r=0: only points ON or INSIDE a box pair with it (dist² = 0)."""
    boxes = rand_boxes(200, 31, ext_max=5.0)
    rng = np.random.default_rng(32)
    pts = rng.random((80, 2)) * 100.0
    got = {
        (r_["qid"], r_["id"]): r_["dist2_q"]
        for r_ in distance_join(boxes_df(spark, boxes), _points_df(spark, pts),
                                0.0, CFG).collect()
    }
    assert got == _oracle(pts, boxes, 0.0)
    assert all(v == 0 for v in got.values())


def test_distance_join_rejects_bad_radius(spark):
    boxes = boxes_df(spark, rand_boxes(5, 1))
    pts = _points_df(spark, np.zeros((2, 2)))
    with pytest.raises(ValueError):
        distance_join(boxes, pts, -1.0, CFG)
    with pytest.raises(ValueError):
        distance_join(boxes, pts, float("nan"), CFG)
