"""area_weighted_transfer (areal interpolation) vs numpy brute force:
positive-overlap pairing, area-fraction weights, fixed-point quantized
sums, degenerate/touching-box exclusion."""

from __future__ import annotations

import math

import numpy as np

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.areal import area_weighted_transfer
from tests.conftest import rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def _src_df(spark, boxes, values):
    rows = [
        (int(i), float(b[0]), float(b[1]), float(b[2]), float(b[3]), float(v))
        for i, (b, v) in enumerate(zip(boxes, values))
    ]
    return spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double, value double"
    )


def _zones_df(spark, boxes):
    rows = [
        (int(i), float(b[0]), float(b[1]), float(b[2]), float(b[3]))
        for i, b in enumerate(boxes)
    ]
    return spark.createDataFrame(
        rows, "zone_id long, xmin double, ymin double, xmax double, ymax double"
    )


def _oracle(src, values, zones):
    out = {}
    for zi, z in enumerate(zones):
        n, s = 0, 0
        for b, v in zip(src, values):
            iw = min(b[2], z[2]) - max(b[0], z[0])
            ih = min(b[3], z[3]) - max(b[1], z[1])
            sarea = (b[2] - b[0]) * (b[3] - b[1])
            if iw > 0 and ih > 0 and sarea > 0:
                n += 1
                s += math.floor(v * ((iw * ih) / sarea) * 1e6)
        if n:
            out[zi] = (n, s)
    return out


def test_area_weighted_oracle(spark):
    src = rand_boxes(300, 11)
    zones = rand_boxes(40, 12, ext_max=8.0)
    values = (np.arange(300) * 37 % 500) / 7.0
    got = {
        r["zone_id"]: (r["n_src"], r["val_q"])
        for r in area_weighted_transfer(
            _src_df(spark, src, values), _zones_df(spark, zones), CFG
        ).collect()
    }
    assert got == _oracle(src, values, zones)


def test_area_weighted_full_containment_weight_is_one(spark):
    # a zone containing the whole source gets exactly value * 1e6
    src = _src_df(spark, [(10, 10, 20, 20)], [3.5])
    zones = _zones_df(spark, [(0, 0, 50, 50)])
    rows = area_weighted_transfer(src, zones, CFG).collect()
    assert len(rows) == 1
    assert rows[0]["n_src"] == 1
    assert rows[0]["val_q"] == 3_500_000


def test_area_weighted_touching_and_degenerate_excluded(spark):
    # edge-touching overlap has zero area; zero-area source has no weight
    src = _src_df(
        spark, [(0, 0, 10, 10), (30, 30, 30, 40)], [5.0, 5.0]
    )
    zones = _zones_df(spark, [(10, 0, 20, 10), (25, 25, 45, 45)])
    assert area_weighted_transfer(src, zones, CFG).count() == 0
