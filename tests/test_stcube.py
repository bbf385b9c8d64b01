"""st_cube space-time aggregation + zonal_majority tie-break semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from python_prtree_spark.operators.stcube import st_cube


def test_st_cube_binning_and_sums(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # two events same hour, same place (Berlin-ish)
        (base + dt.timedelta(minutes=1), 13.4, 52.5, 1.25),
        (base + dt.timedelta(minutes=59), 13.4, 52.5, 2.50),
        # next hour, same place
        (base + dt.timedelta(hours=1), 13.4, 52.5, 4.00),
        # same hour, antipodal place
        (base + dt.timedelta(minutes=30), -120.0, -33.0, 0.999),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, lng double, lat double, value double"
    )
    out = {
        (r["t_bucket"], r["tx"], r["ty"]): (r["n_events"], r["sum_value_q"])
        for r in st_cube(df, zoom=6, window_sec=3600).collect()
    }
    assert len(out) == 3
    epoch0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # buckets are epoch-floored hours; values quantized floor(v*1000)
    by_bucket = sorted(out.items())
    counts = sorted(v[0] for v in out.values())
    assert counts == [1, 1, 2]
    for (tb, tx, ty), (n, sq) in out.items():
        assert tb % 3600 == 0
        assert 0 <= tx < 64 and 0 <= ty < 64
    sums = sorted(v[1] for v in out.values())
    assert sums == [999, 3750, 4000]  # floor quantization, exact longs
    # tile_id consistency
    r0 = st_cube(df, zoom=6, window_sec=3600).first()
    assert r0["tile_id"] == r0["tx"] * 64 + r0["ty"]


def test_st_cube_no_value(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2026, 1, 1), 0.0, 0.0)], "ts timestamp, lng double, lat double"
    )
    out = st_cube(df, zoom=4, window_sec=60, value=None)
    assert out.columns == ["t_bucket", "tx", "ty", "tile_id", "n_events"]
    assert out.first()["n_events"] == 1
    with pytest.raises(ValueError, match="window_sec"):
        st_cube(df, zoom=4, window_sec=0)


def test_zonal_majority_tie_break(spark):
    """Ties go to the SMALLEST value: build a tile whose decoded samples
    have two equally-common values and check the deterministic winner."""
    import numpy as np
    import pandas as pd

    from python_prtree_spark.functions.codec import encode_image
    from python_prtree_spark.operators.raster import zonal_majority
    from tests.test_knn_pip import _polys_df
    from tests.test_zonal import CFG

    # 2x2 RGB tile: values {10: 6 samples, 20: 6 samples} -> winner 10
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, :, :] = 10
    px[1, :, :] = 20
    t = spark.createDataFrame(
        pd.DataFrame({
            "image_id": [1], "bytes": [encode_image(px, "raw")],
            "xmin": [0.5], "ymin": [0.5], "xmax": [4.5], "ymax": [4.5],
        }),
        "image_id long, bytes binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    ring = np.array([(0.0, 0.0), (9.0, 0.0), (9.0, 9.0), (0.0, 9.0)])
    rows = zonal_majority(t, _polys_df(spark, [ring]), CFG).collect()
    assert len(rows) == 1
    assert (rows[0]["poly_id"], rows[0]["majority_value"], rows[0]["n_majority"]) \
        == (0, 10, 6)
