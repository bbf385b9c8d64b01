"""Shared fixtures: one local SparkSession per test run; seeded numpy
oracle mirroring the reference's (/root/reference/tests/conftest.py:20-58):
brute-force closed-interval intersection, set-equality assertions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("python_prtree_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def rand_boxes(n: int, seed: int, extent: float = 100.0, ext_max: float = None) -> np.ndarray:
    """The reference fixture recipe (conftest.py:20-29): uniform mins,
    extents >= 1 (or custom max extent)."""
    rng = np.random.default_rng(seed)
    mins = rng.random((n, 2)) * extent
    if ext_max is None:
        ext = rng.random((n, 2)) * extent + 1
    else:
        ext = rng.random((n, 2)) * ext_max
    return np.hstack([mins, mins + ext])


def oracle_pairs(qboxes: np.ndarray, dboxes: np.ndarray) -> set[tuple[int, int]]:
    """Brute-force oracle (reference conftest.py:56-58), vectorized."""
    if len(qboxes) == 0 or len(dboxes) == 0:
        return set()
    q, d = np.asarray(qboxes, float), np.asarray(dboxes, float)
    mask = (
        (q[:, None, 0] <= d[None, :, 2]) & (d[None, :, 0] <= q[:, None, 2])
        & (q[:, None, 1] <= d[None, :, 3]) & (d[None, :, 1] <= q[:, None, 3])
    )
    qi, di = np.nonzero(mask)
    return set(zip(qi.tolist(), di.tolist()))


def boxes_df(spark, boxes: np.ndarray, id_col: str = "id", ids=None):
    import pandas as pd

    ids = ids if ids is not None else np.arange(len(boxes))
    pdf = pd.DataFrame({
        id_col: np.asarray(ids, dtype=np.int64),
        "xmin": boxes[:, 0], "ymin": boxes[:, 1],
        "xmax": boxes[:, 2], "ymax": boxes[:, 3],
    })
    schema = f"{id_col} long, xmin double, ymin double, xmax double, ymax double"
    return spark.createDataFrame(pdf, schema=schema)
