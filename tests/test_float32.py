"""Float32 input family — the repo twin of the reference's
tests/unit/test_precision.py float32/float64/mixed classes.

The reference dispatches separate float32/float64 template classes
(core.py:119-145); our engine upcasts FloatType columns to float64 — an
EXACT mapping (every float32 is representable as a float64, and IEEE
comparison of the upcast values equals comparison of the originals), so
one engine serves both dtype families with identical query semantics:

  * construction with float32 columns (test_construction_with_float32);
  * float32 tree probed by float64 queries and vice versa
    (TestMixedPrecision::test_float32_tree_float64_query);
  * small-gap (~5e-6) and large-magnitude (1e6) float64 no-intersect
    cases (TestFloat64Precision) — queries compare raw coordinates,
    epsilons never affect results (SURVEY §2.1 row 12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, batch_query
from python_prtree_spark.operators.build import build_index
from python_prtree_spark.operators.mutate import PRTreeTable
from tests.conftest import oracle_pairs

EXT = Extent(0, 0, 200, 200)
CFG = EngineConfig(extent=EXT, level=3)


def _f32_boxes(n, seed):
    rng = np.random.default_rng(seed)
    mins = (rng.random((n, 2)) * 100).astype(np.float32)
    ext = (rng.random((n, 2)) + 1).astype(np.float32)
    return np.hstack([mins, mins + ext])  # float32 throughout


def _df(spark, boxes, dtype_name, id_col="id"):
    pdf = pd.DataFrame({
        id_col: np.arange(len(boxes), dtype=np.int64),
        "xmin": boxes[:, 0], "ymin": boxes[:, 1],
        "xmax": boxes[:, 2], "ymax": boxes[:, 3],
    })
    t = "float" if dtype_name == "float32" else "double"
    schema = f"{id_col} long, xmin {t}, ymin {t}, xmax {t}, ymax {t}"
    return spark.createDataFrame(pdf, schema=schema)


def test_construction_with_float32(spark):
    """FloatType columns build a valid index (reference
    test_construction_with_float32); counts and pack totals agree."""
    boxes = _f32_boxes(300, 21)
    d = _df(spark, boxes, "float32")
    t = PRTreeTable(d, CFG)
    assert t.size() == 300
    idx, _ = build_index(d, CFG, n_data_hint=300)
    assert idx.agg(F.sum("n_rows")).collect()[0][0] >= 300
    # persisted arrays are float64 (the single storage dtype)
    assert dict(idx.dtypes)["b_xmin"] == "array<double>"


@pytest.mark.parametrize("strategy", ["sql", "packed"])
@pytest.mark.parametrize("probe_dtype", ["float32", "float64"])
def test_float32_tree_mixed_probe_matches_oracle(spark, strategy, probe_dtype):
    """float32 data x {float32, float64} probes equal the float64 numpy
    oracle computed on the upcast values — upcasting is exact, so the
    dtype families can mix freely (reference TestMixedPrecision)."""
    dboxes = _f32_boxes(400, 22)
    qboxes = _f32_boxes(40, 23) if probe_dtype == "float32" else \
        _f32_boxes(40, 23).astype(np.float64)
    got = set(
        (r["qid"], r["id"]) for r in batch_query(
            _df(spark, dboxes, "float32"),
            _df(spark, qboxes, probe_dtype, "qid"),
            CFG.with_(strategy=strategy),
        ).collect()
    )
    assert got == oracle_pairs(qboxes.astype(np.float64), dboxes.astype(np.float64))


def test_small_gap_float64_no_hit(spark):
    """A ~5e-6 gap separates the boxes: must NOT intersect (reference
    test_small_gap_with_float64 — raw-coordinate comparison, no epsilon
    slop in query results)."""
    a = np.array([[0.0, 0.0, 75.02750896, 100.0]])
    q = np.array([[75.02751435, 0.0, 100.0, 100.0]])
    cfg = EngineConfig(extent=Extent(0, 0, 100, 100), level=2)
    for strategy in ("sql", "packed"):
        rows = batch_query(
            _df(spark, a, "float64"), _df(spark, q, "float64", "qid"),
            cfg.with_(strategy=strategy),
        ).collect()
        assert rows == []


def test_large_magnitude_float64_no_hit(spark):
    """Disjoint boxes at 1e6 magnitude stay disjoint (reference
    test_large_magnitude_coordinates_float64)."""
    base = 1e6
    a = np.array([[base, base + 1, base + 1.0, base + 2.0]])
    q = np.array([[base + 1.1, base + 2.1, base + 2.0, base + 3.0]])
    cfg = EngineConfig(extent=Extent(base - 10, base - 10, base + 10, base + 10), level=2)
    for strategy in ("sql", "packed"):
        rows = batch_query(
            _df(spark, a, "float64"), _df(spark, q, "float64", "qid"),
            cfg.with_(strategy=strategy),
        ).collect()
        assert rows == []


def test_float32_touching_edges_hit(spark):
    """Closed-interval semantics survive the upcast: float32 boxes that
    share exactly one edge value intersect (touching => hit,
    bounding_box.h:104-123)."""
    v = np.float32(50.1)
    a = np.array([[0.0, 0.0, float(v), 10.0]], dtype=np.float64)
    q = np.array([[float(v), 0.0, 60.0, 10.0]], dtype=np.float64)
    cfg = EngineConfig(extent=Extent(0, 0, 100, 100), level=2)
    rows = batch_query(
        _df(spark, a, "float32"), _df(spark, q, "float32", "qid"), cfg
    ).collect()
    assert [(r["qid"], r["id"]) for r in rows] == [(0, 0)]
