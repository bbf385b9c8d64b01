"""3D/4D operators vs brute-force oracle — parity with the reference's
PRTree3D/PRTree4D families (python_bindings.cc:174-408; legacy suite runs
5 seeds x 3 dims)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.nd import batch_query_nd, box_cols, query_intersections_nd

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3, strategy="sql")


def rand_boxes_nd(n, dims, seed, ext_max=20.0):
    rng = np.random.default_rng(seed)
    mins = rng.random((n, dims)) * 100
    ext = rng.random((n, dims)) * ext_max + 1
    return np.hstack([mins, mins + ext])


def oracle_nd(q, d, dims):
    out = set()
    for qi in range(len(q)):
        hit = np.ones(len(d), dtype=bool)
        for k in range(dims):
            hit &= (q[qi, k] <= d[:, dims + k]) & (d[:, k] <= q[qi, dims + k])
        for di in np.nonzero(hit)[0]:
            out.add((qi, int(di)))
    return out


def nd_df(spark, boxes, dims, id_col="id"):
    cols = box_cols(dims)
    pdf = pd.DataFrame({id_col: np.arange(len(boxes))})
    for i, c in enumerate(cols):
        pdf[c] = boxes[:, i]
    schema = f"{id_col} long, " + ", ".join(f"{c} double" for c in cols)
    return spark.createDataFrame(pdf, schema=schema)


@pytest.mark.parametrize("dims", [2, 3, 4])
@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_batch_query_nd_oracle(spark, dims, strategy):
    d = rand_boxes_nd(1000, dims, dims * 10)
    q = rand_boxes_nd(60, dims, dims * 10 + 1)
    got = set(
        (r["qid"], r["id"])
        for r in batch_query_nd(nd_df(spark, d, dims), nd_df(spark, q, dims, "qid"),
                                dims, CFG.with_(strategy=strategy)).collect()
    )
    assert got == oracle_nd(q, d, dims)


@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_intersections_3d(spark, strategy):
    d = rand_boxes_nd(500, 3, 77, ext_max=10.0)
    got = set(
        (r["id_a"], r["id_b"])
        for r in query_intersections_nd(nd_df(spark, d, 3), 3,
                                        CFG.with_(strategy=strategy)).collect()
    )
    exp = {(a, b) for (a, b) in oracle_nd(d, d, 3) if a < b}
    assert got == exp


def test_nd_packed_zdense_salted(spark):
    """z/w-dense skew: hundreds of boxes stacked in ONE xy cell (varying
    only in z) — the packed path salts the hot cell (probes replicated,
    build rows hash-split) and results stay exact."""
    rng = np.random.default_rng(91)
    n = 400
    boxes = np.zeros((n, 6))
    boxes[:, 0] = 5.0 + rng.random(n)          # xy: all inside one cell
    boxes[:, 1] = 5.0 + rng.random(n)
    boxes[:, 2] = rng.random(n) * 100          # z spreads
    boxes[:, 3] = boxes[:, 0] + 0.5
    boxes[:, 4] = boxes[:, 1] + 0.5
    boxes[:, 5] = boxes[:, 2] + 3.0
    q = rand_boxes_nd(40, 3, 92)
    cfg = CFG.with_(strategy="packed", salt_threshold=50, max_salts=8)
    got = set(
        (r["qid"], r["id"])
        for r in batch_query_nd(nd_df(spark, boxes, 3), nd_df(spark, q, 3, "qid"),
                                3, cfg).collect()
    )
    assert got == oracle_nd(q, boxes, 3)


def test_float32_inputs_exact(spark):
    """float32 coords upcast exactly — same results as the float64 twin
    (reference dtype dispatch, core.py:119-145)."""
    d64 = rand_boxes_nd(400, 2, 88)
    d32 = d64.astype(np.float32)
    q64 = rand_boxes_nd(30, 2, 89)
    q32 = q64.astype(np.float32)

    def run(d, q, cast):
        ddf = nd_df(spark, d.astype(np.float64), 2)
        qdf = nd_df(spark, q.astype(np.float64), 2, "qid")
        if cast:
            for c in box_cols(2):
                ddf = ddf.withColumn(c, ddf[c].cast("float"))
                qdf = qdf.withColumn(c, qdf[c].cast("float"))
        return set((r["qid"], r["id"]) for r in batch_query_nd(ddf, qdf, 2, CFG).collect())

    assert run(d32, q32, cast=True) == oracle_nd(
        q32.astype(np.float64), d32.astype(np.float64), 2
    )
