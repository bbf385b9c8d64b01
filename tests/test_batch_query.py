"""batch_query vs the brute-force oracle — the reference's core contract
(tests/unit/test_batch_query.py, test_query.py in /root/reference).
Both physical strategies must return identical, duplicate-free pair sets.
"""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent, batch_query, batch_query_array, point_query
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3, strategy="sql")


def _run(spark, dboxes, qboxes, cfg, dids=None):
    d = boxes_df(spark, dboxes, "id", dids)
    q = boxes_df(spark, qboxes, "qid")
    rows = batch_query(d, q, cfg).collect()
    return set((r["qid"], r["id"]) for r in rows)


@pytest.mark.parametrize("strategy", ["sql", "packed"])
@pytest.mark.parametrize("seed", [0, 1])
def test_batch_query_oracle(spark, strategy, seed):
    dboxes = rand_boxes(2000, seed)
    qboxes = rand_boxes(100, seed + 100)
    cfg = CFG.with_(strategy=strategy)
    got = _run(spark, dboxes, qboxes, cfg)
    exp = oracle_pairs(qboxes, dboxes)
    assert got == exp


@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_small_extents(spark, strategy):
    dboxes = rand_boxes(3000, 7, ext_max=0.5)
    qboxes = rand_boxes(200, 8, ext_max=2.0)
    cfg = CFG.with_(strategy=strategy, level=5)
    assert _run(spark, dboxes, qboxes, cfg) == oracle_pairs(qboxes, dboxes)


def test_auto_geometry(spark):
    """extent/level resolved from data when unset."""
    dboxes = rand_boxes(1000, 3)
    qboxes = rand_boxes(50, 4)
    cfg = EngineConfig(extent=None, level=None, strategy="sql")
    assert _run(spark, dboxes, qboxes, cfg) == oracle_pairs(qboxes, dboxes)


def test_touching_boxes_intersect(spark):
    """Closed intervals: touching counts (reference test_query.py:267-285)."""
    d = np.array([[0.0, 0.0, 1.0, 1.0]])
    q = np.array([[1.0, 1.0, 2.0, 2.0]])
    for strat in ("sql", "packed"):
        assert _run(spark, d, q, CFG.with_(strategy=strat)) == {(0, 0)}


def test_tiny_gap_does_not_intersect(spark):
    """float64 precision (reference test_precision.py:58-80)."""
    d = np.array([[10.0, 10.0, 75.02750896, 50.0]])
    q = np.array([[75.02751435, 10.0, 80.0, 50.0]])
    for strat in ("sql", "packed"):
        assert _run(spark, d, q, CFG.with_(strategy=strat)) == set()


def test_degenerate_and_point_query(spark):
    """Points ≡ zero-extent boxes (reference prtree.h:596-615)."""
    import pandas as pd

    dboxes = rand_boxes(500, 11)
    rng = np.random.default_rng(12)
    pts = rng.random((40, 2)) * 100
    qboxes = np.hstack([pts, pts])  # degenerate
    exp = oracle_pairs(qboxes, dboxes)
    got_box = _run(spark, dboxes, qboxes, CFG)
    pts_df = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(pts)), "x": pts[:, 0], "y": pts[:, 1]})
    )
    got_pt = set(
        (r["qid"], r["id"])
        for r in point_query(boxes_df(spark, dboxes), pts_df, CFG).collect()
    )
    assert got_box == exp
    assert got_pt == exp


def test_huge_query_returns_all(spark):
    """[-1e10, 1e10]^2 probe returns every id (reference test_query.py:311-329)."""
    dboxes = rand_boxes(300, 13)
    q = np.array([[-1e10, -1e10, 1e10, 1e10]])
    for strat in ("sql", "packed"):
        got = _run(spark, dboxes, q, CFG.with_(strategy=strat))
        assert got == {(0, i) for i in range(300)}


def test_negative_ids(spark):
    """Negative ids are legal (reference
    tests/unit/test_construction.py test_construction_with_negative_indices;
    the empty-insert dummy workaround relies on them, core.py:478-494)."""
    boxes = rand_boxes(300, 151, ext_max=6.0)
    ids = np.arange(300) - 150  # ids in [-150, 150)
    d = boxes_df(spark, boxes, ids=ids)
    qboxes = rand_boxes(40, 152, ext_max=6.0)
    for strat in ("sql", "packed"):
        got = {
            (r["qid"], r["id"])
            for r in batch_query(d, boxes_df(spark, qboxes, "qid"),
                                 CFG.with_(strategy=strat)).collect()
        }
        exp = {(q, int(ids[di])) for (q, di) in oracle_pairs(qboxes, boxes)}
        assert got == exp, strat


def test_negative_coords(spark):
    dboxes = rand_boxes(200, 17) - 50.0
    qboxes = rand_boxes(30, 18) - 50.0
    cfg = EngineConfig(extent=Extent(-50, -50, 110, 110), level=3, strategy="sql")
    assert _run(spark, dboxes, qboxes, cfg) == oracle_pairs(qboxes, dboxes)


def test_batch_query_array_shape(spark):
    """Array form: sorted ids, empty arrays for no-hit queries
    (reference prtree.h:731-733, sort at :786)."""
    dboxes = rand_boxes(400, 21, ext_max=1.0)
    qboxes = np.vstack([rand_boxes(30, 22, ext_max=1.0),
                        [[2000.0, 2000.0, 2001.0, 2001.0]]])  # guaranteed miss
    d = boxes_df(spark, dboxes)
    q = boxes_df(spark, qboxes, "qid")
    rows = {r["qid"]: r for r in batch_query_array(d, q, CFG).collect()}
    exp = oracle_pairs(qboxes, dboxes)
    assert len(rows) == len(qboxes)
    for qid in range(len(qboxes)):
        ids = rows[qid]["ids"]
        assert ids == sorted(ids)
        assert rows[qid]["n_hits"] == len(ids)
        assert set(ids) == {d for (q_, d) in exp if q_ == qid}


def test_empty_query_batch(spark):
    """(0,4) query batch → empty result (reference test_batch_query.py:41-56)."""
    d = boxes_df(spark, rand_boxes(50, 23))
    q = boxes_df(spark, np.empty((0, 4)), "qid")
    assert batch_query(d, q, CFG).count() == 0


def test_duplicate_free_across_cells(spark):
    """A giant data box spanning every cell must be reported once per query."""
    dboxes = np.array([[-5.0, -5.0, 105.0, 105.0]] * 1 + [[10, 10, 20, 20]])
    qboxes = rand_boxes(25, 29)
    for strat in ("sql", "packed"):
        got = batch_query(
            boxes_df(spark, dboxes), boxes_df(spark, qboxes, "qid"),
            CFG.with_(strategy=strat),
        ).groupBy("qid", "id").count().where("count > 1").count()
        assert got == 0
