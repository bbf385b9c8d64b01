"""query_intersections vs brute-force oracle (reference
tests/unit/test_intersections.py, prtree.h:839-958)."""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent, query_intersections
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def _oracle_self(boxes):
    return {(a, b) for (a, b) in oracle_pairs(boxes, boxes) if a < b}


@pytest.mark.parametrize("strategy", ["sql", "packed"])
@pytest.mark.parametrize("seed", [0, 5])
def test_intersections_oracle(spark, strategy, seed):
    boxes = rand_boxes(1500, seed, ext_max=4.0)
    got = set(
        (r["id_a"], r["id_b"])
        for r in query_intersections(boxes_df(spark, boxes), CFG.with_(strategy=strategy)).collect()
    )
    assert got == _oracle_self(boxes)


@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_intersections_touching(spark, strategy):
    """Touching boxes are a pair (reference test_intersections.py)."""
    boxes = np.array([[0, 0, 1, 1], [1, 1, 2, 2], [5, 5, 6, 6]], dtype=float)
    got = set(
        (r["id_a"], r["id_b"])
        for r in query_intersections(boxes_df(spark, boxes), CFG.with_(strategy=strategy)).collect()
    )
    assert got == {(0, 1)}


@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_intersections_duplicate_free(spark, strategy):
    """Pairs spanning many cells still reported exactly once."""
    boxes = np.vstack([
        np.array([[-5.0, -5.0, 105.0, 105.0]]),      # spans every cell
        rand_boxes(300, 9, ext_max=30.0),
    ])
    df = query_intersections(boxes_df(spark, boxes), CFG.with_(strategy=strategy))
    dup = df.groupBy("id_a", "id_b").count().where("count > 1").count()
    assert dup == 0
    got = set((r["id_a"], r["id_b"]) for r in df.collect())
    assert got == _oracle_self(boxes)
