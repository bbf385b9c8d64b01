"""Skew handling (explicit hot-cell salting — north rule) and precision
controls (reference prtree.h:75-78, 960-1015)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, batch_query
from python_prtree_spark.functions.tiling import explode_cells
from python_prtree_spark.operators.probe import _hot_cells
from python_prtree_spark.functions.geometry import validate_boxes_np
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

EXT = Extent(0, 0, 100, 100)


def _hot_corpus(n_hot=3000, n_rest=500):
    """A Zipf-ish corpus: n_hot boxes crammed into one cell + background."""
    rng = np.random.default_rng(111)
    hot_mins = rng.random((n_hot, 2)) * 5.0          # all inside cell (0,0) @ level 3
    hot = np.hstack([hot_mins, hot_mins + rng.random((n_hot, 2)) * 0.5])
    rest = rand_boxes(n_rest, 112, ext_max=3.0)
    return np.vstack([hot, rest])


def test_salting_detects_hot_cells(spark):
    boxes = _hot_corpus()
    cfg = EngineConfig(extent=EXT, level=3, salt_threshold=500, strategy="packed")
    cells = explode_cells(boxes_df(spark, boxes), cfg.extent, cfg.level)
    hot = _hot_cells(cells.select(F.col("id").alias("_did"), "cell",
                                  "xmin", "ymin", "xmax", "ymax"), cfg)
    assert hot is not None
    rows = {r["cell"]: r["n_salts"] for r in hot.collect()}
    assert rows and max(rows.values()) >= 2


@pytest.mark.parametrize("threshold", [500, 10_000_000])
def test_salted_results_exact(spark, threshold):
    """Salted and unsalted packed runs both equal the oracle."""
    boxes = _hot_corpus()
    qboxes = np.vstack([rand_boxes(30, 113, ext_max=4.0),
                        [[0.0, 0.0, 6.0, 6.0]]])  # probe straddling the hot cell
    cfg = EngineConfig(extent=EXT, level=3, salt_threshold=threshold, strategy="packed")
    got = set(
        (r["qid"], r["id"])
        for r in batch_query(boxes_df(spark, boxes), boxes_df(spark, qboxes, "qid"), cfg).collect()
    )
    assert got == oracle_pairs(qboxes, boxes)


def test_hist_skip_factor_gates_histogram(spark):
    """r6 optimization: the sampled hot-cell histogram job is skipped while
    n_data <= hist_skip_factor * salt_threshold (worst-case single task is
    bounded, salting is balance-only), and still runs above the bound."""
    boxes = _hot_corpus()          # 3500 rows, ~3000 in one cell
    cfg = EngineConfig(extent=EXT, level=3, salt_threshold=500, strategy="packed")
    cells = explode_cells(boxes_df(spark, boxes), cfg.extent, cfg.level).select(
        F.col("id").alias("_did"), "cell", "xmin", "ymin", "xmax", "ymax"
    )
    # inside the skip window (3500 <= 4 * 1000): no histogram, no salting
    assert _hot_cells(cells, cfg.with_(salt_threshold=1000), n_data=3500) is None
    # above it (3500 > 4 * 500): histogram runs and finds the hot cell
    hot = _hot_cells(cells, cfg, n_data=3500)
    assert hot is not None and hot.count() >= 1
    # unknown count → histogram always runs (no skip without evidence)
    assert _hot_cells(cells, cfg.with_(salt_threshold=1000), n_data=None) is not None


def test_batch_query_deterministic(spark):
    """Reference test_parallel_configuration.py: identical results across
    repeated runs."""
    boxes = rand_boxes(800, 114)
    qboxes = rand_boxes(50, 115)
    cfg = EngineConfig(extent=EXT, level=3, strategy="packed")
    runs = [
        frozenset(
            (r["qid"], r["id"])
            for r in batch_query(boxes_df(spark, boxes), boxes_df(spark, qboxes, "qid"), cfg).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


# ---------------------------------------------------------------------------
# precision controls
# ---------------------------------------------------------------------------

def test_subnormal_detection_toggle():
    """detect_subnormal on → reject; off → accept (prtree.h:165-177 +
    setters :960-1015)."""
    sub = np.array([[0.0, 0.0, 5e-310, 1.0]])  # 5e-310 is subnormal
    cfg_on = EngineConfig(detect_subnormal=True)
    cfg_off = EngineConfig(detect_subnormal=False)
    with pytest.raises(ValueError, match="Subnormal"):
        validate_boxes_np(sub, cfg_on)
    validate_boxes_np(sub, cfg_off)  # must not raise


def test_epsilons_do_not_affect_queries(spark):
    """Reference invariant: epsilons affect insert placement/validation
    only — query results compare raw coordinates (bounding_box.h:104-123).
    Same query under wildly different epsilons → same results."""
    boxes = rand_boxes(300, 116)
    qboxes = rand_boxes(20, 117)
    outs = []
    for rel in (1e-6, 1e-1):
        cfg = EngineConfig(extent=EXT, level=3, rel_epsilon=rel, abs_epsilon=rel)
        outs.append(frozenset(
            (r["qid"], r["id"])
            for r in batch_query(boxes_df(spark, boxes), boxes_df(spark, qboxes, "qid"), cfg).collect()
        ))
    assert outs[0] == outs[1] == frozenset(oracle_pairs(qboxes, boxes))
