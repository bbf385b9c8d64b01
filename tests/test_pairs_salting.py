"""Shard-pair salting of the self-join (VERDICT r2 item 3): a hot cell
holding 10x salt_threshold rows must spread its quadratic candidate work
over many partition keys (>1 task in the pack stage) while the pair set
stays exactly the brute-force oracle."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, query_intersections
from python_prtree_spark.functions.tiling import explode_cells
from python_prtree_spark.operators.pairs import _salted_cells
from python_prtree_spark.operators.probe import resolve_geometry
from tests.conftest import boxes_df

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3,
                   salt_threshold=400, strategy="packed")


def _skewed_boxes(seed: int = 41):
    """4000 tiny boxes crammed into one level-3 cell (12.5-unit tiles) +
    500 spread over the rest of the extent."""
    rng = np.random.default_rng(seed)
    hot_mins = 1.0 + rng.random((4000, 2)) * 9.0          # inside cell (0, 0)
    hot = np.hstack([hot_mins, hot_mins + 0.05 + rng.random((4000, 2)) * 0.05])
    cold_mins = rng.random((500, 2)) * 95.0
    cold = np.hstack([cold_mins, cold_mins + 0.5 + rng.random((500, 2)) * 2.0])
    return np.vstack([hot, cold])


def _brute_pairs(boxes: np.ndarray) -> set[tuple[int, int]]:
    n = len(boxes)
    out = set()
    step = max(1, (1 << 22) // n)
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        m = (
            (boxes[lo:hi, None, 0] <= boxes[None, :, 2])
            & (boxes[None, :, 0] <= boxes[lo:hi, None, 2])
            & (boxes[lo:hi, None, 1] <= boxes[None, :, 3])
            & (boxes[None, :, 1] <= boxes[lo:hi, None, 3])
            & (np.arange(lo, hi)[:, None] < np.arange(n)[None, :])
        )
        ii, jj = np.nonzero(m)
        out.update(zip((ii + lo).tolist(), jj.tolist()))
    return out


def test_hot_cell_pairs_exact_under_salting(spark):
    boxes = _skewed_boxes()
    d = boxes_df(spark, boxes)
    got = {
        (r["id_a"], r["id_b"])
        for r in query_intersections(d, CFG, n_data_hint=len(boxes)).collect()
    }
    assert got == _brute_pairs(boxes)


def test_hot_cell_spreads_over_multiple_tasks(spark):
    """The salted intermediate must assign the hot cell >1 (ka, kb) shard
    key, and those keys must land on >1 shuffle partition — the pack
    stage's per-task work is bounded by the shard size, not the cell."""
    boxes = _skewed_boxes()
    d = boxes_df(spark, boxes)
    cfg, n = resolve_geometry(d, CFG, len(boxes))
    data_c = explode_cells(d, cfg.extent, cfg.level)
    salted = _salted_cells(data_c, cfg, n, "id")
    hot_cell = (
        salted.groupBy("cell").count().orderBy(F.desc("count")).first()["cell"]
    )
    keys = (
        salted.where(F.col("cell") == hot_cell)
        .select("ka", "kb").distinct().count()
    )
    assert keys > 1, "hot cell was not sharded"
    # AQE coalesces this toy volume into one partition (at real scale a hot
    # cell exceeds the advisory partition size and stays split) — disable
    # coalescing to observe the hash distribution the engine shuffles with
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    try:
        spark.conf.set(coalesce_key, "false")
        n_parts = (
            salted.where(F.col("cell") == hot_cell)
            .repartition(F.col("cell"), F.col("ka"), F.col("kb"))
            .select(F.spark_partition_id().alias("pid"))
            .distinct().count()
        )
    finally:
        spark.conf.set(coalesce_key, old)
    assert n_parts > 1, "hot cell still lands on a single task"
    # replication stays bounded: S copies per hot row, S <= max_salts
    n_hot_rows = salted.where(F.col("cell") == hot_cell).count()
    assert n_hot_rows <= 4100 * cfg.max_salts


def test_loaded_index_direct_pack_intersections_salted(spark, tmp_path):
    """LoadedIndex.query_intersections probes the persisted packs directly
    (no base-table reconstruction). With a hot cell split into salt shards
    at build time, cross-shard pairs come from off-diagonal pack pairs —
    the result must still equal brute force exactly."""
    from python_prtree_spark import load_index, save_index
    from pyspark.sql import functions as FF

    boxes = _skewed_boxes(47)
    path = str(tmp_path / "idx")
    save_index(boxes_df(spark, boxes), path, CFG)
    idx = load_index(spark, path)
    # the hot cell really was sharded (salted packs exist)
    assert idx.df.where(FF.col("salt") > 0).count() > 0
    got = {
        (r["id_a"], r["id_b"]) for r in idx.query_intersections().collect()
    }
    assert got == _brute_pairs(boxes)


def test_cold_corpus_unsalted_single_key(spark):
    """Below the threshold nothing is replicated: every row carries the
    single (0, 0) key and the plan is identical to the unsalted one."""
    rng = np.random.default_rng(43)
    mins = rng.random((300, 2)) * 90
    boxes = np.hstack([mins, mins + 1 + rng.random((300, 2)) * 3])
    d = boxes_df(spark, boxes)
    cfg, n = resolve_geometry(d, CFG, 300)
    salted = _salted_cells(explode_cells(d, cfg.extent, cfg.level), cfg, n, "id")
    assert salted.select("ka", "kb", "role").distinct().count() == 1
    got = {
        (r["id_a"], r["id_b"])
        for r in query_intersections(d, CFG, n_data_hint=300).collect()
    }
    assert got == _brute_pairs(boxes)
