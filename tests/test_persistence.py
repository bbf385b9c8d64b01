"""Persistence + checkpoint/lineage + partition-granular resume
(reference save/load at prtree.h:119-143 → durable index tables;
north rule: resumable from checkpoint with per-partition lineage)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, batch_query, load_index, save_index
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=4)


@pytest.fixture()
def tmp_index(tmp_path):
    return str(tmp_path / "idx")


def test_save_load_roundtrip(spark, tmp_index):
    """Query results identical pre/post persistence
    (reference tests/unit/test_persistence.py:77-105)."""
    boxes = rand_boxes(2000, 61, ext_max=5.0)
    qboxes = rand_boxes(80, 62, ext_max=5.0)
    d = boxes_df(spark, boxes)
    save_index(d, tmp_index, CFG)
    idx = load_index(spark, tmp_index)
    got = set(
        (r["qid"], r["id"])
        for r in idx.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    )
    assert got == oracle_pairs(qboxes, boxes)
    assert idx.size() == 2000


def test_lineage_metrics(spark, tmp_index):
    boxes = rand_boxes(1000, 63)
    save_index(boxes_df(spark, boxes), tmp_index, CFG)
    lineage = spark.read.parquet(os.path.join(tmp_index, "_lineage"))
    assert set(lineage.columns) >= {"bucket", "n_cells", "n_rows", "status"}
    # cell replication: sum of per-bucket rows >= n (boxes span cells)
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] >= 1000


def test_kill_resume(spark, tmp_index):
    """Simulated kill: drop half the buckets + their lineage rows, then
    resume — only missing buckets are rebuilt, results exact."""
    boxes = rand_boxes(1500, 64, ext_max=5.0)
    d = boxes_df(spark, boxes)
    save_index(d, tmp_index, CFG)

    lineage_path = os.path.join(tmp_index, "_lineage")
    lineage = spark.read.parquet(lineage_path)
    buckets = sorted(r["bucket"] for r in lineage.select("bucket").distinct().collect())
    keep = set(buckets[: len(buckets) // 2])

    # kill: remove data + lineage for the other half
    idx_path = os.path.join(tmp_index, "index")
    for b in buckets:
        if b not in keep:
            shutil.rmtree(os.path.join(idx_path, f"bucket={b}"), ignore_errors=True)
    kept_lineage = lineage.where(F.col("bucket").isin(*keep)).collect()
    shutil.rmtree(lineage_path)
    spark.createDataFrame(kept_lineage, lineage.schema).write.parquet(lineage_path)

    save_index(d, tmp_index, CFG, resume=True)

    idx = load_index(spark, tmp_index)
    qboxes = rand_boxes(60, 65, ext_max=5.0)
    got = set(
        (r["qid"], r["id"])
        for r in idx.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    )
    assert got == oracle_pairs(qboxes, boxes)
    # lineage complete again
    lineage2 = spark.read.parquet(lineage_path)
    assert set(r["bucket"] for r in lineage2.select("bucket").collect()) == set(buckets)


def test_incremental_refresh(spark, tmp_index):
    """Dirty-cell incremental rebuild: mutate → refresh_index rewrites only
    touched cells; loaded-index results match a fresh full build."""
    from python_prtree_spark import PRTreeTable

    boxes = rand_boxes(800, 66, ext_max=5.0)
    d = boxes_df(spark, boxes)
    cfg = CFG.with_(strategy="sql")
    t = PRTreeTable(d, cfg)
    save_index(d, tmp_index, t.cfg)

    t2 = t.erase(list(range(100))).insert(
        boxes_df(spark, rand_boxes(50, 67, ext_max=5.0), ids=np.arange(1000, 1050))
    )
    assert t2.dirty_cells
    t2.refresh_index(tmp_index)
    assert not t2.dirty_cells

    idx = load_index(spark, tmp_index)
    qboxes = rand_boxes(60, 68, ext_max=5.0)
    got = set(
        (r["qid"], r["id"])
        for r in idx.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    )
    new_boxes = np.vstack([boxes[100:], rand_boxes(50, 67, ext_max=5.0)])
    new_ids = np.concatenate([np.arange(100, 800), np.arange(1000, 1050)])
    exp = set()
    m = oracle_pairs(qboxes, new_boxes)
    for (q, di) in m:
        exp.add((q, int(new_ids[di])))
    assert got == exp
