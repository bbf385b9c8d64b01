"""Snapshot semantics on the persisted index (sources/store.py): Iceberg's
model made real — immutable data files, versioned manifests, atomic
CURRENT pointer, time travel, rollback, and expire (vacuum).

Reference context: the reference persists one binary blob (prtree.h:
119-143) with no versioning; the north rule's production target is an
Iceberg table, whose snapshot isolation these manifests implement on the
Parquet stand-in.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_prtree_spark import (
    EngineConfig,
    Extent,
    PRTreeTable,
    expire_index_snapshots,
    index_snapshots,
    load_index,
    rollback_index,
    save_index,
)
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=4, strategy="sql")


def _pairs(idx, spark, qboxes):
    q = boxes_df(spark, qboxes, id_col="qid")
    return {(r["qid"], r["id"]) for r in idx.batch_query(q).collect()}


@pytest.fixture()
def built(spark, tmp_path):
    """save → mutate → refresh: v1 (build) and v2 (refresh) on file."""
    path = str(tmp_path / "idx")
    boxes = rand_boxes(2500, 91, ext_max=2.0)
    d = boxes_df(spark, boxes)
    save_index(d, path, CFG)
    t = PRTreeTable.from_index(spark, path)
    t = t.erase(d.where(F.col("id") % 5 == 0).select("id"))
    new = rand_boxes(40, 92, ext_max=2.0)
    t = t.insert(boxes_df(spark, new, ids=np.arange(100000, 100040)))
    t.refresh_index(path)
    mutated = np.vstack([boxes[np.arange(2500) % 5 != 0], new])
    mutated_ids = np.concatenate(
        [np.arange(2500)[np.arange(2500) % 5 != 0], np.arange(100000, 100040)]
    )
    return path, boxes, mutated, mutated_ids


def test_history_and_time_travel(spark, built):
    path, boxes, mutated, mutated_ids = built
    snaps = index_snapshots(path)
    assert [s["version"] for s in snaps] == [1, 2]
    assert snaps[0]["op"] == "build" and not snaps[0]["current"]
    assert snaps[1]["op"] == "refresh" and snaps[1]["current"]
    assert snaps[1]["version"] == 2

    qboxes = rand_boxes(60, 93, ext_max=2.0)
    want_v1 = oracle_pairs(qboxes, boxes)
    want_cur = {
        (q, mutated_ids[i])
        for (q, i) in oracle_pairs(qboxes, mutated)
    }
    assert _pairs(load_index(spark, path, version=1), spark, qboxes) == want_v1
    assert _pairs(load_index(spark, path), spark, qboxes) == want_cur
    # historical version recomputes its own size (meta describes CURRENT)
    assert load_index(spark, path, version=1).size() == 2500
    assert load_index(spark, path).size() == 2000 + 40


def test_rollback_and_forward(spark, built):
    path, boxes, mutated, mutated_ids = built
    qboxes = rand_boxes(50, 94, ext_max=2.0)
    want_v1 = oracle_pairs(qboxes, boxes)
    rollback_index(path, 1)
    assert _pairs(load_index(spark, path), spark, qboxes) == want_v1
    assert [s for s in index_snapshots(path) if s["current"]][0]["version"] == 1
    # rollback is itself reversible until expired
    rollback_index(path, 2)
    want_cur = {(q, mutated_ids[i]) for (q, i) in oracle_pairs(qboxes, mutated)}
    assert _pairs(load_index(spark, path), spark, qboxes) == want_cur
    with pytest.raises(ValueError, match="no snapshot v9"):
        rollback_index(path, 9)


def test_expire_vacuums_unreferenced_files(spark, built):
    path, boxes, mutated, mutated_ids = built
    idx_dir = os.path.join(path, "index")
    n_files_before = sum(
        len(fs) for _, _, fs in os.walk(idx_dir) if fs
    )
    out = expire_index_snapshots(path, keep_last=1)
    assert out["removed_manifests"] == 1 and out["removed_files"] > 0
    snaps = index_snapshots(path)
    assert [s["version"] for s in snaps] == [2] and snaps[0]["current"]
    # expired version is gone; current still answers exactly
    with pytest.raises(ValueError, match="no snapshot v1"):
        load_index(spark, path, version=1)
    qboxes = rand_boxes(50, 95, ext_max=2.0)
    want_cur = {(q, mutated_ids[i]) for (q, i) in oracle_pairs(qboxes, mutated)}
    assert _pairs(load_index(spark, path), spark, qboxes) == want_cur
    n_files_after = sum(len(fs) for _, _, fs in os.walk(idx_dir) if fs)
    assert n_files_after < n_files_before


def test_vacated_bucket_stays_readable_in_history(spark, tmp_path):
    """Erasing every row of a region empties its buckets in CURRENT —
    without deleting any file: v1 still reads the erased rows."""
    path = str(tmp_path / "idx")
    # two clusters in opposite corners → disjoint bucket sets
    a = rand_boxes(300, 96, extent=20.0, ext_max=1.0)
    b = rand_boxes(300, 97, extent=20.0, ext_max=1.0) + 75.0
    boxes = np.vstack([a, b])
    d = boxes_df(spark, boxes)
    save_index(d, path, CFG)
    t = PRTreeTable.from_index(spark, path)
    t = t.erase(d.where(F.col("id") >= 300).select("id"))  # the far cluster
    t.refresh_index(path)
    probe = np.array([[75.0, 75.0, 95.0, 95.0]])
    assert _pairs(load_index(spark, path), spark, probe) == set()
    v1_hits = _pairs(load_index(spark, path, version=1), spark, probe)
    assert v1_hits == oracle_pairs(probe, boxes)
    # and no bucket directory was deleted to achieve it
    assert index_snapshots(path)[-1]["op"] == "refresh"


def test_save_refuses_snapshot_managed_path(spark, built):
    path, boxes, _, _ = built
    with pytest.raises(ValueError, match="snapshot-managed"):
        save_index(boxes_df(spark, boxes[:100]), path, CFG)


def test_repeated_refreshes_chain_history(spark, tmp_path):
    path = str(tmp_path / "idx")
    boxes = rand_boxes(1500, 98, ext_max=2.0)
    d = boxes_df(spark, boxes)
    save_index(d, path, CFG)
    t = PRTreeTable.from_index(spark, path)
    for k in range(3):
        t = t.insert(
            boxes_df(
                spark,
                rand_boxes(10, 99 + k, ext_max=1.0),
                ids=np.arange(200000 + 10 * k, 200010 + 10 * k),
            )
        )
        t.refresh_index(path)
    snaps = index_snapshots(path)
    assert [s["version"] for s in snaps] == [1, 2, 3, 4]
    assert [s["parent"] for s in snaps] == [None, 1, 2, 3]
    assert load_index(spark, path, version=1).size() == 1500
    assert load_index(spark, path, version=3).size() == 1520
    assert load_index(spark, path).size() == 1530


def test_compact_index(spark, tmp_path):
    """compact_index: a mutated bucket with several files rewrites to ONE
    file in a new snapshot; results identical, prior version readable,
    vacuum reclaims the superseded files."""
    import os

    import numpy as np

    from python_prtree_spark import (
        EngineConfig, Extent, PRTreeTable, compact_index, load_index, save_index,
    )
    from python_prtree_spark.sources.store import _read_manifest
    from tests.conftest import boxes_df, rand_boxes

    # level 4 -> 4 cells per bucket, spread across shuffle tasks, so the
    # build manifest itself references multiple files per bucket (the
    # many-tasks-per-bucket regime a real cluster is always in)
    cfg = EngineConfig(extent=Extent(0, 0, 100, 100), level=4)
    path = str(tmp_path / "cidx")
    boxes = rand_boxes(400, 5, ext_max=6.0)
    save_index(boxes_df(spark, boxes, "id"), path, cfg)
    # a refresh cycle also appends files into its touched buckets
    t = PRTreeTable.from_index(spark, path)
    t = t.erase(list(range(0, 5)))
    t.refresh_index(path)
    idx_dir = os.path.join(path, "index")
    from python_prtree_spark.sources.store import current_snapshot_version
    man0 = _read_manifest(idx_dir, current_snapshot_version(idx_dir))["files"]
    assert any(len(fs) > 1 for fs in man0.values())
    probes = rand_boxes(60, 6, ext_max=12.0)
    pdf = boxes_df(spark, probes, "qid")
    before_rows = {
        (r["qid"], r["id"])
        for r in load_index(spark, path).batch_query(pdf).collect()
    }
    v_pre = load_index(spark, path).version

    out = compact_index(spark, path, max_files_per_bucket=1)
    assert out["compacted_buckets"] >= 1 and out["version"] == v_pre + 1
    li = load_index(spark, path)
    assert li.version == out["version"]
    # the manifest's compacted buckets now reference exactly one file
    man = _read_manifest(idx_dir, out["version"])["files"]
    assert all(len(fs) == 1 for fs in man.values())
    after_rows = {(r["qid"], r["id"]) for r in li.batch_query(pdf).collect()}
    assert after_rows == before_rows
    # time travel to the pre-compaction version still works
    old_rows = {
        (r["qid"], r["id"])
        for r in load_index(spark, path, version=v_pre).batch_query(pdf).collect()
    }
    assert old_rows == before_rows
    # idempotent: nothing left to compact
    assert compact_index(spark, path, 1) == {
        "compacted_buckets": 0, "version": None,
    }
    # vacuum reclaims the superseded small files
    from python_prtree_spark import expire_index_snapshots
    res = expire_index_snapshots(path, keep_last=1)
    assert res["removed_files"] >= 1
    final_rows = {
        (r["qid"], r["id"])
        for r in load_index(spark, path).batch_query(pdf).collect()
    }
    assert final_rows == before_rows
