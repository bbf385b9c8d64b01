"""Streaming ingest: micro-batched inserts keep the persisted index
equivalent to a bulk build over the union of all batches; watermarked
window agg matches the batch result."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent, load_index
from python_prtree_spark.streaming.ingest import (
    stream_boxes_into_index,
    windowed_event_counts,
)
from tests.conftest import boxes_df, oracle_pairs, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def test_stream_ingest_matches_bulk(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    all_boxes = rand_boxes(600, 71, ext_max=5.0)
    # drop three parquet batch files
    for i in range(3):
        sl = slice(i * 200, (i + 1) * 200)
        boxes_df(spark, all_boxes[sl], ids=np.arange(sl.start, sl.stop)) \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
    # file stream reads the directory tree of parquet files
    for i in range(3):
        for f in os.listdir(f"{src}/b{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/b{i}/{f}", f"{src}/batch{i}.parquet")
    q = stream_boxes_into_index(spark, src, idx, CFG)
    q.awaitTermination(120)
    time.sleep(0.5)

    loaded = load_index(spark, idx)
    assert loaded.size() == 600
    qboxes = rand_boxes(40, 72, ext_max=5.0)
    got = set(
        (r["qid"], r["id"])
        for r in loaded.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    )
    assert got == oracle_pairs(qboxes, all_boxes)


def test_windowed_event_counts_batch_parity(spark):
    """The streaming agg plan applied to the static events table equals a
    plain groupBy — and runs as an actual stream without error."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["window_start"], r["event_type"], r["n_events"])
        for r in windowed_event_counts(ev).collect()
    }
    from pyspark.sql import functions as F

    exp = {
        (r["ws"], r["event_type"], r["n"])
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp


def test_ingest_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch may REDELIVER a micro-batch after a failure; the sink
    must be idempotent per batch_id: re-running the same batch neither
    duplicates base rows nor corrupts query results or size()."""
    import numpy as np

    from python_prtree_spark import EngineConfig, Extent, load_index
    from python_prtree_spark.streaming.ingest import IngestSink
    from tests.conftest import boxes_df, oracle_pairs, rand_boxes

    cfg = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)
    path = str(tmp_path / "idx")
    sink = IngestSink(path, cfg)
    b0 = rand_boxes(300, 21, ext_max=4.0)
    b1 = rand_boxes(200, 22, ext_max=4.0)
    sink(boxes_df(spark, b0), 0)
    sink(boxes_df(spark, b1, ids=np.arange(1000, 1200)), 1)
    sink(boxes_df(spark, b1, ids=np.arange(1000, 1200)), 1)  # replay!
    base = spark.read.parquet(sink.base_path)
    assert base.count() == 500

    idx = load_index(spark, path)
    assert idx.size() == 500
    qboxes = rand_boxes(40, 23, ext_max=4.0)
    pairs = [
        (r["qid"], r["id"])
        for r in idx.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    ]
    assert len(pairs) == len(set(pairs))
    all_boxes = np.vstack([b0, b1])
    all_ids = np.concatenate([np.arange(300), np.arange(1000, 1200)])
    exp = {(q, int(all_ids[d])) for (q, d) in oracle_pairs(qboxes, all_boxes)}
    assert set(pairs) == exp


def test_ingest_snapshot_retention_bounds_history(spark, tmp_path):
    """An unbounded stream must not accumulate manifests + superseded
    files forever: with snapshot_retention=2 the sink expires after each
    refresh, keeping history bounded while queries stay exact."""
    import numpy as np

    from python_prtree_spark import index_snapshots, load_index
    from python_prtree_spark.streaming.ingest import IngestSink
    from tests.conftest import boxes_df, oracle_pairs, rand_boxes

    cfg = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)
    path = str(tmp_path / "idx")
    sink = IngestSink(path, cfg, snapshot_retention=2)
    chunks = [rand_boxes(150, 31 + i, ext_max=4.0) for i in range(4)]
    for i, ch in enumerate(chunks):
        sink(boxes_df(spark, ch, ids=np.arange(i * 1000, i * 1000 + 150)), i)
    snaps = index_snapshots(path)
    assert len(snaps) <= 2  # retention enforced every batch
    assert snaps[-1]["current"]
    idx = load_index(spark, path)
    assert idx.size() == 600
    all_boxes = np.vstack(chunks)
    ids = np.concatenate([np.arange(i * 1000, i * 1000 + 150) for i in range(4)])
    qboxes = rand_boxes(40, 44, ext_max=4.0)
    got = {
        (r["qid"], r["id"])
        for r in idx.batch_query(boxes_df(spark, qboxes, "qid")).collect()
    }
    assert got == {(q, ids[i]) for (q, i) in oracle_pairs(qboxes, all_boxes)}


def test_st_cube_stream_equals_batch(spark, tmp_path):
    """st_cube_stream over an actual file stream == batch st_cube on the
    same rows (window '1 hour' <-> window_sec 3600), and the plan runs as
    a real streaming query with a memory sink."""
    import shutil

    from pyspark.sql import functions as F

    from python_prtree_spark.operators.stcube import st_cube
    from python_prtree_spark.streaming.stcube import st_cube_stream

    src = str(tmp_path / "ev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    u = F.col("user_id")
    g = ev.select(
        "ts", "value",
        (((u * 941083987) % 360000).cast("double") / 1000.0 - 180.0).alias("lng"),
        (((u * 824633721) % 166000).cast("double") / 1000.0 - 83.0).alias("lat"),
    )
    g.write.parquet(src)

    stream = spark.readStream.schema(g.schema).parquet(src)
    q = (
        st_cube_stream(stream, zoom=6, window="1 hour")
        .writeStream.format("memory").queryName("stcube_mem")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["t_bucket"], r["tx"], r["ty"]): (r["tile_id"], r["n_events"], r["sum_value_q"])
        for r in spark.sql("SELECT * FROM stcube_mem").collect()
    }
    exp = {
        (r["t_bucket"], r["tx"], r["ty"]): (r["tile_id"], r["n_events"], r["sum_value_q"])
        for r in st_cube(g, zoom=6, window_sec=3600).collect()
    }
    assert got == exp and len(got) > 50
    shutil.rmtree(src, ignore_errors=True)
