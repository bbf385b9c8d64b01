"""Sessionization: batch window form vs a pandas oracle, and the stateful
streaming twin (applyInPandasWithState) vs the batch form — closed sessions
from an event-time-ordered stream must equal batch sessions minus each
user's final (still-open) session."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_prtree_spark.streaming.sessions import sessionize_batch, sessionize_stream

GAP_MIN = 30


def _events_pdf(n=600, users=12, seed=5):
    rng = np.random.default_rng(seed)
    # bursty arrivals: mixture of short intra-session gaps and long breaks
    gaps = np.where(
        rng.random(n) < 0.15,
        rng.integers(GAP_MIN * 60 + 1, GAP_MIN * 120, n),  # session break
        rng.integers(1, GAP_MIN * 30, n),                  # intra-session (secs)
    )
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.cumsum(gaps), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n),
        "ts": ts,
        "user_id": rng.integers(0, users, n),
        "value": np.round(rng.random(n) * 20, 2),
    })


def _oracle_sessions(pdf):
    out = []
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        us = g["ts"].astype("int64").to_numpy()  # ns
        vq = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        sidx = 0
        sessions = []
        for i in range(len(g)):
            if i == 0 or (us[i] - us[i - 1]) // 1000 > GAP_MIN * 60 * 1_000_000:
                sidx += 1
                sessions.append([uid, sidx, us[i] // 1000, us[i] // 1000, 1, int(vq[i])])
            else:
                s = sessions[-1]
                s[3] = us[i] // 1000
                s[4] += 1
                s[5] += int(vq[i])
        out += [tuple(s) for s in sessions]
    return set(out)


def test_batch_sessionize_oracle(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = {
        (r["user_id"], r["session_idx"], r["start_us"], r["end_us"],
         r["n_events"], r["sum_value_x100"])
        for r in sessionize_batch(df, GAP_MIN).collect()
    }
    assert got == _oracle_sessions(pdf)


def test_stream_equals_batch_minus_open(spark, tmp_path):
    pdf = _events_pdf(n=400, users=8, seed=9)
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    src = str(tmp_path / "events_in")
    os.makedirs(src)
    # three time-ordered files → event-time-ordered micro-batches
    for i, lo in enumerate(range(0, len(pdf), 140)):
        spark.createDataFrame(pdf.iloc[lo:lo + 140]).coalesce(1).write.parquet(
            f"{src}/t={i:02d}"
        )
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/t=*")
    )
    out_rows = []
    q = (
        sessionize_stream(stream, GAP_MIN)
        .writeStream.foreachBatch(lambda b, _i: out_rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_idx"], r["start_us"], r["end_us"],
         r["n_events"], r["sum_value_x100"])
        for r in out_rows
    }
    batch = sessionize_batch(spark.createDataFrame(pdf), GAP_MIN)
    w_last = F.max("session_idx").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("user_id")
    )
    closed = {
        (r["user_id"], r["session_idx"], r["start_us"], r["end_us"],
         r["n_events"], r["sum_value_x100"])
        for r in batch.withColumn("_last", w_last)
        .where(F.col("session_idx") < F.col("_last")).drop("_last").collect()
    }
    assert got == closed
    assert len(got) > 10  # non-vacuous
