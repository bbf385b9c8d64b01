"""cusum_stream ≡ batch cusum_alarms contract + state boundedness."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from python_prtree_spark.operators.evalstats import cusum_alarms
from python_prtree_spark.streaming.cusum import cusum_stream

REF, THR = 500, 1500


def _pdf(seed=19, n=300, users=6):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.normal(5.0, 2.0, n), 2)
    vals[n // 2:] += (rng.integers(0, users, n)[n // 2:] == 2) * 3.0
    return pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.cumsum(rng.integers(1, 500, n)), unit="s"),
        "user_id": rng.integers(0, users, n),
        "value": vals,
    }).sort_values(["ts", "event_id"]).reset_index(drop=True)


def _batch_final(spark, pdf):
    """Fold the batch chart to its per-user final row (n, s, max, alarms)."""
    chart = cusum_alarms(
        spark.createDataFrame(pdf), "user_id", "tus", "value",
        ref_fp=REF, threshold_fp=THR, scale=100,
    ).toPandas()
    out = {}
    for u, sub in chart.groupby("user_id"):
        sub = sub.sort_values(["tus", "v_fp"])
        out[int(u)] = (
            len(sub), int(sub["s_fp"].iloc[-1]),
            int(sub["s_fp"].max()), int(sub["alarm"].sum()),
        )
    return out


def test_cusum_stream_equals_batch(spark, tmp_path):
    pdf = _pdf()
    src = str(tmp_path / "ev_in")
    os.makedirs(src)
    for i, lo in enumerate(range(0, len(pdf), 100)):
        spark.createDataFrame(pdf.iloc[lo:lo + 100]).coalesce(1).write.parquet(
            f"{src}/t={i:02d}"
        )
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/t=*")
    )
    emitted = []
    q = (
        cusum_stream(stream, ref_fp=REF, threshold_fp=THR, scale=100)
        .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    last = {}
    for r in emitted:  # foreachBatch order = micro-batch order
        last[int(r["user_id"])] = (
            int(r["n"]), int(r["s_fp"]), int(r["max_s_fp"]), int(r["n_alarms"])
        )
    # batch twin over the same rows, ts as integer micros (order is all
    # that matters and micros match the stream's unix_micros exactly)
    bpdf = pdf.drop(columns=["ts"]).assign(tus=pdf["ts"].astype("int64") // 1000)
    batch = _batch_final(spark, bpdf)
    assert last == batch
    assert len(emitted) > len(last)  # cumulative rows across micro-batches
    # the planted-drift user actually alarmed
    assert any(v[3] > 0 for v in last.values())
