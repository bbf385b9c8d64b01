"""asof_join vs pandas.merge_asof (independent reference) + tolerance +
plan shape (union + one keyed window — NO join operator)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.asof import asof_join


def _mk(spark, rng, n_right=400, n_left=120, n_keys=9):
    base = dt.datetime(2026, 3, 1)
    r = pd.DataFrame({
        "id": np.arange(n_right, dtype=np.int64),
        "key": rng.integers(0, n_keys, n_right),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 100_000, n_right)],
        "val": rng.integers(0, 1000, n_right).astype(np.int64),
    })
    lf = pd.DataFrame({
        "qid": np.arange(n_left, dtype=np.int64),
        "key": rng.integers(0, n_keys, n_left),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 110_000, n_left)],
    })
    rdf = spark.createDataFrame(r, "id long, key long, ts timestamp, val long")
    ldf = spark.createDataFrame(lf, "qid long, key long, ts timestamp")
    return r, lf, rdf, ldf


def _ref(r, lf, tolerance=None):
    """pandas merge_asof with the engine's max-id tie-break: sort right by
    (ts, id) so the last row at a duplicate ts is the largest id —
    merge_asof backward takes the last qualifying row."""
    rs = r.sort_values(["ts", "id"], kind="stable")
    ls = lf.sort_values(["ts", "qid"], kind="stable")
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(
        ls, rs, on="ts", by="key", direction="backward",
        suffixes=("", "_r"), **kw,
    )
    return {
        int(row.qid): (None if pd.isna(row.id) else int(row.id))
        for row in m.itertuples()
    }


def test_asof_vs_merge_asof(spark):
    rng = np.random.default_rng(5)
    r, lf, rdf, ldf = _mk(spark, rng)
    got = {
        row["qid"]: row["id_right"]
        for row in asof_join(ldf, rdf, on="key", right_id="id",
                             right_values=["val"]).collect()
    }
    exp = _ref(r, lf)
    assert got == exp
    # at least some matched and some unmatched to make the test meaningful
    assert any(v is None for v in got.values())
    assert sum(v is not None for v in got.values()) > 80


def test_asof_tolerance_and_exact_tie(spark):
    base = dt.datetime(2026, 3, 1)
    r = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "key": [0, 0, 0, 0],
        "ts": [base, base, base + dt.timedelta(seconds=100),
               base + dt.timedelta(seconds=300)],
        "val": [10, 20, 30, 40],
    })
    lf = pd.DataFrame({
        "qid": [0, 1, 2],
        "key": [0, 0, 0],
        # probe exactly AT a duplicate right ts; between; far after
        "ts": [base, base + dt.timedelta(seconds=150),
               base + dt.timedelta(seconds=1000)],
    })
    rdf = spark.createDataFrame(r, "id long, key long, ts timestamp, val long")
    ldf = spark.createDataFrame(lf, "qid long, key long, ts timestamp")
    got = {
        row["qid"]: (row["id_right"], row["val_right"])
        for row in asof_join(ldf, rdf, on="key", right_id="id",
                             right_values=["val"]).collect()
    }
    # equal-ts duplicates -> largest id wins; <= semantics at the probe ts
    assert got[0] == (2, 20)
    assert got[1] == (3, 30)
    assert got[2] == (4, 40)
    # tolerance: 200 s cuts qid=2's 700-s-old match
    got_t = {
        row["qid"]: row["id_right"]
        for row in asof_join(ldf, rdf, on="key", right_id="id",
                             tolerance_us=200_000_000).collect()
    }
    assert got_t[0] == 2 and got_t[1] == 3 and got_t[2] is None


def test_asof_plan_no_join(spark):
    """The physical plan must be union + window — no join operator of any
    kind (that is the whole point vs a range join)."""
    from python_prtree_spark.plans.explain import explain_str

    rng = np.random.default_rng(6)
    _, _, rdf, ldf = _mk(spark, rng, 50, 20)
    plan = explain_str(asof_join(ldf, rdf, on="key", right_id="id"))
    assert "Window" in plan, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, plan
