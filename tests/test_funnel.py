"""funnel: ordered-prefix semantics, horizon cut, non-strict timestamps,
and the stalled-prefix rule (missing step k blocks step k+1)."""

from __future__ import annotations

import datetime as dt

import pytest

from python_prtree_spark.operators.funnel import funnel

B = dt.datetime(2026, 5, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, B + dt.timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_semantics(spark):
    rows = [
        # u1: full funnel in order
        (1, 0, "view"), (1, 10, "click"), (1, 20, "buy"),
        # u2: click BEFORE the first view -> stalls at 1
        (2, 10, "click"), (2, 20, "view"),
        # u3: skips click but has buy -> must stall at 1 (no step-skipping)
        (3, 0, "view"), (3, 50, "buy"),
        # u4: completes but step 3 beyond horizon (100 s) -> n=2
        (4, 0, "view"), (4, 10, "click"), (4, 200, "buy"),
        # u5: never views -> absent
        (5, 0, "click"), (5, 1, "buy"),
        # u6: step 2 at EXACTLY t1 (non-strict) and step 3 at exactly
        #     t1 + horizon -> n=3
        (6, 0, "view"), (6, 0, "click"), (6, 100, "buy"),
        # u7: second view would start a later funnel, but the anchor is
        #     the FIRST view; click after first view counts
        (7, 0, "view"), (7, 90, "view"), (7, 95, "click"),
    ]
    out = {
        r["user_id"]: (r["n_steps"], r["t1_us"], r["t_last_us"])
        for r in funnel(_df(spark, rows), ["view", "click", "buy"], 100).collect()
    }
    us = lambda s: int((B + dt.timedelta(seconds=s)
                        ).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert set(out) == {1, 2, 3, 4, 6, 7}
    assert out[1] == (3, us(0), us(20))
    assert out[2] == (1, us(20), us(20))
    assert out[3] == (1, us(0), us(0))
    assert out[4] == (2, us(0), us(10))
    assert out[6] == (3, us(0), us(100))
    assert out[7] == (2, us(0), us(95))
    with pytest.raises(ValueError, match="at least 2"):
        funnel(_df(spark, rows), ["view"], 100)
    with pytest.raises(ValueError, match="horizon"):
        funnel(_df(spark, rows), ["view", "click"], 0)
