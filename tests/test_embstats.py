"""embedding_stats vs a brute per-vector fold."""

from __future__ import annotations

import math

import pandas as pd

from python_prtree_spark.operators.ann import embedding_stats


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<float>",
    )


def _f32(x):
    import numpy as np
    return float(np.float32(x))


def _brute(rows):
    out = {}
    for vid, vec in rows:
        vec = [_f32(v) for v in vec]
        fin = [v for v in vec if math.isfinite(v)]
        norm2 = sum(math.floor(v * v * 1e6) for v in fin)
        max_abs = max((math.floor(abs(v) * 1e6) for v in fin), default=0)
        n_nf = sum(1 for v in vec if not math.isfinite(v))
        keep = int(len(vec) > 0 and n_nf == 0 and norm2 > 0)
        out[vid] = (len(vec), sum(1 for v in vec if v == 0.0), n_nf,
                    norm2, max_abs, keep)
    return out


def _run(spark, rows):
    res = embedding_stats(_df(spark, rows))
    return {r["vec_id"]: (r["dim"], r["n_zero"], r["n_nonfinite"],
                          r["norm2_fp"], r["max_abs_fp"], r["keep"])
            for r in res.collect()}


def test_vs_brute(spark):
    rows = [(i, [((i * 7 + j * 3) % 13 - 6) / 4.0 for j in range(8)])
            for i in range(20)]
    assert _run(spark, rows) == _brute(rows)


def test_degenerate_vectors_flagged(spark):
    rows = [
        (1, [0.5, -0.25, 0.125]),          # healthy
        (2, [0.0, 0.0, 0.0]),              # zero norm
        (3, [1.0, float("nan"), 2.0]),     # NaN
        (4, [float("inf"), 1.0, 1.0]),     # Inf
        (5, []),                           # empty
    ]
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert got[1][5] == 1
    assert [got[i][5] for i in (2, 3, 4, 5)] == [0, 0, 0, 0]
    assert got[3][2] == 1 and got[4][2] == 1
    assert got[5][0] == 0


def test_quantization_is_per_term(spark):
    # 0.1f^2 * 1e6 floors per TERM: three identical entries -> 3x floor,
    # not floor(3x) — the order-free integer-sum contract
    rows = [(9, [0.1, 0.1, 0.1])]
    got = _run(spark, rows)
    assert got == _brute(rows)
    v = _f32(0.1)
    assert got[9][3] == 3 * math.floor(v * v * 1e6)
