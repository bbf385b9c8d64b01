"""heavy_hitters: exact two-phase frequent items vs a Counter oracle."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from python_prtree_spark.operators.freq import heavy_hitters


def _docs(spark, texts, n_partitions=8):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf, "doc_id long, text string").repartition(
        n_partitions
    )


def _oracle(texts, threshold):
    cnt = Counter()
    for t in texts:
        cnt.update(t.strip().split())
    return {tok: n for tok, n in cnt.items() if n >= threshold}


@pytest.mark.parametrize("threshold", [2, 5, 40])
def test_heavy_hitters_exact(spark, threshold):
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    # zipf-ish skew: low ids sampled far more often
    texts = [
        " ".join(vocab[min(int(rng.zipf(1.3)) - 1, 199)] for _ in range(30))
        for _ in range(120)
    ]
    got = {
        r["token"]: r["n"] for r in heavy_hitters(_docs(spark, texts), threshold).collect()
    }
    assert got == _oracle(texts, threshold)


def test_heavy_hitters_threshold_one_is_full_vocab(spark):
    texts = ["a b b c", "c d"]
    got = {r["token"]: r["n"] for r in heavy_hitters(_docs(spark, texts, 3), 1).collect()}
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_heavy_hitters_spread_across_partitions(spark):
    """A token below ceil(T/P) in EVERY partition must still be found —
    each of 8 partitions holds it a few times; global count crosses T."""
    texts = [f"filler{i} spread spread" for i in range(64)]
    got = {r["token"]: r["n"] for r in heavy_hitters(_docs(spark, texts), 128).collect()}
    assert got == {"spread": 128}


def test_heavy_hitters_rejects_bad_threshold(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_docs(spark, ["x"]), 0)


def _nearest_rank(values, qm):
    sv = sorted(values)
    target = (len(sv) * qm + 999) // 1000
    return sv[target - 1]


@pytest.mark.parametrize("seed", [1, 9])
def test_group_quantiles_exact_nearest_rank(spark, seed):
    import numpy as np

    from python_prtree_spark.operators.freq import group_quantiles

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "g": rng.integers(0, 4, 800),
        "v": rng.integers(0, 60, 800),
    })
    out = group_quantiles(
        spark.createDataFrame(pdf), "g", "v", [0.5, 0.9, 1.0]
    ).toPandas().set_index("g")
    for g, sub in pdf.groupby("g"):
        row = out.loc[g]
        assert row["n"] == len(sub)
        for q, qm in [(0.5, 500), (0.9, 900), (1.0, 1000)]:
            assert row[f"q_{qm}"] == _nearest_rank(sub["v"], qm), (g, q)
        # q=1.0 is the exact max
        assert row["q_1000"] == sub["v"].max()


def test_group_quantiles_ties_and_single_value(spark):
    from python_prtree_spark.operators.freq import group_quantiles

    pdf = pd.DataFrame({
        "g": ["a"] * 5 + ["b"],
        "v": [7, 7, 7, 7, 7, 3],
    })
    out = group_quantiles(
        spark.createDataFrame(pdf), "g", "v", [0.5]
    ).toPandas().set_index("g")
    assert out.loc["a"]["q_500"] == 7 and out.loc["a"]["n"] == 5
    assert out.loc["b"]["q_500"] == 3 and out.loc["b"]["n"] == 1


def test_group_quantiles_rejects_bad_qs(spark):
    from python_prtree_spark.operators.freq import group_quantiles

    df = spark.createDataFrame(pd.DataFrame({"g": [1], "v": [1]}))
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [0.0])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [1.5])


def test_token_drift_matches_python_kl(spark):
    import math

    from python_prtree_spark.functions.text import token_drift

    texts_a = ["apple apple banana", "apple cherry", "apple banana"]
    texts_b = ["banana cherry", "cherry date", "date date cherry"]
    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": texts_a + texts_b,
        "is_a": [True] * 3 + [False] * 3,
    })
    got = token_drift(
        spark.createDataFrame(pdf), "is_a", k=10
    ).toPandas().set_index("token")

    ca = Counter(" ".join(texts_a).split())
    cb = Counter(" ".join(texts_b).split())
    vocab = sorted(set(ca) | set(cb))
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    exp = {}
    for t in vocab:
        p = (ca.get(t, 0) + 1.0) / (na + v)
        q = (cb.get(t, 0) + 1.0) / (nb + v)
        exp[t] = (ca.get(t, 0), cb.get(t, 0),
                  math.floor(p * math.log(p / q) * 1e12))
    assert set(got.index) == set(vocab)  # k=10 > vocab: all tokens emitted
    for t in vocab:
        row = got.loc[t]
        assert (row["cnt_a"], row["cnt_b"], row["kl_q"]) == exp[t], t
    # 'apple' is A-enriched (positive contribution), 'date' depleted
    assert got.loc["apple"]["kl_q"] > 0
    assert got.loc["date"]["kl_q"] < 0


def test_token_drift_topk_boundary_deterministic(spark):
    from python_prtree_spark.functions.text import token_drift

    # A-enriched tokens carry larger |c| than B-enriched ones (p·ln(p/q)
    # is asymmetric: (2/6)·ln2 > (1/6)·ln2), so the A pair {aa, zz} fills
    # k=2 — and the selection is deterministic across runs.
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["zz aa", "mm qq"],
        "is_a": [True, False],
    })
    out = token_drift(spark.createDataFrame(pdf), "is_a", k=2).toPandas()
    assert len(out) == 2
    assert sorted(out["token"]) == ["aa", "zz"]
    out2 = token_drift(spark.createDataFrame(pdf), "is_a", k=2).toPandas()
    assert sorted(out2["token"]) == ["aa", "zz"]


def test_token_drift_rejects_bad_k(spark):
    from python_prtree_spark.functions.text import token_drift

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["x"], "is_a": [True]}))
    with pytest.raises(ValueError):
        token_drift(df, "is_a", k=0)


def test_group_quantiles_ignores_null_values(spark):
    from python_prtree_spark.operators.freq import group_quantiles

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", None)], "g string, v long")
    out = group_quantiles(df, "g", "v", [0.5, 1.0]).toPandas().set_index("g")
    assert out.loc["a"]["n"] == 2
    assert out.loc["a"]["q_500"] == 1 and out.loc["a"]["q_1000"] == 3


def test_group_quantiles_rejects_fractional_column(spark):
    from python_prtree_spark.operators.freq import group_quantiles

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"], "v": [2.9]}))  # double column
    with pytest.raises(ValueError, match="quantile_sketch"):
        group_quantiles(df, "g", "v", [0.5])


def test_heavy_hitters_stream_equals_batch(spark, tmp_path):
    """heavy_hitters_stream over an actual file stream == the same
    windowed aggregate in batch over the same rows, and the plan runs as
    a real streaming query with a memory sink."""
    import datetime as dt
    import shutil

    from python_prtree_spark.streaming.freq import heavy_hitters_stream

    src = str(tmp_path / "docs")
    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(200):
        # token w<i%7> trends in hour i%3
        rows.append((base + dt.timedelta(hours=i % 3, minutes=i % 50),
                     f"w{i % 7} w{i % 7} filler{i}"))
    pdf = pd.DataFrame(rows, columns=["ts", "text"])
    sdf = spark.createDataFrame(pdf, "ts timestamp, text string")
    sdf.write.parquet(src)

    stream = spark.readStream.schema(sdf.schema).parquet(src)
    q = (
        heavy_hitters_stream(stream, threshold=5, window="1 hour")
        .writeStream.format("memory").queryName("hh_mem")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["t_bucket"], r["token"]): r["n"]
        for r in spark.sql("SELECT * FROM hh_mem").collect()
    }
    exp = {
        (r["t_bucket"], r["token"]): r["n"]
        for r in heavy_hitters_stream(sdf, threshold=5, window="1 hour").collect()
    }
    assert got == exp and len(got) > 5
    # every emitted count clears the threshold; fillers never trend
    assert all(n >= 5 for n in got.values())
    assert not any(t.startswith("filler") for _, t in got)
    shutil.rmtree(src, ignore_errors=True)
