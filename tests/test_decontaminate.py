"""decontaminate: planted n-gram contamination with known counts."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark.operators.dedup import decontaminate


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def _run(spark, train, ev, **kw):
    out = decontaminate(_df(spark, train), _df(spark, ev), **kw)
    return {r["doc_id"]: (r["n_grams"], r["n_hits"]) for r in out.collect()}


def test_planted_overlap(spark):
    train = [
        (1, "the quick brown fox jumps over the lazy dog"),   # 5 grams
        (2, "completely different words here nothing shared at all ok"),
        (3, "short text"),                                    # < 5 tokens
    ]
    ev = [(100, "the quick brown fox jumps")]
    got = _run(spark, train, ev, n=5, min_hits=1)
    assert got == {1: (5, 1)}


def test_repeated_gram_counts_once(spark):
    # periodic text: 15 tokens -> 11 sliding 5-grams but only 5 DISTINCT
    train = [(7, "a b c d e " * 3)]
    ev = [(100, "a b c d e")]
    got = _run(spark, train, ev, n=5, min_hits=1)
    assert got == {7: (5, 1)}


def test_min_hits_threshold(spark):
    train = [(1, "p q r s t u v w")]  # grams: pqrst qrstu rstuv stuvw
    ev = [(100, "p q r s t u")]       # shares pqrst + qrstu = 2 hits
    assert _run(spark, train, ev, n=5, min_hits=2) == {1: (4, 2)}
    assert _run(spark, train, ev, n=5, min_hits=3) == {}


def test_whitespace_normalization(spark):
    # runs of whitespace collapse; leading/trailing trimmed
    train = [(1, "  alpha   beta\tgamma  delta epsilon ")]
    ev = [(100, "alpha beta gamma delta epsilon")]
    assert _run(spark, train, ev, n=5, min_hits=1) == {1: (1, 1)}


def test_unigram_mode(spark):
    train = [(1, "x y z")]
    ev = [(100, "z w")]
    assert _run(spark, train, ev, n=1, min_hits=1) == {1: (3, 1)}


def test_stream_equals_batch(spark, tmp_path):
    """decontaminate_stream over a real file stream == batch
    decontaminate over the same rows (modulo the window column)."""
    import datetime as dt
    import shutil

    from python_prtree_spark.streaming.decontaminate import (
        decontaminate_stream,
        eval_gram_frame,
    )

    base_ts = dt.datetime(2024, 1, 1)
    ev_rows = [(100, "the quick brown fox jumps over it"),
               (101, "pack my box with five dozen jugs")]
    train_rows = []
    for i in range(60):
        if i % 3 == 0:
            text = f"prefix{i} the quick brown fox jumps and leaves"
        elif i % 3 == 1:
            text = f"pack my box with five dozen extras t{i}"
        else:
            text = f"totally clean document number {i} with no overlap x{i}"
        train_rows.append((base_ts + dt.timedelta(hours=i % 2, minutes=i), i, text))

    pdf = pd.DataFrame(train_rows, columns=["ts", "doc_id", "text"])
    sdf = spark.createDataFrame(pdf, "ts timestamp, doc_id long, text string")
    src = str(tmp_path / "traindocs")
    sdf.write.parquet(src)

    ev_df = _df(spark, ev_rows)
    grams = eval_gram_frame(ev_df, n=5)

    stream = spark.readStream.schema(sdf.schema).parquet(src)
    q = (
        decontaminate_stream(stream, grams, n=5, min_hits=1)
        .writeStream.format("memory").queryName("decon_mem")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"])
        for r in spark.sql("SELECT * FROM decon_mem").collect()
    }
    exp = {
        r["doc_id"]: (r["n_grams"], r["n_hits"])
        for r in decontaminate(_df(spark, [(d, t) for _, d, t in train_rows]),
                               ev_df, n=5, min_hits=1).collect()
    }
    assert got == exp
    # the planted contamination is found; clean docs are not flagged
    assert all(d % 3 != 2 for d in got)
    assert len(got) == 40
    shutil.rmtree(src, ignore_errors=True)
