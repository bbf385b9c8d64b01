"""repetition_stats: hand-counted Gopher-rule numerators."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark.functions.text import repetition_stats


def _run(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    return {
        r["doc_id"]: (r["n_words"], r["top_word"], r["n_2grams"],
                      r["top2"], r["n_3grams"], r["top3"])
        for r in repetition_stats(df).collect()
    }


def test_hand_counts(spark):
    got = _run(spark, [
        (1, "a a a b"),
        (2, "a b a b a b"),
        (3, "x"),
        (4, "p q"),
    ])
    # doc 1: words 4/top 3; 2-grams {'a a':2,'a b':1} = 3/2;
    #        3-grams {'a a a':1,'a a b':1} = 2/1
    assert got[1] == (4, 3, 3, 2, 2, 1)
    # doc 2: words 6/top 3; 2-grams {'a b':3,'b a':2} = 5/3;
    #        3-grams {'a b a':2,'b a b':2} = 4/2
    assert got[2] == (6, 3, 5, 3, 4, 2)
    # doc 3: single token -> no 2-/3-grams, zeros kept
    assert got[3] == (1, 1, 0, 0, 0, 0)
    # doc 4: exactly one 2-gram, no 3-gram
    assert got[4] == (2, 1, 1, 1, 0, 0)


def test_whitespace_runs(spark):
    got = _run(spark, [(9, "  u   v \t u  ")])
    assert got[9] == (3, 2, 2, 1, 1, 1)


def _interleaved_dominant():
    fills = iter(f"u{i}" for i in range(17))
    toks = []
    for s in (3, 3, 3, 2, 2, 2, 2):
        toks.append("dom")
        toks.extend(next(fills) for _ in range(s))
    return " ".join(toks)


def test_gopher_filter_flags(spark):
    from python_prtree_spark.functions.text import gopher_filter

    rows = [
        # 24 distinct-ish words, no repetition -> keep
        (1, " ".join(f"w{i}" for i in range(24))),
        # short -> flag_len
        (2, "only five words right here"),
        # 24 words, one word dominates (7/24 > 1/10) but never adjacent
        # (so no 2-gram repeats) -> flag_word_rep ONLY
        (3, _interleaved_dominant()),
        # 2-gram "a b" repeated: frac > 1/20 -> flag_2gram (word 'a'
        # also dominates, so flag_word_rep fires too)
        (4, " ".join(["a b"] * 6 + [f"v{i}" for i in range(12)])),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["flag_len"], r["flag_word_rep"], r["flag_2gram"],
                      r["flag_3gram"], r["keep"])
        for r in gopher_filter(df).collect()
    }
    assert got[1] == (0, 0, 0, 0, 1)
    assert got[2][0] == 1 and got[2][4] == 0
    assert got[3] == (0, 1, 0, 0, 0)
    assert got[4][2] == 1 and got[4][4] == 0


def test_degenerate_repetition_is_visible(spark):
    # the pathological "same 2-gram forever" doc the Gopher rule kills:
    # top2 / n_2grams -> 1 as length grows
    got = _run(spark, [(5, "z z z z z z z z")])
    n_words, top_word, n2, top2, n3, top3 = got[5]
    assert (n_words, top_word) == (8, 8)
    assert n2 == top2 == 7
    assert n3 == top3 == 6
