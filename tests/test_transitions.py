"""transition_counts and frequent_pairs vs brute folds."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pandas as pd
import pytest

from python_prtree_spark.operators.freq import frequent_pairs
from python_prtree_spark.operators.funnel import transition_counts


def test_transitions_vs_brute(spark):
    rows = [(i, i % 7, float((i * 37) % 100),
             ["view", "click", "buy", "error"][(i * 3) % 4])
            for i in range(200)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"]),
        "event_id long, user_id long, ts double, event_type string",
    )
    got = {(r["src"], r["dst"]): r["n"]
           for r in transition_counts(df).collect()}
    exp = Counter()
    by_user = {}
    for eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            exp[(a, b)] += 1
    assert got == dict(exp)


def test_transitions_tie_break_deterministic(spark):
    # two events at the SAME ts: event_id order decides the chain
    rows = [(1, 1, 5.0, "a"), (2, 1, 5.0, "b"), (3, 1, 9.0, "c")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"]),
        "event_id long, user_id long, ts double, event_type string",
    )
    got = {(r["src"], r["dst"]): r["n"]
           for r in transition_counts(df).collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def _brute_pairs(rows, s):
    sets = [set(t.split()) for _, t in rows]
    cnt = Counter()
    for st in sets:
        for a, b in combinations(sorted(st), 2):
            cnt[(a, b)] += 1
    return {p: n for p, n in cnt.items() if n >= s}


def test_frequent_pairs_vs_brute(spark):
    rows = [(i, " ".join(
        f"w{(i * k) % 9}" for k in range(1, 5)
    )) for i in range(40)]
    got = {(r["t1"], r["t2"]): r["n"]
           for r in frequent_pairs(_docs(spark, rows), 3).collect()}
    assert got == _brute_pairs(rows, 3)


def test_frequent_pairs_apriori_semantics(spark):
    # "x y" together twice, but y appears in only 2 docs: with s=3 the
    # pair is out even though x alone is frequent
    rows = [(1, "x y"), (2, "x y"), (3, "x z"), (4, "x z"), (5, "x z")]
    got = {(r["t1"], r["t2"]): r["n"]
           for r in frequent_pairs(_docs(spark, rows), 3).collect()}
    assert got == _brute_pairs(rows, 3) == {("x", "z"): 3}
    with pytest.raises(ValueError, match="min_support"):
        frequent_pairs(_docs(spark, rows), 0)


def test_frequent_pairs_duplicate_tokens_once(spark):
    # repeated token in one doc counts that doc once
    rows = [(1, "p q p q p"), (2, "p q")]
    got = {(r["t1"], r["t2"]): r["n"]
           for r in frequent_pairs(_docs(spark, rows), 2).collect()}
    assert got == {("p", "q"): 2}
