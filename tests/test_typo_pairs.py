"""typo_pairs vs brute Levenshtein over the vocabulary."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark.operators.dedup import typo_pairs


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def _brute(strings):
    v = sorted(set(s for s in strings if s))
    return {(a, b) for i, a in enumerate(v) for b in v[i + 1:]
            if _lev(a, b) <= 1}


def _run(spark, strings):
    df = spark.createDataFrame(
        pd.DataFrame({"text": strings}), "text string"
    )
    return {(r["tok_a"], r["tok_b"]) for r in typo_pairs(df).collect()}


def test_sub_ins_del_found_d2_not(spark):
    strings = ["color", "colour", "colon", "dolor", "colors", "veritas"]
    got = _run(spark, strings)
    assert got == _brute(strings)
    assert ("color", "colors") in got       # insertion
    assert ("color", "dolor") in got        # substitution
    assert ("colon", "color") in got        # substitution
    assert ("color", "colour") in got       # insertion (u)
    assert not any("veritas" in p for p in got)
    assert ("colon", "colour") not in got   # distance 2


def test_duplicates_and_empties_ignored(spark):
    strings = ["ab", "ab", "", "b", None, "ab"]
    got = _run(spark, [s for s in strings])
    assert got == {("ab", "b")}


def test_single_chars(spark):
    # all single characters are pairwise distance 1 (substitution)
    strings = ["a", "b", "c"]
    assert _run(spark, strings) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_numeric_id_style(spark):
    strings = [f"id#00{i}" for i in (11, 12, 21, 99)]
    got = _run(spark, strings)
    assert got == _brute(strings)
    assert ("id#0011", "id#0012") in got
    assert ("id#0011", "id#0021") in got
    assert ("id#0012", "id#0099") not in got
