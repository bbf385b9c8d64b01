"""triangle_counts vs brute enumeration."""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from python_prtree_spark.operators.graph import triangle_counts


def _df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]), "a long, b long"
    )


def _brute(edges):
    adj = {}
    und = set()
    for x, y in edges:
        if x == y:
            continue
        und.add((min(x, y), max(x, y)))
    verts = sorted({v for e in und for v in e})
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for x, y, z in combinations(verts, 3):
        if y in adj.get(x, ()) and z in adj.get(x, ()) and z in adj.get(y, ()):
            for v in (x, y, z):
                out[v] = out.get(v, 0) + 1
    return out


def _run(spark, edges):
    return {r["id"]: r["n_tri"]
            for r in triangle_counts(_df(spark, edges)).collect()}


def test_k4(spark):
    edges = [(i, j) for i, j in combinations(range(4), 2)]
    assert _run(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_path_has_none(spark):
    assert _run(spark, [(i, i + 1) for i in range(6)]) == {}


def test_duplicates_orientation_selfloops(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 3), (1, 2)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_pseudorandom_vs_brute(spark):
    edges = [((i * 7368787) % 30, (i * 15485863) % 30) for i in range(160)]
    assert _run(spark, edges) == _brute(edges)


def test_celebrity_star_plus_rim(spark):
    # hub 0 connected to all; rim is a cycle -> each rim edge closes one
    # triangle through the hub (the degree-ordering stress shape)
    n = 12
    edges = [(0, i) for i in range(1, n)] + \
            [(i, i % (n - 1) + 1) for i in range(1, n)]
    assert _run(spark, edges) == _brute(edges)
