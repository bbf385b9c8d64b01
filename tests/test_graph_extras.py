"""clustering_coefficient and bfs_hops vs brute graph algorithms."""

from __future__ import annotations

from collections import deque
from itertools import combinations

import pandas as pd
import pytest

from python_prtree_spark.operators.graph import bfs_hops, clustering_coefficient


def _edges_df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]), "a long, b long"
    )


def _ids_df(spark, ids):
    return spark.createDataFrame(pd.DataFrame({"id": ids}), "id long")


def _adj(edges):
    adj = {}
    for x, y in edges:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    return adj


def _brute_cc(edges):
    adj = _adj(edges)
    out = {}
    for v, ns in adj.items():
        d = len(ns)
        tri = sum(1 for p, q in combinations(sorted(ns), 2) if q in adj[p])
        out[v] = (d, tri, d * (d - 1) // 2)
    return out


def _brute_bfs(edges, sources):
    adj = _adj(edges)
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)
    return dist


def test_cc_triangle_plus_tail(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = {r["id"]: (r["degree"], r["n_tri"], r["n_wedges"])
           for r in clustering_coefficient(_edges_df(spark, edges)).collect()}
    assert got == _brute_cc(edges)
    assert got[3] == (3, 1, 3)    # cc = 1/3
    assert got[4] == (1, 0, 0)    # leaf: zero wedges, still present


def test_cc_pseudorandom(spark):
    edges = [((i * 7368787) % 25, (i * 15485863) % 25) for i in range(120)
             if (i * 7368787) % 25 != (i * 15485863) % 25]
    got = {r["id"]: (r["degree"], r["n_tri"], r["n_wedges"])
           for r in clustering_coefficient(_edges_df(spark, edges)).collect()}
    assert got == _brute_cc(edges)


def test_bfs_multi_source_min(spark):
    # path 0-1-2-3-4-5 with sources at both ends -> hops = min distance
    edges = [(i, i + 1) for i in range(5)]
    got = {r["id"]: r["hops"]
           for r in bfs_hops(_edges_df(spark, edges),
                             _ids_df(spark, [0, 5])).collect()}
    assert got == _brute_bfs(edges, [0, 5])
    assert got[2] == 2 and got[3] == 2


def test_bfs_unreachable_absent(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    got = {r["id"]: r["hops"]
           for r in bfs_hops(_edges_df(spark, edges),
                             _ids_df(spark, [1])).collect()}
    assert got == _brute_bfs(edges, [1])
    assert 10 not in got and 11 not in got


def test_bfs_pseudorandom(spark):
    edges = [((i * 2654435761) % 40, (i * 2246822519) % 40)
             for i in range(120)
             if (i * 2654435761) % 40 != (i * 2246822519) % 40]
    srcs = [0, 7]
    got = {r["id"]: r["hops"]
           for r in bfs_hops(_edges_df(spark, edges),
                             _ids_df(spark, srcs)).collect()}
    assert got == _brute_bfs(edges, srcs)


def test_bfs_round_limit_raises(spark):
    edges = [(i, i + 1) for i in range(10)]
    with pytest.raises(RuntimeError, match="converge"):
        bfs_hops(_edges_df(spark, edges), _ids_df(spark, [0]), max_rounds=3)
