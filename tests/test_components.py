"""Connected components over dup pairs vs a union-find oracle
(alternating star rounds — Kiveris et al. SoCC'14; convergence must not
depend on graph diameter)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: component = min reachable id
    return {x: find(x) for x in parent}


def _run(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_random_clusters(spark):
    rng = np.random.default_rng(7)
    edges = []
    # 30 clusters of random size with random internal spanning edges + noise
    base = 0
    for _ in range(30):
        size = int(rng.integers(2, 12))
        ids = base + rng.permutation(size)
        for i in range(1, size):
            edges.append((int(ids[i]), int(ids[int(rng.integers(0, i))])))
        # a few redundant intra-cluster edges
        if size > 3:
            edges.append((int(ids[0]), int(ids[size - 1])))
        base += size + int(rng.integers(1, 5))  # gaps → singletons absent
    got = _run(spark, edges)
    exp = _uf_oracle(edges)
    assert got == exp


def test_long_path_converges(spark):
    """A 200-node chain: naive min-propagation needs ~200 rounds; the
    alternating star must finish well inside max_rounds (O(log^2))."""
    edges = [(i, i + 1) for i in range(200)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_duplicate_clusters_keep_flags(spark):
    edges = [(5, 3), (3, 9), (20, 21)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    rows = {r["node"]: (r["component"], r["keep"])
            for r in duplicate_clusters(df).collect()}
    assert rows == {
        3: (3, True), 5: (3, False), 9: (3, False),
        20: (20, True), 21: (20, False),
    }


def test_empty_and_self_pairs(spark):
    df = spark.createDataFrame(pd.DataFrame({"id_a": [4], "id_b": [4]}))
    assert connected_components(df).count() == 0
