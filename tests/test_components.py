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


def _run(spark, edges, cap=None):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    kw = {} if cap is None else {"small_graph_cap": cap}
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


# cap=None exercises the small-graph driver union-find gate (these test
# graphs are all under the cap); cap=0 forces the distributed
# alternating-star loop on the same inputs so both code paths stay green
@pytest.mark.parametrize("cap", [None, 0])
def test_random_clusters(spark, cap):
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
    got = _run(spark, edges, cap)
    exp = _uf_oracle(edges)
    assert got == exp


@pytest.mark.parametrize("cap", [None, 0])
def test_long_path_converges(spark, cap):
    """A 200-node chain: naive min-propagation needs ~200 rounds; the
    alternating star must finish well inside max_rounds (O(log^2))."""
    edges = [(i, i + 1) for i in range(200)]
    got = _run(spark, edges, cap)
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


@pytest.mark.parametrize("cap", [None, 0])
def test_empty_and_self_pairs(spark, cap):
    df = spark.createDataFrame(pd.DataFrame({"id_a": [4], "id_b": [4]}))
    assert connected_components(df, small_graph_cap=cap or 50_000).count() == 0
    assert connected_components(df, small_graph_cap=0).count() == 0
