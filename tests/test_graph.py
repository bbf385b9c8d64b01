"""Fixed-point PageRank vs a pure-Python integer reference."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark.operators.graph import SCALE, pagerank


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]), "src long, dst long"
    )


def _py_pagerank(pairs, n_iter, d_num=85, d_den=100):
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    deg = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    init = SCALE // n
    base = ((d_den - d_num) * init) // d_den
    score = {v: init for v in nodes}
    for _ in range(n_iter):
        infl = {v: 0 for v in nodes}
        for s, d in pairs:
            infl[d] += score[s] // deg[s]
        score = {v: base + (d_num * infl[v]) // d_den for v in nodes}
    return score


@pytest.mark.parametrize("n_iter", [1, 3, 5])
def test_pagerank_matches_python_reference(spark, n_iter):
    import numpy as np

    rng = np.random.default_rng(21)
    pairs = [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, 20, 60), rng.integers(0, 20, 60))
    ]
    got = {
        r["node"]: r["score_q"]
        for r in pagerank(_edges_df(spark, pairs), n_iter=n_iter).collect()
    }
    assert got == _py_pagerank(pairs, n_iter)


def test_pagerank_cycle_is_uniform(spark):
    """On a directed cycle every node has one in/out edge — scores stay
    exactly uniform at every iteration."""
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    got = [r["score_q"] for r in pagerank(_edges_df(spark, pairs), 4).collect()]
    assert len(set(got)) == 1


def test_pagerank_authority_ordering_and_sink(spark):
    """A node every other node links to outranks the rest; a sink node
    (no out-edges) still accrues in-mass but forwards none."""
    # 0..3 all link to 4 (the authority); 4 links nowhere (sink);
    # 0..3 also chain 0->1->2->3->0 so they have deg 2 each.
    pairs = [(i, 4) for i in range(4)] + [(i, (i + 1) % 4) for i in range(4)]
    got = {
        r["node"]: r["score_q"]
        for r in pagerank(_edges_df(spark, pairs), 3).collect()
    }
    assert got[4] == max(got.values())
    assert all(got[4] > got[i] for i in range(4))
    assert got == _py_pagerank(pairs, 3)  # sink semantics match exactly


def test_pagerank_rejects_bad_params(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, d_num=100, d_den=100)
