"""dbscan vs a brute-force reference (Ester et al. semantics with the
engine's deterministic min-id rules)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.cluster import dbscan

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def _ref(xy: np.ndarray, eps: float, min_pts: int):
    """Brute force: cores by self-inclusive degree; clusters = min core id
    reachable over core-core within-eps edges; border = min cluster among
    core neighbors; else noise (None)."""
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    within = d2 <= eps * eps
    deg = within.sum(1)
    is_core = deg >= min_pts
    # union-find over core-core edges, min-id roots
    parent = {i: i for i in range(n) if is_core[i]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if not is_core[i]:
            continue
        for j in range(i + 1, n):
            if is_core[j] and within[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    out = {}
    for i in range(n):
        if is_core[i]:
            out[i] = (int(deg[i]), True, find(i))
        else:
            nb = [find(j) for j in range(n)
                  if j != i and is_core[j] and within[i, j]]
            out[i] = (int(deg[i]), False, min(nb) if nb else None)
    return out


def _pts_df(spark, xy):
    pdf = pd.DataFrame({
        "id": np.arange(len(xy), dtype=np.int64),
        "x": xy[:, 0], "y": xy[:, 1],
    })
    return spark.createDataFrame(pdf, "id long, x double, y double")


@pytest.mark.parametrize("seed,eps,min_pts", [(1, 3.0, 4), (2, 5.0, 6)])
def test_dbscan_vs_brute_force(spark, seed, eps, min_pts):
    rng = np.random.default_rng(seed)
    # clusters + scattered noise
    centers = rng.uniform(10, 90, (6, 2))
    blobs = np.vstack([
        c + rng.normal(0, 1.2, (rng.integers(8, 20), 2)) for c in centers
    ])
    noise = rng.uniform(0, 100, (40, 2))
    xy = np.clip(np.vstack([blobs, noise]), 0.0, 100.0)
    got = {
        r["id"]: (r["n_within"], r["is_core"], r["cluster"])
        for r in dbscan(_pts_df(spark, xy), eps, min_pts, CFG).collect()
    }
    exp = _ref(xy, eps, min_pts)
    assert len(got) == len(xy)
    for i, e in exp.items():
        assert got[i] == e, (i, got[i], e)
    # the fixtures exercise cores + noise in both seeds, borders in seed 2
    kinds = {(v[1], v[2] is None) for v in exp.values()}
    assert (True, False) in kinds      # cores
    assert (False, True) in kinds      # noise
    if seed == 2:
        assert (False, False) in kinds  # borders (seed 1 measured to have none)


def test_dbscan_min_pts_one_and_errors(spark):
    xy = np.array([[1.0, 1.0], [50.0, 50.0]])
    got = {r["id"]: r for r in
           dbscan(_pts_df(spark, xy), 1.0, 1, CFG).collect()}
    # min_pts=1: every point is its own core cluster
    assert got[0]["is_core"] and got[0]["cluster"] == 0
    assert got[1]["is_core"] and got[1]["cluster"] == 1
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(_pts_df(spark, xy), 1.0, 0, CFG)
