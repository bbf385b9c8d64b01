"""semantic_dedup (SemDeDup, Abbas et al. 2023) — exact single-cluster
config vs brute force, triangle-of-blocks correctness, and multi-cluster
invariants (every drop is justified by a real within-cluster neighbor)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.semdedup import semantic_dedup


def corpus_df(spark, vecs):
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs],
    })
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def brute(vecs, threshold, scale=10_000):
    qv = np.floor(np.asarray(vecs) * scale + 0.5).astype(np.int64)
    n2 = (qv * qv).sum(axis=1).astype(np.float64)
    out = {}
    for b in range(len(vecs)):
        smaller = []
        for a in range(b):
            sim = float(qv[a] @ qv[b]) / np.sqrt(n2[a] * n2[b])
            if sim >= threshold:
                smaller.append(a)
        out[b] = (min(smaller) if smaller else None, len(smaller))
    return out


def make_vecs(seed, n=120, dim=16, n_dup_groups=8):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    # plant near-duplicate groups: base + tiny noise
    for g in range(n_dup_groups):
        base = vecs[g * 3]
        vecs[g * 3 + 1] = base + rng.standard_normal(dim) * 0.01
        vecs[g * 3 + 2] = base + rng.standard_normal(dim) * 0.01
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True)


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_single_cluster_exact(spark, n_blocks):
    vecs = make_vecs(7)
    exp = brute(vecs, 0.98)
    got = {
        r["vec_id"]: (r["dup_of"], r["n_dups"], r["keep"], r["cluster_id"])
        for r in semantic_dedup(
            corpus_df(spark, vecs), threshold=0.98, n_clusters=1,
            n_blocks=n_blocks,
        ).collect()
    }
    assert len(got) == len(vecs)
    for b, (dup_of, n_dups) in exp.items():
        g_dup, g_n, g_keep, g_cl = got[b]
        assert g_cl == 0
        assert (g_dup, g_n) == (dup_of, n_dups)
        assert g_keep == (dup_of is None)
    # the planted groups actually produced drops
    assert sum(1 for v in got.values() if not v[2]) >= 8


def test_multi_cluster_invariants(spark):
    """n_clusters > 1: the result is SemDeDup's approximation — drops may
    only MISS cross-cluster pairs, never invent them. Every reported
    (dup_of -> vec_id) pair must be a real above-threshold pair, share a
    cluster, and the single-cluster run must also report it."""
    vecs = make_vecs(11, n=150)
    t = 0.98
    exact = {
        r["vec_id"]: r for r in semantic_dedup(
            corpus_df(spark, vecs), threshold=t, n_clusters=1).collect()
    }
    rows = semantic_dedup(
        corpus_df(spark, vecs), threshold=t, n_clusters=5, sample_size=150,
    ).collect()
    assert len(rows) == len(vecs)
    by_id = {r["vec_id"]: r for r in rows}
    qv = np.floor(vecs * 10_000 + 0.5).astype(np.int64)
    n2 = (qv * qv).sum(axis=1).astype(np.float64)
    for r in rows:
        if r["dup_of"] is not None:
            a, b = r["dup_of"], r["vec_id"]
            assert a < b
            sim = float(qv[a] @ qv[b]) / np.sqrt(n2[a] * n2[b])
            assert sim >= t
            assert by_id[a]["cluster_id"] == r["cluster_id"]
            # a within-cluster drop implies the exact run also drops it
            assert not exact[b]["keep"]
    # planted duplicates are metrically tight, so spherical k-means puts
    # each group in one cluster and recall on planted groups stays 1
    dropped = {r["vec_id"] for r in rows if not r["keep"]}
    exact_dropped = {v for v, r in exact.items() if not r["keep"]}
    assert dropped <= exact_dropped
    assert len(dropped) >= 8


def test_keep_partition(spark):
    """keep/dup_of form a valid dedup decision: dup_of is always a KEPT
    smaller id under min-id-keeper semantics... (dup_of points at the
    smallest above-threshold neighbor, which may itself be dropped only
    if it has an even smaller neighbor — then transitively a kept root
    exists)."""
    vecs = make_vecs(23)
    rows = semantic_dedup(corpus_df(spark, vecs), threshold=0.98,
                          n_clusters=1).collect()
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        if r["dup_of"] is not None:
            cur = r["dup_of"]
            seen = set()
            while by_id[cur]["dup_of"] is not None:
                assert cur not in seen
                seen.add(cur)
                cur = by_id[cur]["dup_of"]
            assert by_id[cur]["keep"]
