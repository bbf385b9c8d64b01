"""Mergeable quantile sketch for CONTINUOUS domains — the scale path
beside operators/freq.group_quantiles the same way IVF sits beside the
exact ANN baseline and MinHash-LSH beside exact n-gram Jaccard: the
histogram method is exact but needs a discrete (integer-ish) domain;
for unbounded continuous columns the mergeable sketch is the standard
100 TB answer (Spark's own approx_percentile is the same family).

Algorithm: a KLL/Munro-Paterson-style level structure. Each partition
folds its rows into per-level sorted buffers of capacity ``k``; a full
level sorts and keeps every SECOND element starting at offset 0 —
deterministic, unlike textbook KLL's coin-flip, so a fixed input
partitioning reproduces bit-identical sketches (the engine's
reproducibility contract; the trade is the classic deterministic-
compaction error bound rather than KLL's randomized one). An element
at level L stands for 2^L originals; a level-L compaction perturbs any
rank by at most 2^L, giving worst-case rank error
    err <= Σ_L (compactions at L) · 2^L
which the implementation tracks EXACTLY and reports, so callers get a
certified (not probabilistic) error bar.

Scale shape: one Arrow-batched pass over the data (mapInPandas — no
shuffle), emitting O(k · log(n/k)) (level, value) rows per partition;
the driver merges the bounded sketch union (the knn/skyline capped
toPandas contract) by concatenating per level and re-compacting. Rank
queries then read the weighted order statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["QuantileSketch", "quantile_sketch"]

DEFAULT_K = 256
DEFAULT_SKETCH_CAP = 2_000_000


class QuantileSketch:
    """Driver-side merged sketch: weighted values + certified rank error."""

    def __init__(self, values, weights, max_rank_err: int, n: int):
        import numpy as np

        order = np.argsort(values, kind="stable")
        self.values = np.asarray(values)[order]
        self.weights = np.asarray(weights)[order]
        self.max_rank_err = int(max_rank_err)
        self.n = int(n)
        self._cum = self.weights.cumsum()

    def quantile(self, q: float) -> float:
        """Value whose weighted rank reaches ceil(q·n) (nearest-rank,
        the group_quantiles convention); true rank of the returned value
        is within ±max_rank_err of the requested one."""
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
        if self.n == 0:
            raise ValueError("empty sketch")
        import math

        import numpy as np

        # rank straight from q (no thousandth rounding: tiny q must map
        # to its true rank, not silently clamp to the minimum)
        target = max(1, min(self.n, math.ceil(q * self.n)))
        i = int(np.searchsorted(self._cum, target, side="left"))
        i = min(i, len(self.values) - 1)
        return float(self.values[i])


def _fold_partition(vals, k):
    """Fold a 1-D float array into (levels, buffers, compactions) —
    fully vectorized: level 0 consumes the data in k-sized numpy slices
    (identical grouping to a one-at-a-time fill that compacts at k), and
    every compaction is one np.sort + a stride slice."""
    import numpy as np

    levels: list[list[float]] = [[]]
    n_compact: dict[int, int] = {}

    def compact(lvl):
        buf = np.sort(np.asarray(levels[lvl], dtype=np.float64),
                      kind="stable")
        survivors = buf[0::2]  # deterministic offset-0 halving
        levels[lvl] = []
        if lvl + 1 == len(levels):
            levels.append([])
        levels[lvl + 1].extend(survivors.tolist())
        n_compact[lvl] = n_compact.get(lvl, 0) + 1
        while len(levels[lvl + 1]) >= k:
            compact(lvl + 1)

    data = np.asarray(vals, dtype=np.float64)
    n_full = len(data) // k
    for i in range(n_full):
        levels[0] = data[i * k:(i + 1) * k].tolist()
        compact(0)
    levels[0] = data[n_full * k:].tolist()
    return levels, n_compact


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    k: int = DEFAULT_K,
    sketch_cap: int = DEFAULT_SKETCH_CAP,
) -> QuantileSketch:
    """One-pass mergeable quantile sketch of ``value_col`` (floats ok).

    → a :class:`QuantileSketch` with a CERTIFIED max rank error
    (tracked exactly from the compaction counts, not estimated)."""
    import numpy as np
    import pandas as pd

    if k < 4 or k % 2:
        raise ValueError(f"k must be even and >= 4, got {k}")
    vals = df.select(
        F.col(value_col).try_cast("double").alias("v")
    ).where(F.col("v").isNotNull() & ~F.isnan("v"))

    def sketch_part(batches):
        acc = []
        for pdf in batches:
            acc.append(pdf["v"].to_numpy())
        if not acc:
            return
        data = np.concatenate(acc)
        levels, n_compact = _fold_partition(data, k)
        rows = []
        for lvl, buf in enumerate(levels):
            for v in buf:
                rows.append((lvl, float(v)))
        err = sum(c << lvl for lvl, c in n_compact.items())
        rows.append((-1, float(err)))        # error sentinel
        rows.append((-2, float(len(data))))  # count sentinel
        yield pd.DataFrame(rows, columns=["lvl", "v"])

    head = (
        vals.mapInPandas(sketch_part, schema="lvl int, v double")
        .limit(sketch_cap + 1)
        .toPandas()
    )
    if len(head) > sketch_cap:
        raise ValueError(
            f"sketch union exceeds sketch_cap={sketch_cap}; raise the cap "
            f"or lower k (union is O(partitions * k * log(n/k)))")
    err = int(head.loc[head["lvl"] == -1, "v"].sum())
    n = int(head.loc[head["lvl"] == -2, "v"].sum())
    body = head[head["lvl"] >= 0]
    if n == 0:
        return QuantileSketch([], [], 0, 0)
    # driver merge: concatenate per level, re-compact full levels with
    # the same deterministic halving (each merge compaction also adds
    # its exact 2^lvl rank perturbation to the certificate)
    levels: list[list[float]] = []
    for lvl, sub in body.groupby("lvl"):
        while len(levels) <= lvl:
            levels.append([])
        levels[int(lvl)].extend(sub["v"].tolist())
    lvl = 0
    while lvl < len(levels):
        if len(levels[lvl]) >= k:
            buf = np.sort(np.asarray(levels[lvl]), kind="stable")
            survivors = buf[0::2]
            levels[lvl] = []
            if lvl + 1 == len(levels):
                levels.append([])
            levels[lvl + 1].extend(survivors.tolist())
            err += 1 << lvl
            continue  # re-check the same level (it is now empty)
        lvl += 1
    values, weights = [], []
    for l, buf in enumerate(levels):
        for v in buf:
            values.append(v)
            weights.append(1 << l)
    return QuantileSketch(values, weights, err, n)
