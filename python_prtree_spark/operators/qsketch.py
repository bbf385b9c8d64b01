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

__all__ = [
    "QuantileSketch",
    "quantile_sketch",
    "mad_outliers",
    "theil_sen",
    "ols_trend",
]

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


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k_num: int = 3,
    k_den: int = 1,
    scale: int = 100,
) -> DataFrame:
    """Robust per-group outlier detection by Median Absolute Deviation
    (the Hampel / robust-z filter every metrics pipeline runs before a
    mean would lie): a row is an outlier when

        |v - median(group)| * k_den > MAD(group) * k_num

    with both medians the deterministic UPPER nearest-rank statistic —
    the smallest value whose cumulative count satisfies 2*cum >= n+1
    (the true middle for odd n, the upper middle for even n) — over
    fixed-point integers
    (v = round(value * scale) — exact for fixed-decimal telemetry), and
    the threshold a CROSS-MULTIPLIED integer comparison — no float
    anywhere after quantization, so the flagged set hash-gates. A
    zero-MAD group (majority identical values) flags exactly the rows
    that differ — the standard, documented MAD edge case.

    Scale shape: the histogram-exact group_quantiles discipline — two
    rounds of (group, value)-histogram groupBy + a tiny per-group
    cumsum window (rows = distinct values per group, not data rows),
    medians broadcast back by equi-join; the data-sized frame is
    touched by map-side-combinable aggregates and two broadcast-able
    joins only, never sorted whole.

    → (id, group, v_fp, med_fp, mad_fp, dev_fp) for flagged rows."""
    from pyspark.sql import Window

    g = F.col(group_col).alias("_g")
    v = F.round(F.col(value_col) * F.lit(int(scale))).cast("long").alias("_v")
    base = df.select(F.col(id_col).alias("_id"), g, v)

    def upper_median(frame, val: str):
        hist = frame.groupBy("_g", val).agg(F.count(F.lit(1)).alias("_c"))
        w_cum = (
            Window.partitionBy("_g").orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("_g")
        cum = hist.select(
            "_g", F.col(val).alias("_val"),
            F.sum("_c").over(w_cum).alias("_cum"),
            F.sum("_c").over(w_all).alias("_n"),
        )
        # 2*cum >= n+1 <=> cum >= ceil((n+1)/2): the (n+1)//2 + (n even)
        # rank — true middle for odd n, upper middle for even n
        return (
            cum.where(F.col("_cum") * 2 >= F.col("_n") + 1)
            .groupBy("_g").agg(F.min("_val").alias("_med"))
        )

    med = upper_median(base, "_v")
    with_med = base.join(med, on="_g").select(
        "_id", "_g", "_v", "_med",
        F.abs(F.col("_v") - F.col("_med")).alias("_dev"),
    )
    mad = upper_median(
        with_med.select("_g", F.col("_dev").alias("_v")), "_v"
    ).select("_g", F.col("_med").alias("_mad"))
    return (
        with_med.join(mad, on="_g")
        .where(F.col("_dev") * F.lit(int(k_den))
               > F.col("_mad") * F.lit(int(k_num)))
        .select(
            F.col("_id").alias(id_col), F.col("_g").alias(group_col),
            F.col("_v").alias("v_fp"), F.col("_med").alias("med_fp"),
            F.col("_mad").alias("mad_fp"), F.col("_dev").alias("dev_fp"),
        )
    )


def theil_sen(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group Theil-Sen robust trend (Sen 1968; the slope estimator
    drift monitors use because one bad day cannot drag it) -> one row
    (group, n_pts, n_pairs, slope_num, slope_den, slope, icept_num,
    icept).

    slope = the upper-nearest-rank median of all pairwise slopes
    (v_j - v_i)/(t_j - t_i) over pairs with t_i < t_j; intercept = the
    same median of the exact residuals den*v - num*t, so the fitted
    line is v ~= (slope_num*t + icept_num)/slope_den (everything in
    fixed-point: t integer microseconds, v = round(value*scale)).

    Exactness: pairwise slopes are ordered by their correctly-rounded
    float64 — rounding is monotone, so the double order IS the rational
    order except inside runs of double-equal slopes, where the
    (num, den) tie-break is engine-independent; the selected slope is
    returned as the EXACT rational (num, den), and the intercept median
    runs on exact int64 residuals. Points sharing a timestamp form no
    pair (slope undefined there).

    Scale shape: the pairwise self-join is ONE group-keyed shuffle with
    O(m^2) rows per entity — per-entity series are task-sized in the
    corpora this serves (per-user metrics); for long series, subsample
    pairs or use the repo's quantile sketch over per-window slopes."""
    from pyspark.sql import Window

    base0 = df.select(
        F.col(group_col).alias("_g"),
        F.col(t_col).alias("_t").cast("long"),
        F.round(F.col(value_col) * F.lit(int(scale))).cast("long").alias("_v"),
    )
    # time is re-origined to each group's first sample: slopes are
    # translation-invariant, and den*v - num*t' stays far from int64
    # overflow (t' = span, not epoch); icept is the fit AT t = min(t).
    base = base0.withColumn(
        "_t",
        F.col("_t") - F.min("_t").over(Window.partitionBy("_g")),
    )
    a = base.select("_g", F.col("_t").alias("t1"), F.col("_v").alias("v1"))
    b = base.select("_g", F.col("_t").alias("t2"), F.col("_v").alias("v2"))
    pairs = a.join(b, "_g").where(F.col("t1") < F.col("t2")).select(
        "_g",
        (F.col("v2") - F.col("v1")).alias("num"),
        (F.col("t2") - F.col("t1")).alias("den"),
    )
    sd = F.col("num").cast("double") / F.col("den").cast("double")
    w_rank = Window.partitionBy("_g").orderBy(sd, "num", "den")
    w_all = Window.partitionBy("_g")
    picked = (
        pairs.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .where(F.col("_rn") * 2 >= F.col("_n") + 1)
        .groupBy("_g")
        .agg(
            F.min(F.struct("_rn", "num", "den")).alias("_s"),
            F.first("_n").alias("n_pairs"),
        )
        .select(
            "_g", "n_pairs",
            F.col("_s.num").alias("slope_num"),
            F.col("_s.den").alias("slope_den"),
        )
    )
    resid = base.join(picked, "_g").select(
        "_g",
        (F.col("slope_den") * F.col("_v") - F.col("slope_num") * F.col("_t"))
        .alias("_r"),
    )
    w_rrank = Window.partitionBy("_g").orderBy("_r")
    icept = (
        resid.withColumn("_rn", F.row_number().over(w_rrank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .where(F.col("_rn") * 2 >= F.col("_n") + 1)
        .groupBy("_g")
        .agg(F.min("_r").alias("icept_num"), F.first("_n").alias("n_pts"))
    )
    return (
        picked.join(icept, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_pts", "n_pairs", "slope_num", "slope_den",
            (F.col("slope_num").cast("double") / F.col("slope_den").cast("double"))
            .alias("slope"),
            "icept_num",
            (F.col("icept_num").cast("double") / F.col("slope_den").cast("double"))
            .alias("icept"),
        )
    )


def ols_trend(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group ordinary-least-squares trend from CLOSED-FORM exact
    integer sums — Theil-Sen's cheap companion (one map-side-combinable
    groupBy, no window, no pair join; the 100 TB shape) -> one row
    (group, n, slope_num, slope_den, slope, icept_num, icept_den,
    icept).

        slope = (n·Σtv - Σt·Σv) / (n·Σt² - (Σt)²)
        icept = (Σv·Σt² - Σt·Σtv) / (n·Σt² - (Σt)²)   [at t = min(t)]

    Every sum is an exact int64 (t re-origined to the group minimum, v
    fixed-point), so numerator and denominator are exact and the only
    floats are the two final divisions — bit-identical on any engine.
    Degenerate groups (n < 2 or all t equal: denominator 0) emit NULL
    slope/icept with the exact sums still reported.

    int64 headroom: with t' <= span and |v| <= V, n·Σt'v ~ n²·span·V —
    at microsecond spans of a month (2.6e12), V = 1e4, that bounds
    n <= ~1.8e4 per group before 9.2e18; re-origin t to coarser units
    for longer series (the caller owns t's unit)."""
    base0 = df.select(
        F.col(group_col).alias("_g"),
        F.col(t_col).cast("long").alias("_t"),
        F.round(F.col(value_col) * F.lit(int(scale))).cast("long").alias("_v"),
    )
    from pyspark.sql import Window

    base = base0.withColumn(
        "_t", F.col("_t") - F.min("_t").over(Window.partitionBy("_g"))
    )
    agg = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_t").alias("st"),
        F.sum("_v").alias("sv"),
        F.sum(F.col("_t") * F.col("_v")).alias("stv"),
        F.sum(F.col("_t") * F.col("_t")).alias("stt"),
    )
    num = F.col("n") * F.col("stv") - F.col("st") * F.col("sv")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    inum = F.col("sv") * F.col("stt") - F.col("st") * F.col("stv")
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("slope"),
        inum.alias("icept_num"),
        den.alias("icept_den"),
        F.when(den != 0, inum.cast("double") / den.cast("double")).alias("icept"),
    )
