"""Model/metric monitoring statistics: CUSUM change detection over
per-entity series and exact ROC AUC for scored binary labels — the two
numbers a training-data pipeline watches between ingestion and training
(did the feed drift? does the quality score still separate good from
bad?).

Both are pure JVM window/aggregate plans with fixed-point exactness —
no kernel, no iteration, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cusum_alarms", "roc_auc"]


def cusum_alarms(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    ref_fp: int,
    threshold_fp: int,
    scale: int = 100,
) -> DataFrame:
    """One-sided (upper) Page CUSUM per entity -> every sample with its
    exact CUSUM statistic and alarm flag: (group, t, v_fp, s_fp, alarm).

    The textbook recurrence S_k = max(0, S_{k-1} + (x_k - ref)) is
    sequential, but it has a closed prefix form: with P_k the prefix
    sum of (x - ref) and P_0 = 0,

        S_k = P_k - min(0, min_{j<=k} P_j)

    so the whole statistic is ONE ordered window per entity (prefix sum
    + running min), pure JVM, no recursion anywhere. All arithmetic is
    fixed-point int64 (v = round(value*scale); ``ref_fp`` and
    ``threshold_fp`` are given in the same units), so the alarm set
    hash-gates. alarm = S_k > threshold_fp (the monitor would reset
    after an alarm; this surfaces the statistic itself, the standard
    "CUSUM chart" output). Rows order by (t, value) per entity —
    duplicate timestamps are deterministic.

    Scale: one shuffle on the entity key; windows are entity-local."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(t_col).cast("long").alias("_t"),
        F.round(F.col(value_col) * F.lit(int(scale))).cast("long").alias("_v"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_t", "_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = base.withColumn(
        "_p", F.sum(F.col("_v") - F.lit(int(ref_fp))).over(w)
    ).withColumn("_runmin", F.least(F.lit(0), F.min("_p").over(w)))
    s = F.col("_p") - F.col("_runmin")
    return staged.select(
        F.col("_g").alias(group_col),
        F.col("_t").alias(t_col),
        F.col("_v").alias("v_fp"),
        s.alias("s_fp"),
        (s > F.lit(int(threshold_fp))).alias("alarm"),
    )


def roc_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC per group from the rank-sum (Mann-Whitney U)
    identity -> one row (group, n_pos, n_neg, auc_num, auc_den, auc).

        AUC = (U) / (n_pos * n_neg),
        U   = sum over positives of rank(score) - n_pos(n_pos+1)/2

    with midranks for ties. Exactness: scores must be integer-valued
    (quantize upstream); ranks and midranks are rationals with
    denominator 2, so 2U is an exact int64 — auc_num = 2U and
    auc_den = 2·n_pos·n_neg are exact, ``auc`` is their one float64
    division. Ties between a positive and a negative contribute the
    standard 1/2.

    Plan: one (group, score)-histogram groupBy (map-side combined) +
    an entity-local cumulative window over DISTINCT scores — the
    data-sized frame is never sorted whole, mirroring group_quantiles'
    histogram discipline. NULL auc for degenerate groups (a class
    missing)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("long").alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    hist = base.groupBy("_g", "_s").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_y").alias("_pos"),
    )
    w_cum = (
        Window.partitionBy("_g").orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # midrank of a tie block of size c starting after `below` rows is
    # below + (c+1)/2; doubled to stay integer: 2*midrank = 2*below + c + 1
    below = F.coalesce(F.sum("_c").over(w_cum), F.lit(0))
    ranked = hist.select(
        "_g", "_pos", "_c",
        (F.col("_pos") * (2 * below + F.col("_c") + 1)).alias("_r2"),
    )
    agg = ranked.groupBy("_g").agg(
        F.sum("_pos").alias("n_pos"),
        (F.sum("_c") - F.sum("_pos")).alias("n_neg"),
        F.sum("_r2").alias("_r2sum"),
    )
    num = F.col("_r2sum") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        F.col("_g").alias(group_col),
        "n_pos", "n_neg",
        num.alias("auc_num"),
        den.alias("auc_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("auc"),
    )