"""Deterministic stratified sampling — the balanced-curation step of a
training-data pipeline (cap every stratum at a quota: per language, per
source domain, per dup-cluster): keep the ``quota`` rows of each stratum
with the smallest md5(key, seed) rank.

Why not df.sampleBy: same reasons as operators/split.py — sampleBy is
probabilistic (quota only in expectation), partition-layout-dependent,
and not reproducible across engines. Here membership is a pure function
of (key, stratum population, seed): re-runs, repartitions and engine
ports agree row-for-row, so the sample itself is hash-gateable.

Plan: ONE shuffle (the window partitionBy on the stratum column) — the
inherent cost of exact per-stratum ranking. Skewed strata are bounded by
rank's early-out? No — a window sorts the stratum; a pathological
mega-stratum pays its own sort, the price of EXACT quotas (document:
for approximate quotas at extreme skew, pre-filter with a hash
threshold slightly above quota/n̂ and re-rank the survivors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample"]


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    quota: int,
    key: str,
    seed: int = 0,
    with_rank: bool = False,
) -> DataFrame:
    """Keep at most ``quota`` rows per value of ``stratum_col`` — the ones
    with the smallest md5 of (key, seed); ties impossible for distinct
    keys (the full 32-hex digest orders totally; equal keys tie-break on
    the key itself). with_rank=True appends the 1-based in-stratum rank."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{int(seed)}")))
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(key).cast("string").asc()
    )
    out = df.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= quota
    )
    if with_rank:
        return out.withColumnRenamed("_rk", "sample_rank")
    return out.drop("_rk")
