"""Deterministic dataset splitting — the train/val/test assignment every
training-data pipeline runs, with the two properties randomSplit lacks:

  * STABILITY: assignment is a pure function of (key, seed) — re-running
    on different partitioning/cluster sizes, or on a grown corpus, never
    reassigns an existing row (randomSplit depends on partition layout);
  * LEAKAGE SAFETY: split by a GROUP key (e.g. source domain, author,
    near-dup cluster id) so correlated rows land in the same split.

Hash = md5 (identical in every engine, so the assignment is
SQL-oracle-gateable and portable), first 12 hex chars as an integer in
[0, 16^12) scaled to [0, SCALE) — cut points are exact integers derived
from the weights.

Reference scope note: the reference engine (atksh/python_prtree) has no
dataset surface; this is pipeline tooling over the engine's tables.

Plan: a pure column expression — zero shuffles for row-key splits; a
group-key split is the same expression over the group column (still zero
shuffles: rows carry their group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_col", "split_assign"]

_SCALE = 16 ** 12  # 48 bits of the md5 — collision-free as a fraction


def split_col(
    key: "str | Column",
    weights: "dict[str, float]",
    seed: int = 0,
) -> Column:
    """Column of split names for ``key`` under ``weights`` (label → weight,
    normalized). Deterministic in (key value, seed, label order sorted)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(
        c.cast("string"), F.lit(f"#{int(seed)}")
    )), 1, 12), 16, 10).cast("long")
    total = float(sum(weights.values()))
    labels = sorted(weights)  # deterministic label order
    cuts, acc = [], 0.0
    for lab in labels[:-1]:
        acc += weights[lab] / total
        cuts.append(int(acc * _SCALE))
    expr = F.lit(labels[-1])
    for lab, cut in reversed(list(zip(labels[:-1], cuts))):
        expr = F.when(h < F.lit(cut), F.lit(lab)).otherwise(expr)
    return expr


def split_assign(
    df: DataFrame,
    weights: "dict[str, float]",
    key: str,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """df + a ``split`` column assigned by md5(key, seed). Pass a GROUP
    column as ``key`` (source, author, dup-cluster id) for leakage-safe
    splits — every row of the group gets the same label."""
    return df.withColumn(out_col, split_col(key, weights, seed))
