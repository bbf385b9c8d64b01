"""Exact distributed 2-D skyline (Pareto frontier) — the classic
"best price/quality trade-offs" database operator (Börzsönyi et al.,
ICDE 2001), used in a data pipeline to pick non-dominated corpus
candidates (e.g. maximize quality score while minimizing length/cost);
optionally per group (the frontier within each category).

Reference parity note: the reference engine (atksh/python_prtree) has no
analytics surface; this belongs to the training-data-pipeline extension
family (SURVEY.md §2.1b), same two-phase-exact shape as heavy_hitters.

Semantics (minimize ``x``, maximize ``y``, within a group): row a
dominates row b iff a.x <= b.x AND a.y >= b.y AND (a.x < b.x OR
a.y > b.y). The skyline is every row not dominated by any other row of
its group. Duplicate (x, y) points do not dominate each other — all
frontier ties are kept, so the result is a pure set function of the
input (engine-independent, hash-gateable against an ANSI NOT EXISTS
oracle).

Scale shape — the pigeonhole of dominance: a row dominated within its
OWN partition (by a same-group row) can never be in the global skyline,
so phase 1 reduces each partition to its per-group local skyline with a
vectorized sort-scan (O(n log n) per task, no per-row Python) — a
provable superset of the answer, typically O(sqrt n) per group for
independent dims. Phase 2 finishes exactly on the candidate union,
materialized through the SAME capped ``limit(cap+1).toPandas()`` gate
the knn broadcast path uses (bounded driver memory, loud failure with
remediation when the frontier is adversarially large). The full data is
touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_CANDIDATE_CAP = 1_000_000


def _frontier(pdf):
    """Exact skyline of a single-group pandas frame: keep iff y equals
    the max y at its x AND y exceeds every y at any strictly smaller x —
    precisely NOT EXISTS(dominator)."""
    gmax = pdf.groupby("x")["y"].transform("max")
    xmax = pdf.groupby("x")["y"].max().sort_index()
    prev = xmax.cummax().shift(1)
    prev_max = pdf["x"].map(prev)
    return pdf[(pdf["y"] == gmax) & (prev_max.isna() | (pdf["y"] > prev_max))]


def skyline(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
    group_col: str | None = None,
    candidate_cap: int = DEFAULT_CANDIDATE_CAP,
) -> DataFrame:
    """→ the input rows ([grp,] id, x, y) on the minimize-x / maximize-y
    Pareto frontier of their group, exact (all frontier ties kept)."""
    import pandas as pd

    if candidate_cap < 1:
        raise ValueError(f"candidate_cap must be >= 1, got {candidate_cap}")
    spark = df.sparkSession
    cols = [
        F.col(id_col).cast("long").alias("id"),
        F.col(x).cast("double").alias("x"),
        F.col(y).cast("double").alias("y"),
    ]
    if group_col is not None:
        cols.insert(0, F.col(group_col).cast("string").alias("grp"))
    pts = df.select(*cols).where(
        # null/NaN coordinates are excluded up front: NULL comparisons
        # make NOT EXISTS keep such rows while pandas sort/groupby drops
        # them — excluding both sides keeps the operator a pure set
        # function of the well-defined points
        F.col("x").isNotNull() & F.col("y").isNotNull()
        & ~F.isnan("x") & ~F.isnan("y")
    )
    schema = ("grp string, " if group_col is not None else "") + \
        "id long, x double, y double"

    def local_sky(batches):
        acc = []
        for pdf in batches:
            acc.append(pdf)
        if not acc:
            return
        pdf = pd.concat(acc)
        # superset sort-scan: x asc / y desc per group; a row with y
        # below the group's running max has a strict dominator here
        if "grp" in pdf.columns:
            pdf = pdf.sort_values(["grp", "x", "y"],
                                  ascending=[True, True, False])
            run = pdf.groupby("grp")["y"].cummax()
        else:
            pdf = pdf.sort_values(["x", "y"], ascending=[True, False])
            run = pdf["y"].cummax()
        yield pdf[pdf["y"] >= run]

    # _spread (r6): single-file inputs arrive as one task and the local
    # frontier pass would run serially; candidates stay a superset of the
    # exact frontier under ANY partitioning, so the result is unchanged
    from python_prtree_spark.operators.dedup import _spread

    cands = _spread(pts).mapInPandas(local_sky, schema=schema)
    head = cands.limit(candidate_cap + 1).toPandas()
    if len(head) > candidate_cap:
        raise ValueError(
            f"skyline candidate union exceeds candidate_cap="
            f"{candidate_cap}; raise the cap or pre-aggregate the plane "
            f"(an adversarial frontier is O(n))")
    if head.empty:
        return spark.createDataFrame([], schema)
    if group_col is not None:
        out = (
            head.groupby("grp", group_keys=False)[head.columns.tolist()]
            .apply(_frontier)
        )
        out = out.sort_values(["grp", "id"])
        out = out[["grp", "id", "x", "y"]]
    else:
        out = _frontier(head).sort_values("id")[["id", "x", "y"]]
    return spark.createDataFrame(out, schema)
