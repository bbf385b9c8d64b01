"""Exact distributed heavy hitters and order statistics over a corpus.

The training-data-pipeline primitive behind stopword discovery, boilerplate
detection, and vocabulary triage: every token whose GLOBAL occurrence count
is >= a threshold T, exact.

Reference parity note: the reference engine (atksh/python_prtree) has no
text surface; this belongs to the LLM-data-pipeline extension family
(SURVEY.md §2.1b) alongside tfidf_topk / bm25 / dedup_*.

Scale shape — why not one big groupBy(token): at 100 TB the token shuffle
IS the cost (every token instance crosses the wire once; map-side combine
helps only as much as per-task vocabulary repeats). The classic two-phase
heavy-hitter plan cuts it with a pigeonhole bound:

  phase 1 (local prune): a token with global count >= T spread over P
    partitions must have count >= ceil(T/P) in at least one partition.
    Each task counts ITS rows (vectorized pandas value_counts — no
    per-row Python) and emits only tokens with local count >= ceil(T/P).
    The candidate union is bounded by n·P/T tokens total — tiny for any
    meaningful T — and provably a superset of the answer.
  phase 2 (exact verify): broadcast the candidate set, semi-join the
    token stream, ONE groupBy over the surviving (rare) tokens, filter
    >= T. Only candidate occurrences shuffle.

Exactness: phase 1 never drops a true heavy hitter (pigeonhole), phase 2
recounts candidates exactly — so the output equals the naive full-shuffle
answer and hash-gates against a plain SQL HAVING count(*) >= T oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    docs: DataFrame,
    threshold: int,
    text: str = "text",
) -> DataFrame:
    """All tokens (whitespace tokenization, same tokens_col as tfidf/bm25)
    with global occurrence count >= ``threshold``, exact.

    → (token, n) rows; n = exact global count (long).
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    import pandas as pd

    from ..functions.text import tokens_col

    from python_prtree_spark.operators.dedup import _spread

    # _spread first (r6): a single-file corpus arrives as one scan task and
    # the prune pass would run serially. The pigeonhole bound needs
    # local_min <= ceil(T / p_actual); n_parts is observed AFTER the spread,
    # so the partition count seen at plan time IS the partitioning prune()
    # runs over; any p_actual <= n_parts only makes the bound slacker.
    toks = _spread(docs.select(F.explode(tokens_col(text)).alias("token")))
    n_parts = max(1, toks.rdd.getNumPartitions())
    local_min = max(1, math.ceil(threshold / n_parts))

    def prune(batches):
        acc = None
        for pdf in batches:
            vc = pdf["token"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
        if acc is not None:
            acc = acc[acc >= local_min]
            yield pd.DataFrame({"token": acc.index.astype(str)})

    cands = toks.mapInPandas(prune, schema="token string").distinct()
    return (
        toks.join(F.broadcast(cands), on="token", how="left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
        .select("token", F.col("n").cast("long").alias("n"))
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float] = (0.5, 0.9),
) -> DataFrame:
    """EXACT per-group quantiles of a discrete (integer-valued) column —
    the curation primitive behind per-language length cutoffs and
    quality-score thresholds, where Spark's builtin percentile_approx is
    approximate and rank-based exact methods sort every ROW.

    Nearest-rank (type-1) definition: q-quantile = the smallest value v
    whose cumulative count reaches ceil(q·n). q is taken in exact
    thousandths (qm = round(q·1000); target = (n·qm + 999) div 1000 =
    ceil(n·qm/1000) in pure integer arithmetic) so Spark and any ANSI-SQL
    oracle compute the identical rank with no float thresholds.

    Scale shape: the full data is touched by ONE map-side-combining
    groupBy(group, value) histogram — for discrete domains (token counts,
    char lengths, quality buckets) this collapses 100 TB of rows into
    |groups|·|domain| cells. The cumulative scan then runs over the TINY
    histogram (a window by group over distinct values), not the rows; no
    row-level sort anywhere in the plan.

    → (group, n, q_500, q_900, ...) one row per group, one long column
    per requested quantile (name = q in thousandths)."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must be non-empty")
    qms = [int(round(q * 1000)) for q in qs]
    if any(not 0 < qm <= 1000 for qm in qms):
        raise ValueError(f"quantiles must be in (0, 1], got {list(qs)}")
    # discrete-domain contract, enforced loudly: a fractional column
    # would silently truncate through the long cast and return
    # exact-looking but wrong answers — route continuous columns to
    # operators/qsketch.quantile_sketch instead
    vt = df.schema[value_col].dataType.simpleString()
    if vt in ("float", "double") or vt.startswith("decimal"):
        raise ValueError(
            f"group_quantiles needs an integer-valued column, got {vt} "
            f"for {value_col!r}; for continuous domains use "
            f"quantile_sketch (operators/qsketch.py), or cast explicitly "
            f"if the values are known integral")

    hist = (
        # try_cast: null AND NaN values become null and are excluded
        # (not ranked) — Spark windows sort nulls FIRST and ANSI SQL
        # engines LAST, so ranking them would make the cumulative counts
        # engine-dependent (and NaN.cast(long) throws under ANSI)
        df.select(F.col(group_col).alias("g"),
                  F.col(value_col).try_cast("long").alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = Window.partitionBy("g").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("g")
    cum = hist.select(
        "g", "v",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n")]
    for qm in qms:
        # 64-bit integer DIV, not double /, so the rank is exact at any n.
        target = F.expr(f"(_n * {qm} + 999) DIV 1000")
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col("v")))
            .cast("long").alias(f"q_{qm}")
        )
    return cum.groupBy(F.col("g").alias(group_col)).agg(*aggs)


def frequent_pairs(
    docs_df: DataFrame,
    min_support: int,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequent token CO-OCCURRENCE pairs (the A-priori / market-basket
    step: which term pairs appear together in >= min_support docs —
    topic co-occurrence, tag correlation): document-level DISTINCT
    token sets, the A-priori prune first (a pair can only be frequent
    if BOTH singletons are — the frequent-singleton set broadcasts into
    a semi-join, so the pair stage never sees infrequent tokens), then
    one doc-key self-join ordered t1 < t2 and one (t1, t2) groupBy.

    Scale shape: the pair fan-out is bounded by (frequent tokens per
    doc choose 2), not vocabulary^2 — exactly the A-priori guarantee;
    both groupBys are map-side combined; the singleton side is
    broadcast-sized by construction (tokens with df >= min_support).

    → (t1, t2, n) with t1 < t2, n = co-occurrence doc count."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    from python_prtree_spark.functions.text import tokens_col

    toks = (
        docs_df.select(F.col(doc_id).alias("_d"),
                       F.explode(tokens_col(text_col)).alias("_t"))
        .distinct()
    )
    freq = (
        toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= int(min_support))
        .select("_t")
    )
    ft = toks.join(F.broadcast(freq), on="_t")
    a = ft.select("_d", F.col("_t").alias("t1"))
    b = ft.select("_d", F.col("_t").alias("t2"))
    return (
        a.join(b, on="_d")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= int(min_support))
        .select("t1", "t2", F.col("n").cast("long").alias("n"))
    )
