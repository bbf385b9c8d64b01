"""Exact distributed heavy hitters (frequent-items mining) over a corpus.

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
    doc_id: str = "doc_id",
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

    toks = docs.select(F.explode(tokens_col(text)).alias("token"))
    # The pigeonhole bound needs local_min <= ceil(T / p_actual). scan ->
    # explode -> mapInPandas is ONE stage (no exchange), so the partition
    # count observed here at plan time IS the partitioning prune() runs
    # over; any p_actual <= n_parts only makes the bound slacker.
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
