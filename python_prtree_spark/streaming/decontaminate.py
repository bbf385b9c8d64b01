"""Streaming train-vs-eval decontamination — the Structured Streaming
twin of operators/dedup.decontaminate (same two-form pattern as
sessionization / trajectory / heavy hitters): scrub an INCOMING stream
of training documents against a STATIC eval-corpus gram set before they
ever land in the corpus.

Shape: per-row JVM gram construction (array_distinct of the shared
ngram_array — no state), a STREAM-STATIC inner equi-join against the
deduplicated (and broadcast) eval gram frame — stateless by Spark's
semantics, the static side is simply available to every micro-batch —
then ONE windowed aggregation keyed by (event-time window, doc_id) whose
state the watermark bounds: a document's rows all carry its single
ingest timestamp, so its group closes as soon as the watermark passes
its window. State is O(docs inside open windows), never stream-length.

Contract linking the two (tested): on a bounded input, the streaming
query's output equals batch ``decontaminate`` over the same rows (plus
the window-start column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.operators.dedup import ngram_array

__all__ = ["decontaminate_stream", "eval_gram_frame"]


def eval_gram_frame(
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """STATIC deduplicated (gram) frame of the eval corpus — build once,
    reuse across micro-batches (and persist/broadcast it: eval
    benchmarks are tiny next to a training stream)."""
    return (
        eval_df.select(F.explode(ngram_array(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate_stream(
    docs: DataFrame,
    eval_grams: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (t_bucket, doc_id, n_grams, n_hits): flagged training docs of
    the stream, t_bucket = epoch seconds of the event-time window start.
    Works on a static OR streaming ``docs`` DataFrame (the streaming
    form is how it is meant to run; the static form is the test twin).

    ``eval_grams``: the STATIC frame from eval_gram_frame (must be
    built with the same n)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    base = (
        docs.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.col(doc_id).alias("doc_id"),
            F.array_distinct(ngram_array(text_col, n)).alias("_gs"),
        )
        .select(
            F.col(ts_col), "doc_id",
            F.size("_gs").alias("_ng"),
            F.explode("_gs").alias("gram"),
        )
    )
    hits = base.join(
        F.broadcast(eval_grams.select("gram").distinct()), on="gram"
    )
    return (
        hits.groupBy(F.window(F.col(ts_col), window).alias("win"), "doc_id")
        .agg(
            F.max("_ng").alias("n_grams"),
            F.count(F.lit(1)).alias("n_hits"),
        )
        .where(F.col("n_hits") >= int(min_hits))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("t_bucket"),
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hits").cast("long").alias("n_hits"),
        )
    )
