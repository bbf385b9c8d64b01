"""Streaming windowed heavy hitters — the "trending tokens" twin of
operators/freq.heavy_hitters (same two-form pattern as sessionization /
trajectory / st_cube: a batch aggregate plus the Structured Streaming
form whose state the watermark bounds).

The batch operator's two-phase pigeonhole prune is a BATCH-only
optimization (it needs the final partition counts); the streaming form
keeps exact per-(window, token) counts instead — the canonical
Structured Streaming shape: stateless explode, Spark's own ``window()``
bucket (so state expires once the watermark passes a window's end), one
aggregation. State is O(open windows × distinct tokens within them) —
bounded by the watermark horizon and the vocabulary, never by stream
length. The threshold filter runs on the emitted aggregate, exactly the
HAVING of the batch twin.

Contract linking the two (tested): on a bounded input the streaming
query's complete output equals the same function applied in batch over
the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.functions.text import tokens_col

__all__ = ["heavy_hitters_stream"]


def heavy_hitters_stream(
    docs: DataFrame,
    threshold: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text: str = "text",
) -> DataFrame:
    """→ (t_bucket, token, n): tokens whose count within their event-time
    window reaches ``threshold``; t_bucket = epoch seconds of the window
    start. Works on a static OR streaming DataFrame."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    # watermarks require TIMESTAMP (an NTZ parquet column is rejected)
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(tokens_col(text)).alias("token"))
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("t_bucket"),
            "token",
            F.col("n").cast("long").alias("n"),
        )
    )
