"""Structured Streaming surface: streaming ingest of box rows into the
base table with incremental (dirty-cell) index refresh per micro-batch.
The reference is batch-only; this is the Spark-native growth path."""
