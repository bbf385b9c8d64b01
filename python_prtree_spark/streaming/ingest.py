"""Structured Streaming ingest: stream box rows into a base table and keep
the persisted index fresh with dirty-cell incremental refreshes per
micro-batch.

The reference is batch-only (its insert path takes a mutex per row,
prtree.h:280-418); Spark-natively, continuous insertion IS a stream:

    readStream (file/rate/kafka source of box rows)
      → foreachBatch(IngestSink(path, cfg))
          - validate batch (same rules as the bulk ctor)
          - append rows to the base table (parquet)
          - recompute packs ONLY for the cells the batch touched
            (MERGE-style partition rewrite — the distributed analogue of
            the reference's amortized insert+rebuild contract)

Also provides ``windowed_event_counts`` — watermarked tumbling-window
aggregation over an event stream (late data handled by the watermark),
demonstrating the standard streaming-agg surface on the driver's events
table schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.functions.geometry import validate_boxes_df
from python_prtree_spark.functions.tiling import explode_cells

__all__ = ["IngestSink", "stream_boxes_into_index", "windowed_event_counts"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


class IngestSink:
    """foreachBatch sink: append + dirty-cell incremental index refresh."""

    def __init__(
        self,
        index_path: str,
        cfg: EngineConfig,
        data_id: str = "id",
        snapshot_retention: int | None = 8,
    ):
        if cfg.extent is None or cfg.level is None:
            raise ValueError("streaming ingest needs a pinned extent+level")
        self.index_path = index_path
        self.cfg = cfg
        self.data_id = data_id
        #: every micro-batch refresh commits an index snapshot; an unbounded
        #: stream must not accumulate manifests + superseded files forever,
        #: so the sink expires down to the newest ``snapshot_retention``
        #: after each refresh (None = keep all, for debugging/time travel)
        self.snapshot_retention = snapshot_retention

    @property
    def base_path(self) -> str:
        return os.path.join(self.index_path, "base")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.select(self.data_id, *BOX)
        validate_boxes_df(batch_df.select(*BOX), self.cfg)
        # exactly-once under foreachBatch REPLAY: each micro-batch owns its
        # own base partition directory, so a re-delivered batch_id
        # overwrites its previous (possibly partial) write instead of
        # double-appending rows. Files are spatially clustered (sorted by
        # min-corner) so parquet row-group stats + the dirty-region filter
        # in _refresh_cells skip most of the base table at scale.
        batch_dir = os.path.join(self.base_path, f"batch={int(batch_id)}")
        batch_df.sortWithinPartitions("xmin", "ymin").write.mode(
            "overwrite"
        ).parquet(batch_dir)
        spark = batch_df.sparkSession
        dirty = explode_cells(
            batch_df, self.cfg.extent, self.cfg.level
        ).select("cell").distinct()
        self._refresh_cells(spark, dirty)

    def _dirty_region_filter(self, base: DataFrame, dirty: DataFrame) -> DataFrame:
        """Pushed-down scan prune: only rows whose box can intersect the
        dirty cells' grid rectangle contribute to any dirty pack — filter
        the base scan to that rectangle so parquet row-group stats (files
        are written sorted by min-corner) skip the rest. Border cells clamp
        out-of-extent geometry, so a dirty border row/column widens its
        bound to infinity. The filter is a superset: build_index's
        only_cells semi-join stays the exact arbiter."""
        ext, level = self.cfg.extent, self.cfg.level
        side = 1 << level
        b = dirty.select(
            F.floor(F.col("cell") / side).alias("ix"),
            (F.col("cell") % side).alias("iy"),
        ).agg(
            F.min("ix").alias("ix0"), F.max("ix").alias("ix1"),
            F.min("iy").alias("iy0"), F.max("iy").alias("iy1"),
        ).collect()[0]
        if b["ix0"] is None:
            return base
        cw, ch = ext.width() / side, ext.height() / side
        # one-cell pad: the tiler's floor() can round a hair across an exact
        # cell boundary; a full cell of slack dwarfs any fp ulp
        cond = F.lit(True)
        if b["ix0"] > 1:
            cond &= F.col("xmax") >= ext.xmin + (b["ix0"] - 1) * cw
        if b["ix1"] < side - 2:
            cond &= F.col("xmin") <= ext.xmin + (b["ix1"] + 2) * cw
        if b["iy0"] > 1:
            cond &= F.col("ymax") >= ext.ymin + (b["iy0"] - 1) * ch
        if b["iy1"] < side - 2:
            cond &= F.col("ymin") <= ext.ymin + (b["iy1"] + 2) * ch
        return base.where(cond)

    def _refresh_cells(self, spark: SparkSession, dirty: DataFrame) -> None:
        """Partition-granular refresh: re-pack only the batch's dirty cells,
        dynamic-partition-overwrite only their buckets (sources/store.py
        merge_refresh) — per-micro-batch cost scales with the batch's cell
        footprint, never with the index size."""
        import json

        from python_prtree_spark.operators.build import build_index
        from python_prtree_spark.sources.store import (
            BUCKET_SCHEME,
            _with_bucket,
            merge_refresh,
        )

        base = spark.read.parquet(self.base_path)
        filtered = self._dirty_region_filter(base, dirty)
        index, _ = build_index(filtered, self.cfg, self.data_id, validate=False,
                               only_cells=dirty)
        fresh = _with_bucket(index, self.cfg.level)
        idx_dir = os.path.join(self.index_path, "index")
        merge_refresh(spark, idx_dir, fresh, dirty, self.cfg.level)
        if self.snapshot_retention is not None:
            from python_prtree_spark.sources.store import expire_index_snapshots

            expire_index_snapshots(self.index_path,
                                   keep_last=self.snapshot_retention)
        # meta for LoadedIndex — count(*) over parquet is footer-metadata
        # only (no data scan), and is exact even across batch REPLAYS
        # (replayed batch_ids overwrite their own partition)
        n_live = base.count()
        meta = {
            "extent": [self.cfg.extent.xmin, self.cfg.extent.ymin,
                       self.cfg.extent.xmax, self.cfg.extent.ymax],
            "level": self.cfg.level,
            "leaf_size": self.cfg.leaf_size,
            "n_live_rows": n_live,
            "version": 2,
            # fresh packs are bucketed with the current scheme, so loaded
            # probes may bucket-prune (LoadedIndex._prune_buckets gate)
            "bucket_scheme": BUCKET_SCHEME,
        }
        with open(os.path.join(self.index_path, "_engine_meta.json"), "w") as f:
            json.dump(meta, f)


def stream_boxes_into_index(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    checkpoint: str | None = None,
):
    """File-source stream of box rows (parquet files dropped into
    ``source_dir``) → IngestSink. Returns the StreamingQuery; callers use
    trigger(availableNow=True)-style draining via .awaitTermination()."""
    schema = f"{data_id} long, xmin double, ymin double, xmax double, ymax double"
    stream = spark.readStream.schema(schema).parquet(source_dir)
    sink = IngestSink(index_path, cfg, data_id)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint or os.path.join(index_path, "_chk"))
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on both a static and a
    streaming DataFrame (same plan; on a stream the watermark bounds state
    and admits late data inside the horizon)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col, "n_events", "max_value",
        )
    )
