"""Index build: distributed bulk load (the reference's ctor,
prtree.h:188-259 + build at :470-585, re-expressed Spark-first).

Pipeline: validate → explode covering cells → ONE shuffle on (cell, salt)
with an in-partition sort → a streaming ``mapInPandas`` packs each cell's
rows into an STRPack (one Arrow stream per partition; memory = one batch +
one carried cell, never a whole partition) → one index row per (cell,
salt) holding the packed arrays, Morton-sorted for scan locality.
The persisted form (see sources/store.py) is the durable analogue of the
reference's cereal archive (prtree.h:119-143) — but columnar, partitioned,
and partition-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.functions.geometry import validate_boxes_df
from python_prtree_spark.functions.tiling import explode_cells, morton_encode
from python_prtree_spark.operators.probe import _hot_cells, resolve_geometry
from python_prtree_spark.operators.strpack import STRPack

__all__ = ["build_index", "INDEX_SCHEMA"]

BOX = ["xmin", "ymin", "xmax", "ymax"]

INDEX_SCHEMA = StructType([
    StructField("cell", LongType()),
    StructField("salt", IntegerType()),
    StructField("zorder", LongType()),        # Morton key of the cell — layout
    StructField("n_rows", LongType()),        # lineage metric
    StructField("leaf_size", IntegerType()),
    StructField("ids", ArrayType(LongType())),
    StructField("b_xmin", ArrayType(DoubleType())),
    StructField("b_ymin", ArrayType(DoubleType())),
    StructField("b_xmax", ArrayType(DoubleType())),
    StructField("b_ymax", ArrayType(DoubleType())),
    StructField("leaf_mbbs", ArrayType(DoubleType())),
])


def _make_pack_fn(cfg: EngineConfig):
    leaf_size, level = cfg.leaf_size, cfg.level
    side = 1 << level

    def pack_fn(pdf):
        import numpy as np
        import pandas as pd

        cell = int(pdf["cell"].iloc[0])
        salt = int(pdf["salt"].iloc[0]) if "salt" in pdf.columns else 0
        boxes = pdf[BOX].to_numpy(dtype=np.float64)
        pack = STRPack(pdf["_did"].to_numpy(dtype=np.int64), boxes, leaf_size)
        ix, iy = cell // side, cell % side
        z = int(morton_encode(np.array([ix]), np.array([iy]))[0])
        return pd.DataFrame({
            "cell": [cell], "salt": [salt], "zorder": [z],
            "n_rows": [pack.n], "leaf_size": [leaf_size],
            "ids": [pack.ids],
            "b_xmin": [pack.boxes[:, 0]], "b_ymin": [pack.boxes[:, 1]],
            "b_xmax": [pack.boxes[:, 2]], "b_ymax": [pack.boxes[:, 3]],
            "leaf_mbbs": [pack.leaf_mbbs.ravel()],
        })

    return pack_fn


def _make_stream_pack_fn(cfg: EngineConfig, keys: list[str]):
    """Streaming variant for ``mapInPandas`` over partitions sorted by
    *keys*: groups never materialize a whole partition — one Arrow batch
    plus at most one carried (partial) cell live in memory. One Arrow
    stream per PARTITION instead of one batch per GROUP, which removes the
    per-group serialization overhead of ``applyInPandas`` (measured 1.5-4x
    on the 8M-box build) while keeping identical output."""
    import pandas as pd

    pack_fn = _make_pack_fn(cfg)

    def stream(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # rows arrive sorted by keys: every key-group except possibly
            # the last is complete in this batch
            last_key = tuple(pdf[k].iloc[-1] for k in keys)
            is_last = pd.Series(True, index=pdf.index)
            for k, v in zip(keys, last_key):
                is_last &= pdf[k] == v
            carry = pdf[is_last]
            done = pdf[~is_last]
            if len(done):
                for _, g in done.groupby(keys, sort=False):
                    yield pack_fn(g)
        if carry is not None and len(carry):
            for _, g in carry.groupby(keys, sort=False):
                yield pack_fn(g)

    return stream


def build_index(
    data_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    validate: bool = True,
    n_data_hint: int | None = None,
    only_cells: "list[int] | DataFrame | None" = None,
) -> tuple[DataFrame, EngineConfig]:
    """→ (index DataFrame with INDEX_SCHEMA, resolved config).

    Validation mirrors the reference ctor (prtree.h:151-185): NaN/Inf,
    min>max, subnormals raise before any shuffle.

    only_cells: incremental-rebuild path — pack ONLY these cells (rows are
    pruned right after the cell explode, before the shuffle), so a
    dirty-cell refresh costs ~|dirty|/|cells| of a full build. Pass a
    single-column ``cell`` DataFrame for large dirty sets (semi-join —
    never materialized on the driver); a small Python list also works."""
    slim = data_df.select(data_id, *BOX)
    if validate:
        validate_boxes_df(slim, cfg)
    cfg, n = resolve_geometry(slim, cfg, n_data_hint)
    cells = explode_cells(slim, cfg.extent, cfg.level).select(
        F.col(data_id).alias("_did"), "cell", *BOX
    )
    if isinstance(only_cells, DataFrame):
        wanted = only_cells.select(F.col(only_cells.columns[0]).alias("cell"))
        cells = cells.join(wanted, on="cell", how="left_semi")
    elif only_cells is not None:
        cells = cells.where(F.col("cell").isin([int(c) for c in only_cells]))
    hot = _hot_cells(cells, cfg, n)
    keys = ["cell"]
    if hot is not None:
        cells = (
            cells.join(F.broadcast(hot), on="cell", how="left")
            .withColumn("salt", F.when(F.col("n_salts").isNull(), F.lit(0))
                        .otherwise(F.pmod(F.xxhash64("_did"), F.col("n_salts")).cast("int")))
            .drop("n_salts")
        )
        keys = ["cell", "salt"]
    if "salt" not in cells.columns:
        cells = cells.withColumn("salt", F.lit(0))
    index = (
        cells.repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .mapInPandas(_make_stream_pack_fn(cfg, keys), schema=INDEX_SCHEMA)
    )
    return index, cfg
