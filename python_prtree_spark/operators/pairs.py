"""query_intersections — distributed spatial self-join.

Reference semantics: all pairs (i, j), i < j, of mutually intersecting data
boxes, each pair exactly once (/root/reference/include/prtree/core/
prtree.h:839-958; dedup by id order at :890-894). Our distributed
anti-duplication composes two rules:

  * ``id_a < id_b``  — the reference's canonical pair order, and
  * the reference-point rule — a pair is emitted only in the cell holding
    the min-corner of its intersection — which removes cross-cell
    duplicates without any dedup shuffle.

Same two physical strategies as batch_query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.functions.tiling import (
    cell_of_point_np,
    explode_cells,
    ref_cell_col,
)
from python_prtree_spark.operators.probe import _pick_strategy, resolve_geometry
from python_prtree_spark.operators.strpack import STRPack

__all__ = ["query_intersections"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


def _pairs_sql(data_c: DataFrame, cfg: EngineConfig, data_id: str) -> DataFrame:
    a = data_c.select(
        F.col(data_id).alias("id_a"), "cell",
        *[F.col(c).alias(f"a_{c}") for c in BOX],
    )
    b = data_c.select(
        F.col(data_id).alias("id_b"), "cell",
        *[F.col(c).alias(f"b_{c}") for c in BOX],
    )
    pred = (
        (F.col("a_xmin") <= F.col("b_xmax")) & (F.col("b_xmin") <= F.col("a_xmax"))
        & (F.col("a_ymin") <= F.col("b_ymax")) & (F.col("b_ymin") <= F.col("a_ymax"))
    )
    ref = ref_cell_col(
        F.col("a_xmin"), F.col("a_ymin"), F.col("b_xmin"), F.col("b_ymin"),
        cfg.extent, cfg.level,
    )
    return (
        a.join(b, on="cell")
        .where((F.col("id_a") < F.col("id_b")) & pred & (ref == F.col("cell")))
        .select("id_a", "id_b")
    )


def _make_pairs_stream(cfg: EngineConfig):
    """Streaming mapInArrow over partitions sorted by cell: one Arrow
    stream per partition (no per-group batches, no pandas); self-probe the
    STRPack per cell, emit i<j + reference-point-deduped pairs as large
    zero-copy RecordBatches. (Self-joins are not salted: splitting a cell
    would lose intra-cell pairs across salt shards; cap per-cell size via
    the tiling level instead.)"""
    extent, level, leaf_size = cfg.extent, cfg.level, cfg.leaf_size

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        buf_a: list = []
        buf_b: list = []
        buf_rows = 0

        def flush():
            nonlocal buf_rows
            rb = pa.record_batch(
                [pa.array(np.concatenate(buf_a)), pa.array(np.concatenate(buf_b))],
                names=["id_a", "id_b"],
            )
            buf_a.clear()
            buf_b.clear()
            buf_rows = 0
            return rb

        def process(tbl):
            nonlocal buf_rows
            cells = tbl.column("cell").to_numpy()
            coords = np.column_stack([tbl.column(c).to_numpy() for c in BOX])
            ids = tbl.column("_did").to_numpy(zero_copy_only=False)
            new = np.flatnonzero(np.diff(cells) != 0) + 1
            bounds = np.concatenate([[0], new, [len(cells)]])
            for a, b in zip(bounds[:-1], bounds[1:]):
                if b - a < 2:
                    continue
                cell = int(cells[a])
                boxes = coords[a:b]
                seg_ids = ids[a:b]
                pack = STRPack(np.arange(b - a), boxes, leaf_size)
                qi, pos = pack.query(boxes)
                ia, ib = seg_ids[qi], seg_ids[pack.ids[pos]]
                keep = ia < ib
                qi, pos, ia, ib = qi[keep], pos[keep], ia[keep], ib[keep]
                refx = np.maximum(boxes[qi, 0], pack.boxes[pos, 0])
                refy = np.maximum(boxes[qi, 1], pack.boxes[pos, 1])
                keep2 = cell_of_point_np(refx, refy, extent, level) == cell
                if not keep2.any():
                    continue
                buf_a.append(ia[keep2])
                buf_b.append(ib[keep2])
                buf_rows += int(keep2.sum())

        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            if tbl.num_rows == 0:
                continue
            cells = tbl.column("cell").to_numpy()
            cut = int(np.searchsorted(cells, cells[-1], side="left"))
            carry = tbl.slice(cut)
            if cut > 0:
                process(tbl.slice(0, cut))
                if buf_rows >= 1 << 19:
                    yield flush()
        if carry is not None and carry.num_rows:
            process(carry)
        if buf_rows:
            yield flush()

    return fn


def query_intersections(
    data_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    n_data_hint: int | None = None,
) -> DataFrame:
    """All intersecting pairs (id_a < id_b), each exactly once."""
    cfg, n_data = resolve_geometry(data_df.select(data_id, *BOX), cfg, n_data_hint)
    data_c = explode_cells(data_df.select(data_id, *BOX), cfg.extent, cfg.level)
    if _pick_strategy(cfg, n_data) == "sql":
        return _pairs_sql(data_c, cfg, data_id)
    it = data_c.schema[data_id].dataType.simpleString()
    return (
        data_c.select(F.col(data_id).alias("_did"), "cell", *BOX)
        .repartition(F.col("cell"))
        .sortWithinPartitions("cell")
        .mapInArrow(_make_pairs_stream(cfg), schema=f"id_a {it}, id_b {it}")
    )
