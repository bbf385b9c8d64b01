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


def _make_pairs_fn(cfg: EngineConfig):
    extent, level, leaf_size = cfg.extent, cfg.level, cfg.leaf_size

    def pairs_fn(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pdf["_did"].iloc[:0],
                                 "id_b": pdf["_did"].iloc[:0]})
        cell = int(pdf["cell"].iloc[0])
        boxes = pdf[BOX].to_numpy(dtype=np.float64)
        ids = pdf["_did"].to_numpy()
        pack = STRPack(np.arange(len(pdf)), boxes, leaf_size)
        qi, pos = pack.query(boxes)          # self-probe: original order vs pack order
        ia, ib = ids[qi], ids[pack.ids[pos]]
        keep = ia < ib
        qi, pos, ia, ib = qi[keep], pos[keep], ia[keep], ib[keep]
        refx = np.maximum(boxes[qi, 0], pack.boxes[pos, 0])
        refy = np.maximum(boxes[qi, 1], pack.boxes[pos, 1])
        keep2 = cell_of_point_np(refx, refy, extent, level) == cell
        return pd.DataFrame({"id_a": ia[keep2], "id_b": ib[keep2]})

    return pairs_fn


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
    fn = _make_pairs_fn(cfg)
    it = data_c.schema[data_id].dataType.simpleString()
    return (
        data_c.select(F.col(data_id).alias("_did"), "cell", *BOX)
        .groupBy("cell")
        .applyInPandas(fn, schema=f"id_a {it}, id_b {it}")
    )
