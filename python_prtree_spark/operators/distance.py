"""Within-distance join (ST_DWithin analogue) — north-rule extension (the
reference's only probe is box overlap, core.py:560-585; real geospatial
pipelines pair it with radius search).

Semantics: (qid, id, dist2_q) for every (probe point, data box) pair whose
point-to-box Euclidean distance is <= radius. Distance to a box is 0 when
the point lies inside it; otherwise the distance to the nearest edge/corner:

    dx = max(xmin - px, px - xmax, 0);  dy likewise;  dist² = dx² + dy²

Distributed plan — exactly ONE spatial shuffle, no new machinery:

  1. expand each probe point to the box [p ± r]. Certificate: dist(p, B) <= r
     implies |dx| <= r AND |dy| <= r, i.e. B intersects the expanded square —
     so the square's candidate set is a SUPERSET of the answer (the square's
     corners admit false positives up to r*sqrt(2), removed by the refine).
  2. route the squares through the same cell-partitioned ``batch_query``
     (PBSM single shuffle, packed kernel, hot-cell salting — all inherited).
  3. exact JVM-side refine: the dist² predicate above, whole-stage codegen,
     no Python in the hot path.

dist2_q is dist² quantized to 1e-6 (floor(dist² * 1e6) as long): the
arithmetic is the same IEEE double sequence in Spark and DuckDB, and the
fixed-point form keeps the cross-engine value-hash comparison away from
float-printing differences (same trick as ann.cosine_topk_quantized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["distance_join"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


def distance_join(
    data_df: DataFrame,
    points_df: DataFrame,
    radius: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    query_id: str = "qid",
    x: str = "x",
    y: str = "y",
    n_data_hint: int | None = None,
) -> DataFrame:
    """→ (qid, id, dist2_q) pairs with point-to-box distance <= radius."""
    r = float(radius)
    if not (r >= 0.0):  # also rejects NaN
        raise ValueError(f"radius must be >= 0, got {radius!r}")
    pts = points_df.select(
        query_id, F.col(x).alias("_px"), F.col(y).alias("_py")
    )
    squares = pts.select(
        query_id,
        (F.col("_px") - r).alias("xmin"), (F.col("_py") - r).alias("ymin"),
        (F.col("_px") + r).alias("xmax"), (F.col("_py") + r).alias("ymax"),
    )
    cand = _probe.batch_query(
        data_df.select(data_id, *BOX), squares, cfg, data_id, query_id,
        n_data_hint=n_data_hint,
    )
    dx = F.greatest(F.col("xmin") - F.col("_px"), F.col("_px") - F.col("xmax"), F.lit(0.0))
    dy = F.greatest(F.col("ymin") - F.col("_py"), F.col("_py") - F.col("ymax"), F.lit(0.0))
    dist2 = dx * dx + dy * dy
    return (
        cand.join(data_df.select(data_id, *BOX), on=data_id)
        .join(pts, on=query_id)
        .where(dist2 <= F.lit(r * r))
        .select(
            query_id, data_id,
            F.floor(dist2 * F.lit(1e6)).cast("long").alias("dist2_q"),
        )
    )
