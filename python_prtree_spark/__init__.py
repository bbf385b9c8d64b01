"""python_prtree_spark — a PySpark-native spatial-join + tiling engine.

Brand-new distributed re-expression of the query semantics of
atksh/python_prtree (a single-node bulk-loaded Priority R-Tree,
/root/reference/include/prtree/core/prtree.h:64): batch box-overlap joins,
intersection self-joins, point queries, kNN, point-in-polygon, mutations with
incremental rebuild, and durable index tables — all as DataFrame plans over a
two-level index:

  level 1: a deterministic grid/quadkey tiler as the global partitioner
           (pure Spark column expressions → Catalyst partition pruning),
  level 2: per-cell STR-packed R-trees built & probed inside vectorized
           pandas/Arrow UDFs (numpy, no per-row Python).

Query results never depend on tree/tiling shape: the only arbiter is the
closed-interval AABB predicate (reference: detail/bounding_box.h:104-123),
exactly as in the reference.
"""

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.build import build_index
from python_prtree_spark.operators.probe import batch_query, batch_query_array, point_query
from python_prtree_spark.operators.pairs import query_intersections
from python_prtree_spark.operators.knn import knn_join
from python_prtree_spark.operators.distance import distance_join
from python_prtree_spark.operators.pip import point_in_polygon_join
from python_prtree_spark.operators.polygon import polygon_join
from python_prtree_spark.operators.mutate import PRTreeTable
from python_prtree_spark.operators.raster import (
    pyramid_level,
    pyramid_level_values,
    raster_vector_join,
    rasterize_counts,
    rasterize_tiles,
    zonal_stats,
)
from python_prtree_spark.operators.nd import batch_query_nd, query_intersections_nd
from python_prtree_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)
from python_prtree_spark.operators.semdedup import semantic_dedup
from python_prtree_spark.sources.store import (
    compact_index,
    expire_index_snapshots,
    index_snapshots,
    load_index,
    rollback_index,
    save_index,
)

__all__ = [
    "EngineConfig",
    "Extent",
    "build_index",
    "index_snapshots",
    "compact_index",
    "rollback_index",
    "expire_index_snapshots",
    "batch_query",
    "batch_query_array",
    "point_query",
    "query_intersections",
    "knn_join",
    "distance_join",
    "point_in_polygon_join",
    "polygon_join",
    "raster_vector_join",
    "zonal_stats",
    "rasterize_counts",
    "pyramid_level",
    "pyramid_level_values",
    "rasterize_tiles",
    "batch_query_nd",
    "query_intersections_nd",
    "PRTreeTable",
    "connected_components",
    "duplicate_clusters",
    "semantic_dedup",
    "save_index",
    "load_index",
]

__version__ = "0.1.0"
