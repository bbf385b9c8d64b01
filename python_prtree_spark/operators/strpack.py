"""STRPack — the per-cell (level-2) packed R-tree, pure numpy.

Spark-idiomatic replacement for the reference's pseudo-PRTree bulk load +
implicit-heap flat_tree (/root/reference/include/prtree/core/detail/
pseudo_tree.h:123-225, prtree.h:470-585): Sort-Tile-Recursive packing gives
the same bulk-loaded, query-shape-independent candidate sets with fully
vectorized construction (two argsorts) and probing (one leaf-MBB mask +
one refine mask). Tree shape never affects results — the closed-interval
AABB predicate is the only arbiter, exactly as in the reference.

Runs inside Arrow UDFs on one cell group at a time; also serializes to flat
arrays for the persisted index table (the analogue of the reference's cereal
archive, prtree.h:119-143 — but columnar and scannable).
"""

from __future__ import annotations

import math

import numpy as np

from python_prtree_spark.functions.geometry import aabb_intersects_np

__all__ = ["STRPack"]

# refine in chunks so (candidate leaf-pairs x leaf_size) stays bounded
_REFINE_CHUNK = 1 << 18


class STRPack:
    """Bulk-loaded 2-level STR pack: row arrays in STR order + leaf MBBs."""

    __slots__ = ("ids", "boxes", "leaf_mbbs", "leaf_size", "n")

    def __init__(self, ids: np.ndarray, boxes: np.ndarray, leaf_size: int = 64):
        ids = np.asarray(ids, dtype=np.int64)
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(ids)
        self.n = n
        self.leaf_size = leaf_size
        if n == 0:
            self.ids = ids
            self.boxes = boxes
            self.leaf_mbbs = np.empty((0, 4), dtype=np.float64)
            return
        order = self._str_order(boxes, leaf_size)
        self.ids = ids[order]
        self.boxes = boxes[order]
        n_leaves = math.ceil(n / leaf_size)
        # leaf MBBs via ufunc.reduceat over the STR-ordered rows
        starts = np.arange(n_leaves) * leaf_size
        mins = np.minimum.reduceat(self.boxes[:, :2], starts, axis=0)
        maxs = np.maximum.reduceat(self.boxes[:, 2:], starts, axis=0)
        self.leaf_mbbs = np.hstack([mins, maxs])

    @staticmethod
    def _str_order(boxes: np.ndarray, leaf_size: int) -> np.ndarray:
        """Sort-Tile-Recursive order: sort by x-center, cut into vertical
        slabs of ~sqrt(n/B) leaves each, sort each slab by y-center."""
        n = len(boxes)
        cx = boxes[:, 0] + boxes[:, 2]
        cy = boxes[:, 1] + boxes[:, 3]
        n_leaves = math.ceil(n / leaf_size)
        n_slabs = max(1, int(math.ceil(math.sqrt(n_leaves))))
        rows_per_slab = math.ceil(n / n_slabs)
        by_x = np.argsort(cx, kind="stable")
        slab_of = np.arange(n) // rows_per_slab            # slab id in x-order
        # within each slab sort by y-center: lexsort (slab major, cy minor)
        order = by_x[np.lexsort((cy[by_x], slab_of))]
        return order

    # -- probing ------------------------------------------------------------

    def query(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(m,4) query boxes → (q_idx, row_pos) COO pairs of all hits.

        Two-phase branch-and-bound, all vectorized: leaf-MBB mask prunes
        (the analogue of the reference's BFS over flat_tree, nodes.h:134-166),
        then exact row refine."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        m = len(qboxes)
        if m == 0 or self.n == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        # small cells: direct mask is cheaper than two passes
        if m * self.n <= 1 << 22:
            qi, pos = np.nonzero(aabb_intersects_np(qboxes, self.boxes))
            return qi.astype(np.int64), pos.astype(np.int64)
        B = self.leaf_size
        qi_l, li = np.nonzero(aabb_intersects_np(qboxes, self.leaf_mbbs))
        if len(qi_l) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        out_q, out_p = [], []
        for s in range(0, len(qi_l), _REFINE_CHUNK):
            qi_c = qi_l[s : s + _REFINE_CHUNK]
            li_c = li[s : s + _REFINE_CHUNK]
            pos = li_c[:, None] * B + np.arange(B)[None, :]        # (c, B)
            valid = pos < self.n
            pos_f = np.where(valid, pos, 0)
            d = self.boxes[pos_f]                                  # (c, B, 4)
            q = qboxes[qi_c][:, None, :]                           # (c, 1, 4)
            hit = (
                valid
                & (q[..., 0] <= d[..., 2]) & (d[..., 0] <= q[..., 2])
                & (q[..., 1] <= d[..., 3]) & (d[..., 1] <= q[..., 3])
            )
            ci, bi = np.nonzero(hit)
            out_q.append(qi_c[ci])
            out_p.append(pos[ci, bi] if len(ci) else np.empty(0, dtype=np.int64))
        return (
            np.concatenate(out_q).astype(np.int64),
            np.concatenate(out_p).astype(np.int64),
        )

    def query_ids(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Like query() but returns data ids instead of row positions."""
        qi, pos = self.query(qboxes)
        return qi, self.ids[pos]

    # -- (de)serialization to flat arrays (persisted index table rows) -------

    def to_arrays(self) -> dict:
        return {
            "n": self.n,
            "leaf_size": self.leaf_size,
            "ids": self.ids,
            "xmin": self.boxes[:, 0], "ymin": self.boxes[:, 1],
            "xmax": self.boxes[:, 2], "ymax": self.boxes[:, 3],
            "leaf_mbbs": self.leaf_mbbs.ravel(),
        }

    @classmethod
    def from_arrays(cls, ids, xmin, ymin, xmax, ymax, leaf_mbbs, leaf_size) -> "STRPack":
        obj = cls.__new__(cls)
        obj.ids = np.asarray(ids, dtype=np.int64)
        obj.boxes = np.column_stack([
            np.asarray(xmin, dtype=np.float64), np.asarray(ymin, dtype=np.float64),
            np.asarray(xmax, dtype=np.float64), np.asarray(ymax, dtype=np.float64),
        ])
        obj.n = len(obj.ids)
        obj.leaf_size = int(leaf_size)
        obj.leaf_mbbs = np.asarray(leaf_mbbs, dtype=np.float64).reshape(-1, 4)
        return obj
