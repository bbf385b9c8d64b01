"""Engine configuration.

Mirrors the reference's tunables where they affect semantics:
  * validation epsilons / subnormal detection (prtree.h:75-78, 151-185,
    960-1015) — affect ingest validation only, never query results;
  * branching factor B=8 (python_bindings.cc:8-10) → our per-cell STR leaf
    size (vectorized numpy works best with fatter leaves, default 64);
  * REBUILD_THRE = 1.25 (types.h:53) → compaction trigger for incremental
    partition rebuilds.

Scale knobs (tiling level, salting threshold) have no counterpart in the
single-node reference; they are what makes the design survive 100 TB.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class Extent:
    """World extent the tiler operates on. Cells only *route* rows —
    geometry outside the extent clamps into border cells and is still
    answered exactly by the final AABB predicate."""

    xmin: float = 0.0
    ymin: float = 0.0
    xmax: float = 100.0
    ymax: float = 100.0

    def width(self) -> float:
        return self.xmax - self.xmin

    def height(self) -> float:
        return self.ymax - self.ymin


@dataclass(frozen=True)
class EngineConfig:
    # --- tiling -----------------------------------------------------------
    extent: Extent = field(default_factory=Extent)
    #: quadtree level; side = 2**level cells per axis. None → auto from count.
    level: int | None = None
    #: auto-level target: expected rows per cell (level 2 UDFs hold one cell
    #: group in memory; keep it comfortably inside an Arrow batch).
    target_rows_per_cell: int = 4096
    max_level: int = 12

    # --- per-cell index ---------------------------------------------------
    #: STR leaf size (reference B=8; vectorized numpy favors fatter leaves).
    leaf_size: int = 64

    # --- skew -------------------------------------------------------------
    #: cells whose build-side row count exceeds this get salted into
    #: ceil(n/threshold) sub-partitions; probes replicate across salts.
    salt_threshold: int = 200_000
    max_salts: int = 32
    #: skip the hot-cell histogram pass entirely while the table's total
    #: row count is <= hist_skip_factor * salt_threshold: even if EVERY
    #: row landed in one cell, the worst-case single task is bounded by
    #: this many rows (a few hundred k rows ~ tens of MB — a straggler,
    #: never an OOM), which costs less than the histogram job itself.
    #: Salting never affects results, only balance, so the skip is safe
    #: at any scale; above the bound the sampled histogram runs as before.
    hist_skip_factor: int = 4

    # --- physical strategy ------------------------------------------------
    #: 'sql'    — pure-JVM codegen join (explode cells → equi-join → filter);
    #: 'packed' — cogrouped applyInPandas with per-cell STR pack;
    #: 'auto'   — pick by estimated per-cell work.
    strategy: str = "auto"

    # --- validation (reference prtree.h:75-78 defaults) --------------------
    rel_epsilon: float = 1e-6
    abs_epsilon: float = 1e-8
    adaptive_epsilon: bool = True
    detect_subnormal: bool = True

    # --- mutation / compaction (reference types.h:53) ----------------------
    rebuild_threshold: float = 1.25

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)

    def resolve_level(self, n_rows: int) -> int:
        """Pick the quadtree level for ``n_rows`` build rows: smallest level
        whose 4**level cells keep expected rows/cell under target."""
        if self.level is not None:
            return self.level
        if n_rows <= 0:
            return 0
        lvl = max(0, math.ceil(math.log(max(n_rows / self.target_rows_per_cell, 1.0), 4)))
        return min(lvl, self.max_level)


DEFAULT_CONFIG = EngineConfig()
