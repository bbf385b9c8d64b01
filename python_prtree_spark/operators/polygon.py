"""Polygon–polygon intersection join — north-rule extension (raster↔vector
family; the reference has no polygon support, its only predicate is the
AABB overlap at bounding_box.h:104-123).

Semantics: (a_id, b_id) for every pair of SIMPLE polygons whose regions
touch or overlap (closed semantics — boundary contact counts, consistent
with the engine's closed-interval AABB predicate). Exact decomposition for
simple polygons:

    A ∩ B ≠ ∅  ⇔  some edge of A intersects some edge of B
               OR  A's first vertex lies inside B   (A ⊆ B)
               OR  B's first vertex lies inside A   (B ⊆ A)

(Boundary-contact cases are always caught by the edge–edge clause — the
collinear/on-segment terms below — so the containment clauses only need
to be right for STRICT interior points, where the parity/half-plane tests
are exact.)

Distributed plan, 100% JVM (no Python anywhere):

  1. candidate pairs via the cell-routed ``batch_query`` on bounding boxes
     (A side = data, B side = probes) — one spatial shuffle, inherits
     packed/sql routing + hot-cell salting;
  2. per-polygon edge tables built ONCE (posexplode, codegen) and joined
     back to candidate pairs — cost ∝ Σ_pairs |edges_A|·|edges_B| rows of
     pure column arithmetic (fine for typical vector rings; a mega-ring
     corpus would move this into the Arrow kernel like the packed probe);
  3. edge–edge segment test: the four orientation cross products with
     collinear + on-segment handling; containment: convex half-plane test
     (``mode='convex'``, CCW rings) or raycast parity (``mode='raycast'``,
     any simple polygon) — both aggregated per candidate pair.

Polygon table schema (FIXTURES.md F5): id, ring array<struct<x,y>>,
xmin/ymin/xmax/ymax.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["polygon_join", "polygon_area_centroid", "convex_hull",
           "hull_diameter", "union_area"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


def _edges(polys: DataFrame, pid: str, prefix: str) -> DataFrame:
    """One row per directed ring edge: (pid, {p}x1, {p}y1, {p}x2, {p}y2)."""
    return (
        polys.select(
            pid,
            F.posexplode("ring").alias("_i", "_v"),
            F.size("ring").alias("_nv"),
            F.col("ring").alias("_ring"),
        )
        .withColumn("_w", F.element_at("_ring", (F.col("_i") + 1) % F.col("_nv") + 1))
        .select(
            pid,
            F.col("_v.x").alias(f"{prefix}x1"), F.col("_v.y").alias(f"{prefix}y1"),
            F.col("_w.x").alias(f"{prefix}x2"), F.col("_w.y").alias(f"{prefix}y2"),
        )
    )


def _cross(ox: Column, oy: Column, px: Column, py: Column,
           qx: Column, qy: Column) -> Column:
    """Orientation of q relative to the directed segment o→p."""
    return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)


def _on_seg(px: Column, py: Column, qx: Column, qy: Column,
            rx: Column, ry: Column) -> Column:
    """r (already collinear with pq) lies within pq's bounding box."""
    return (
        (F.least(px, qx) <= rx) & (rx <= F.greatest(px, qx))
        & (F.least(py, qy) <= ry) & (ry <= F.greatest(py, qy))
    )


def _segments_intersect() -> Column:
    """Closed segment-intersection predicate over columns
    ax1..ay2 (segment a) and bx1..by2 (segment b)."""
    c = lambda n: F.col(n)  # noqa: E731
    d1 = _cross(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax1"), c("ay1"))
    d2 = _cross(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax2"), c("ay2"))
    d3 = _cross(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx1"), c("by1"))
    d4 = _cross(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx2"), c("by2"))
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    touch = (
        ((d1 == 0) & _on_seg(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax1"), c("ay1")))
        | ((d2 == 0) & _on_seg(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax2"), c("ay2")))
        | ((d3 == 0) & _on_seg(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx1"), c("by1")))
        | ((d4 == 0) & _on_seg(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx2"), c("by2")))
    )
    return proper | touch


def _contained(cand: DataFrame, outer_edges: DataFrame,
               inner_first_vertex: DataFrame, outer_id: str, inner_id: str,
               mode: str) -> DataFrame:
    """Candidate pairs where the inner polygon's first vertex is inside the
    outer polygon. Exactness needed only for strict-interior points (any
    boundary contact is already reported by the edge–edge clause)."""
    rows = (
        cand.join(inner_first_vertex, on=inner_id)
        .join(outer_edges, on=outer_id)
    )
    if mode == "convex":
        cross = _cross(F.col("ox1"), F.col("oy1"), F.col("ox2"), F.col("oy2"),
                       F.col("_px"), F.col("_py"))
        return (
            rows.groupBy(outer_id, inner_id)
            .agg(F.min(cross).alias("_m"))
            .where(F.col("_m") >= 0)
            .select(outer_id, inner_id)
        )
    # multiplication-only crossing test: px < (ox2-ox1)*(py-oy1)/(oy2-oy1)+ox1
    # rearranged as (px-ox1)*(oy2-oy1) vs (ox2-ox1)*(py-oy1) with the
    # comparison direction following sign(oy2-oy1) — no division rounding
    # step, so a first vertex extremely close to the outer boundary cannot
    # be misclassified by the quotient's extra ulp. The edge straddles _py
    # (the != guard), so oy2 != oy1 wherever the comparison is evaluated.
    _lhs = (F.col("_px") - F.col("ox1")) * (F.col("oy2") - F.col("oy1"))
    _rhs = (F.col("ox2") - F.col("ox1")) * (F.col("_py") - F.col("oy1"))
    crosses = (
        ((F.col("oy1") > F.col("_py")) != (F.col("oy2") > F.col("_py")))
        & F.when(F.col("oy2") > F.col("oy1"), _lhs < _rhs).otherwise(_lhs > _rhs)
    )
    return (
        rows.groupBy(outer_id, inner_id)
        .agg(F.sum(F.when(crosses, 1).otherwise(0)).alias("_n"))
        .where(F.col("_n") % 2 == 1)
        .select(outer_id, inner_id)
    )


def polygon_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    a_id: str = "a_id",
    b_id: str = "b_id",
    mode: str = "raycast",
) -> DataFrame:
    """→ (a_id, b_id) pairs of intersecting simple polygons.

    mode governs only the CONTAINMENT sub-test: 'convex' (CCW half-plane,
    convex rings) or 'raycast' (crossing parity, any simple ring)."""
    if mode not in ("convex", "raycast"):
        raise ValueError(f"unknown mode {mode!r}")

    cand = _probe.batch_query(
        polys_a.select(F.col(a_id).alias("id"), *BOX),
        polys_b.select(F.col(b_id).alias("qid"), *BOX),
        cfg, "id", "qid",
    ).select(F.col("id").alias(a_id), F.col("qid").alias(b_id))

    a_edges = _edges(polys_a, a_id, "a")
    b_edges = _edges(polys_b, b_id, "b")

    seg = (
        cand.join(a_edges, on=a_id)
        .join(b_edges, on=b_id)
        .where(_segments_intersect())
        .select(a_id, b_id)
        .distinct()
    )

    a_first = polys_a.select(
        a_id,
        F.element_at("ring", 1).x.alias("_px"),
        F.element_at("ring", 1).y.alias("_py"),
    )
    b_first = polys_b.select(
        b_id,
        F.element_at("ring", 1).x.alias("_px"),
        F.element_at("ring", 1).y.alias("_py"),
    )
    oa = _edges(polys_a, a_id, "o")
    ob = _edges(polys_b, b_id, "o")
    # A's vertex inside B (A ⊆ B) and B's vertex inside A (B ⊆ A)
    a_in_b = _contained(cand, ob, a_first, b_id, a_id, mode).select(a_id, b_id)
    b_in_a = _contained(cand, oa, b_first, a_id, b_id, mode).select(a_id, b_id)

    return seg.unionByName(a_in_b).unionByName(b_in_a).distinct()


def polygon_area_centroid(
    polys_df: DataFrame,
    pid: str = "poly_id",
    ring_col: str = "ring",
) -> DataFrame:
    """Shoelace signed area + centroid for simple polygons — the
    ST_Area / ST_Centroid pair, EXACT when ring coordinates are
    integers (quantize doubles to a fixed-point grid first; the gated
    entry uses milli-units, where the fixture recipes are integral):

      area2 = sum_i cross_i               (2x signed area; CCW > 0)
      cx6   = sum_i (x_i + x_{i+1}) * cross_i   (6 * area * centroid_x)
      cy6   = sum_i (y_i + y_{i+1}) * cross_i
      with cross_i = x_i * y_{i+1} - x_{i+1} * y_i, indices mod n

    so centroid = (cx6 / (3 * area2), cy6 / (3 * area2)) — returned as
    the integer numerators plus area2, divisions left to the caller so
    every row hash-gates.

    Scale shape: zero joins, zero shuffles — one sequential
    higher-order-function fold per row (F.aggregate over the ring,
    whole-stage codegen). A billion small polygons cost a map-only
    stage.

    → (pid, n_verts, area2, cx6, cy6)."""
    ring = F.col(ring_col)
    n = F.size(ring)

    def vx(i):
        return F.element_at(ring, i + 1)["x"].cast("long")

    def vy(i):
        return F.element_at(ring, i + 1)["y"].cast("long")

    def cross(i):
        j = (i + 1) % n
        return vx(i) * vy(j) - vx(j) * vy(i)

    idx = F.sequence(F.lit(0), n - 1)

    def fold(term):
        return F.aggregate(
            F.transform(idx, term), F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    return polys_df.select(
        F.col(pid),
        n.cast("int").alias("n_verts"),
        fold(cross).alias("area2"),
        fold(lambda i: (vx(i) + vx((i + 1) % n)) * cross(i)).alias("cx6"),
        fold(lambda i: (vy(i) + vy((i + 1) % n)) * cross(i)).alias("cy6"),
    )


def _hull_of(pts: list) -> list:
    """Andrew monotone chain over exact Python ints — STRICT vertices
    only (collinear boundary points popped by the <= 0 turn test),
    returned in CCW order. Duplicates collapse via the sorted set."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def half(seq):
        h: list = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]


def convex_hull(
    points_df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Exact convex hull of an integer point set (PostGIS
    ``ST_ConvexHull`` / scipy ``ConvexHull``): the DISTINCT strict hull
    vertices — points not expressible as a convex combination of the
    others, collinear boundary points dropped. Every turn test is an
    integer cross product (arbitrary-precision Python ints in the
    chain, long columns in the prune), so the vertex set is exact and
    hash-gateable.

    Scale shape (Akl-Toussaint prune + two-level monotone chain):
      1. ONE map-side-combinable aggregate finds the 8 directional
         extremes (argmax of x, y, x±y and their minima via struct-max,
         ties broken lexicographically — deterministic), an 8-value
         driver literal;
      2. points STRICTLY inside the extreme octagon are dropped with
         pure-JVM half-plane tests — for non-adversarial data this
         eliminates almost everything; all-points-on-a-circle degrades
         to "no pruning", never to a wrong answer;
      3. survivors run a per-partition monotone chain (mapInPandas,
         Arrow-batched) emitting each partition's local hull — a
         superset of the global hull's vertices;
      4. the union of local hulls coalesces to ONE small partition for
         the final chain. No driver .collect() of point data anywhere.

    → DataFrame (x, y) long rows, one per strict hull vertex
    (unordered set semantics — order vertices downstream if needed)."""
    import pandas as pd

    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    pts = points_df.select(x.alias("x"), y.alias("y"))
    dirs = [(1, 0), (1, 1), (0, 1), (-1, 1),
            (-1, 0), (-1, -1), (0, -1), (1, -1)]
    row = pts.agg(*[
        F.max(F.struct(
            (F.lit(dx) * F.col("x") + F.lit(dy) * F.col("y")).alias("d"),
            F.col("x").alias("x"), F.col("y").alias("y"),
        )).alias(f"e{i}")
        for i, (dx, dy) in enumerate(dirs)
    ]).first()
    schema = "x long, y long"
    if row is None or row["e0"] is None:
        return pts.sparkSession.createDataFrame([], schema)
    octagon = _hull_of([
        (int(row[f"e{i}"]["x"]), int(row[f"e{i}"]["y"]))
        for i in range(len(dirs))
    ])
    if len(octagon) >= 3:
        # strictly inside EVERY CCW edge's left half-plane -> prunable
        inside = F.lit(True)
        for (ax, ay), (bx, by) in zip(octagon, octagon[1:] + octagon[:1]):
            inside = inside & (
                (F.lit(bx - ax) * (F.col("y") - F.lit(ay))
                 - F.lit(by - ay) * (F.col("x") - F.lit(ax))) > 0
            )
        pts = pts.where(~inside)

    def chain(batches):
        acc: list = []
        for pdf in batches:
            acc.extend(zip(pdf["x"].tolist(), pdf["y"].tolist()))
        h = _hull_of([(int(a), int(b)) for a, b in acc])
        if h:
            yield pd.DataFrame({"x": [p[0] for p in h],
                                "y": [p[1] for p in h]})

    local = pts.mapInPandas(chain, schema)
    return local.coalesce(1).mapInPandas(chain, schema)


def hull_diameter(
    points_df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Farthest pair / set diameter (PostGIS ``ST_MaxDistance``): the
    maximum squared Euclidean distance between any two points of the
    set, with the achieving pair. The diameter of a set equals the
    diameter of its convex hull, so the heavy lifting is convex_hull's
    prune+chain; the quadratic pass runs on the TINY hull-vertex frame
    only — never on the input cloud. Integer-exact d2 (long), so the
    result hash-gates.

    Deterministic tie-break: among maximal-d2 pairs, the one with the
    lexicographically smallest (x1, y1, x2, y2); pairs are oriented
    (x1, y1) < (x2, y2).

    → ONE row (x1, y1, x2, y2, d2); empty if the set has < 2 distinct
    points."""
    h = convex_hull(points_df, x_col, y_col)
    a = h.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = h.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = a.crossJoin(b).where(
        (F.col("x1") < F.col("x2"))
        | ((F.col("x1") == F.col("x2")) & (F.col("y1") < F.col("y2")))
    )
    dx, dy = F.col("x1") - F.col("x2"), F.col("y1") - F.col("y2")
    best = pairs.select(
        F.struct(
            (-(dx * dx + dy * dy)).alias("nd2"),
            "x1", "y1", "x2", "y2",
        ).alias("s")
    ).agg(F.min("s").alias("s"))
    return best.where(F.col("s").isNotNull()).select(
        F.col("s.x1").alias("x1"), F.col("s.y1").alias("y1"),
        F.col("s.x2").alias("x2"), F.col("s.y2").alias("y2"),
        (-F.col("s.nd2")).cast("long").alias("d2"),
    )


def union_area(
    boxes: DataFrame,
    group_col: str | None = None,
    scale: int = 1000,
    cell_units: int = 16_000,
) -> DataFrame:
    """Exact dissolved-union area of axis-aligned boxes (the measure side
    of PostGIS ``ST_Union`` / ``ST_Area``), per group -> one row
    (gkey, area_units, area). Overlaps counted once, no rasterization,
    no approximation.

    All arithmetic runs on fixed-point integers (coords x ``scale``
    must be integral — the engine's corpora are 1/1000 rationals), so
    every sum is order-free and the result hash-gates bit-for-bit.
    ``area_units`` is in 1/scale^2 units; ``area`` divides once at the
    very end.

    Plan, 100% JVM (window functions, zero Python):

      1. clip each box to the integer cells it covers (measure is
         additive over a partition of the plane, so per-cell unions sum
         to the global union);
      2. per (group, cell): x-slab decomposition — slab boundaries are
         the distinct clipped xmin/xmax, adjacent pairs via ``lead``;
      3. slab x boxes covering it (equi-join on (group, cell) + range
         predicate — cell granularity bounds the fan-out, hot cells ride
         AQE skew-split like every other cell join in the engine);
      4. y-interval merge per slab: classic gaps-and-islands — running
         ``max(ymax)`` over the (ymin, ymax, id) order, a new island
         wherever ymin exceeds it; islands are contiguous by
         construction so each contributes (x2-x1)*(max ymax - min ymin);
      5. one exact integer sum per group.

    Shuffles: the slab distinct, the (group, cell) join, and the final
    group agg — the two (group, cell)-keyed windows reuse the join's
    partitioning (hashpartitioning on a prefix satisfies the clustered
    distribution). At 10^12 scale the cell grid is the same partitioner
    the spatial join uses; ``cell_units`` tunes slab fan-out (a slab
    row costs O(#boxes overlapping the cell))."""
    from pyspark.sql import Window

    gkey = (
        F.col(group_col).cast("long") if group_col is not None else F.lit(0)
    ).alias("gkey")
    cu = F.lit(int(cell_units))
    scaled = boxes.select(
        gkey,
        F.round(F.col("xmin") * scale).cast("long").alias("x0"),
        F.round(F.col("ymin") * scale).cast("long").alias("y0"),
        F.round(F.col("xmax") * scale).cast("long").alias("x1"),
        F.round(F.col("ymax") * scale).cast("long").alias("y1"),
    ).where((F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0")))
    ix = F.explode(
        F.sequence(F.floor(F.col("x0") / cu), F.floor((F.col("x1") - 1) / cu))
    ).alias("cx")
    iy = F.explode(
        F.sequence(F.floor(F.col("y0") / cu), F.floor((F.col("y1") - 1) / cu))
    ).alias("cy")
    clipped = (
        scaled.select("*", ix)
        .select("*", iy)
        .select(
            "gkey",
            (F.col("cx") * F.lit(1 << 21) + F.col("cy")).alias("cell"),
            F.greatest(F.col("x0"), F.col("cx") * cu).alias("bx0"),
            F.least(F.col("x1"), (F.col("cx") + 1) * cu).alias("bx1"),
            F.greatest(F.col("y0"), F.col("cy") * cu).alias("by0"),
            F.least(F.col("y1"), (F.col("cy") + 1) * cu).alias("by1"),
        )
    )
    xs = (
        clipped.select("gkey", "cell", F.col("bx0").alias("sx"))
        .unionByName(clipped.select("gkey", "cell", F.col("bx1").alias("sx")))
        .distinct()
    )
    w_slab = Window.partitionBy("gkey", "cell").orderBy("sx")
    slabs = xs.select(
        "gkey", "cell", F.col("sx").alias("sx1"),
        F.lead("sx").over(w_slab).alias("sx2"),
    ).where(F.col("sx2").isNotNull())
    active = slabs.join(clipped, on=["gkey", "cell"]).where(
        (F.col("bx0") <= F.col("sx1")) & (F.col("bx1") >= F.col("sx2"))
    )
    w_prev = (
        Window.partitionBy("gkey", "cell", "sx1")
        .orderBy("by0", "by1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("gkey", "cell", "sx1")
        .orderBy("by0", "by1")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = active.withColumn(
        "_new",
        F.when(
            F.col("by0") > F.coalesce(F.max("by1").over(w_prev), F.lit(-(1 << 62))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("_new").over(w_run))
    islands = marked.groupBy("gkey", "cell", "sx1", "sx2", "island").agg(
        F.min("by0").alias("iy0"), F.max("by1").alias("iy1")
    )
    per_group = islands.groupBy("gkey").agg(
        F.sum(
            (F.col("sx2") - F.col("sx1")) * (F.col("iy1") - F.col("iy0"))
        ).alias("area_units")
    )
    return per_group.select(
        "gkey",
        "area_units",
        (F.col("area_units").cast("double") / float(scale * scale)).alias("area"),
    )
