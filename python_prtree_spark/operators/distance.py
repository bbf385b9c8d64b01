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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig, Extent
from python_prtree_spark.operators import probe as _probe

__all__ = ["distance_join", "geo_distance_join", "geo_distance_pairs",
           "geo_knn_join", "ripley_k"]

BOX = ["xmin", "ymin", "xmax", "ymax"]

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


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
        query_id, "_px", "_py",
        (F.col("_px") - r).alias("xmin"), (F.col("_py") - r).alias("ymin"),
        (F.col("_px") + r).alias("xmax"), (F.col("_py") + r).alias("ymax"),
    )
    dx = F.greatest(F.col("xmin") - F.col("_px"), F.col("_px") - F.col("xmax"), F.lit(0.0))
    dy = F.greatest(F.col("ymin") - F.col("_py"), F.col("_py") - F.col("ymax"), F.lit(0.0))
    dist2 = dx * dx + dy * dy
    out_cols = [
        query_id, data_id,
        F.floor(dist2 * F.lit(1e6)).cast("long").alias("dist2_q"),
    ]
    cand, n_data = _probe.batch_query_payload(
        data_df.select(data_id, *BOX), squares, cfg, data_id, query_id,
        n_data_hint=n_data_hint, q_payload=["_px", "_py"],
    )
    if cand is not None:
        # fused 'sql'-strategy path: the cell equi-join already carries the
        # data box AND the probe point — refine in place, zero extra joins
        # (the probe coords ride the join untouched, so dist2 is the same
        # IEEE sequence as the join-back form below)
        return cand.where(dist2 <= F.lit(r * r)).select(*out_cols)
    cand = _probe.batch_query(
        data_df.select(data_id, *BOX), squares.drop("_px", "_py"), cfg,
        data_id, query_id, n_data_hint=n_data,
    )
    return (
        cand.join(data_df.select(data_id, *BOX), on=data_id)
        .join(pts, on=query_id)
        .where(dist2 <= F.lit(r * r))
        .select(*out_cols)
    )


GEO_CFG = EngineConfig(extent=Extent(-180.0, -90.0, 180.0, 90.0), level=4)


def geo_distance_join(
    data_df: DataFrame,
    probes_df: DataFrame,
    radius_km: float,
    cfg: EngineConfig = GEO_CFG,
    data_id: str = "id",
    query_id: str = "qid",
    lng: str = "lng",
    lat: str = "lat",
    n_data_hint: int | None = None,
) -> DataFrame:
    """Geodesic within-distance join (ST_DWithin on the sphere): for every
    (probe point, data point) pair of lng/lat coordinates whose HAVERSINE
    great-circle distance is <= radius_km, emit (qid, id, dist_m) with the
    distance in integer meters (floor(d_km * 1000) — fixed point keeps the
    cross-engine value compare away from float printing, same trick as
    distance_join's dist2_q).

    Distributed plan — the planar machinery reused on the lng/lat grid,
    exactly ONE spatial shuffle:

      1. each probe expands to a latitude window of +-degrees(sigma)
         (|delta_phi| <= central angle sigma = r/R on the sphere) and an
         ADAPTIVE longitude window: from the haversine identity
         sin^2(sigma/2) >= cos(phi1) cos(phi2) sin^2(delta_lambda/2) and
         |phi2| <= |phi1| + sigma,

             delta_lambda <= 2 asin(min(1, sin(sigma/2) / cos(min(|phi1|
                             + sigma, pi/2))))

         — the window widens toward the poles (degenerating to the full
         parallel when the cap touches a pole) instead of a global
         worst-case width. A small multiplicative+absolute margin guards
         the bound against libm ulp error; the exact refine is the
         arbiter, so margins only add candidates, never results.
      2. windows crossing the antimeridian split into (at most) two
         DISJOINT [-180, 180] intervals — wrap pairs survive with no
         duplicate candidates — and route through the same
         cell-partitioned ``batch_query`` (PBSM single shuffle, packed
         kernel, hot-cell salting) against the data points as degenerate
         boxes.
      3. exact JVM refine: the full haversine (radians/sin/cos/asin/sqrt
         column expressions — whole-stage codegen, bit-identical in
         DuckDB), closed predicate d <= radius_km. The haversine's
         sin^2(delta_lambda/2) is 2pi-periodic, so raw longitude
         differences near 360 degrees refine correctly without
         normalization.

    Reference contrast: the reference is planar-only (core.py boxes);
    this is the north-rule geographic twin of distance_join, sharing its
    join kernel end-to-end.
    """
    r = float(radius_km)
    if not (r >= 0.0):  # also rejects NaN
        raise ValueError(f"radius_km must be >= 0, got {radius_km!r}")
    sigma = r / EARTH_RADIUS_KM  # central angle, radians
    dphi_deg = math.degrees(sigma) * 1.0000001 + 1e-9
    s_half = math.sin(sigma / 2.0)

    pts = probes_df.select(
        query_id, F.col(lng).alias("_plng"), F.col(lat).alias("_plat")
    )
    cos_min = F.cos(
        F.least(F.radians(F.abs(F.col("_plat"))) + F.lit(sigma), F.lit(math.pi / 2))
    )
    dlam = (
        F.degrees(F.lit(2.0) * F.asin(F.least(F.lit(1.0), F.lit(s_half) / cos_min)))
        * F.lit(1.0000001) + F.lit(1e-9)
    )
    w = pts.select(
        query_id, "_plng", "_plat",
        (F.col("_plng") - dlam).alias("_a"),
        (F.col("_plng") + dlam).alias("_b"),
        (dlam >= 180.0).alias("_full"),
    )
    seg1_x0 = F.when(F.col("_full"), F.lit(-180.0)).otherwise(
        F.greatest(F.col("_a"), F.lit(-180.0))
    )
    seg1_x1 = F.when(F.col("_full"), F.lit(180.0)).otherwise(
        F.least(F.col("_b"), F.lit(180.0))
    )
    # wrap leftovers (disjoint from seg1 by construction: _a < -180 and
    # _b > 180 together imply _full, so at most one side wraps)
    seg2_x0 = F.when(~F.col("_full") & (F.col("_a") < -180.0), F.col("_a") + 360.0) \
        .when(~F.col("_full") & (F.col("_b") > 180.0), F.lit(-180.0))
    seg2_x1 = F.when(~F.col("_full") & (F.col("_a") < -180.0), F.lit(180.0)) \
        .when(~F.col("_full") & (F.col("_b") > 180.0), F.col("_b") - 360.0)
    segs = w.select(
        query_id, "_plng", "_plat",
        F.explode(F.array(
            F.struct(seg1_x0.alias("x0"), seg1_x1.alias("x1")),
            F.struct(seg2_x0.alias("x0"), seg2_x1.alias("x1")),
        )).alias("_s"),
    ).where(F.col("_s.x0").isNotNull())
    squares = segs.select(
        query_id, "_plng", "_plat",
        F.col("_s.x0").alias("xmin"),
        (F.col("_plat") - dphi_deg).alias("ymin"),
        F.col("_s.x1").alias("xmax"),
        (F.col("_plat") + dphi_deg).alias("ymax"),
    )
    dpts = data_df.select(
        data_id, F.col(lng).alias("_dlng"), F.col(lat).alias("_dlat")
    )
    dboxes = dpts.select(
        data_id,
        F.col("_dlng").alias("xmin"), F.col("_dlat").alias("ymin"),
        F.col("_dlng").alias("xmax"), F.col("_dlat").alias("ymax"),
    )
    # exact haversine refine — expression order mirrors the SQL oracle
    sdphi = F.sin((F.radians("_dlat") - F.radians("_plat")) / F.lit(2.0))
    sdlam = F.sin((F.radians("_dlng") - F.radians("_plng")) / F.lit(2.0))
    h = sdphi * sdphi \
        + F.cos(F.radians("_plat")) * F.cos(F.radians("_dlat")) * sdlam * sdlam
    dkm = F.lit(2.0) * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(F.lit(1.0), h)))
    out_cols = [
        query_id, data_id,
        F.floor(F.col("_dkm") * F.lit(1000.0)).cast("long").alias("dist_m"),
    ]
    fused, n_data = _probe.batch_query_payload(
        dboxes, squares, cfg, data_id, query_id, n_data_hint=n_data_hint,
        q_payload=["_plng", "_plat"],
    )
    if fused is not None:
        # fused 'sql'-strategy path: the data point IS its degenerate box
        # (xmin == lng, ymin == lat, pure aliasing — identical bits), and
        # the probe coords ride the cell join — zero join-backs, same
        # haversine expression over the same doubles
        return (
            fused.select(
                query_id, data_id, "_plng", "_plat",
                F.col("xmin").alias("_dlng"), F.col("ymin").alias("_dlat"),
            )
            .withColumn("_dkm", dkm)
            .where(F.col("_dkm") <= F.lit(r))
            .select(*out_cols)
        )
    cand = _probe.batch_query(
        dboxes, squares.drop("_plng", "_plat"), cfg, data_id, query_id,
        n_data_hint=n_data,
    )
    return (
        cand.join(dpts, on=data_id)
        .join(pts, on=query_id)
        .withColumn("_dkm", dkm)
        .where(F.col("_dkm") <= F.lit(r))
        .select(*out_cols)
    )


def geo_distance_pairs(
    points_df: DataFrame,
    radius_km: float,
    cfg: EngineConfig = GEO_CFG,
    id_col: str = "id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Geodesic self-join (the query_intersections twin of
    geo_distance_join): every unordered pair of points within ``radius_km``
    great-circle distance, emitted once as (id_a < id_b, dist_m).

    Plan: the probe side IS the data side — same adaptive windows,
    antimeridian split and haversine refine; the id ordering both
    deduplicates the symmetric pair and drops self-matches. Candidate
    volume is the same as the probe join's (each unordered pair appears
    at most twice pre-filter), so no extra machinery is needed."""
    out = geo_distance_join(
        points_df, points_df.select(
            F.col(id_col).alias("_qid_self"),
            F.col(lng).alias(lng), F.col(lat).alias(lat),
        ),
        radius_km, cfg, data_id=id_col, query_id="_qid_self",
        lng=lng, lat=lat,
    )
    return out.where(F.col("_qid_self") < F.col(id_col)).select(
        F.col("_qid_self").alias("id_a"), F.col(id_col).alias("id_b"), "dist_m"
    )


_HALF_CIRCUMFERENCE_KM = 20100.0  # > pi * R: a radius covering the sphere


def geo_knn_join(
    data_df: DataFrame,
    probes_df: DataFrame,
    k: int,
    initial_radius_km: float = 1000.0,
    cfg: EngineConfig = GEO_CFG,
    data_id: str = "id",
    query_id: str = "qid",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """k-nearest-neighbour join on the sphere: for every probe point the
    k geodesically closest data points, ranked 1..k by (integer-meter
    haversine distance, data id) — ranking on the QUANTIZED distance
    makes the order and the k-boundary engine-independent.

    Expanding-radius rounds with an exactness certificate (the geodesic
    twin of knn_join's radius fallback, operators/knn.py): round i runs
    ``geo_distance_join`` at radius r_i = initial·4^i (capped at a
    sphere-covering radius). A probe RESOLVES in the first round where it
    has >= k in-radius candidates — the certificate: if >= k points lie
    within r, the true k nearest all lie within r, and the within-r join
    returns EVERY such point, so its top-k is exact. Unresolved probes
    (fewer than k neighbours found) carry to the next, wider round; the
    final sphere-covering round resolves everything, emitting fewer than
    k rows only when the data table itself has fewer than k points.

    Scale shape: each round is ONE spatial shuffle over the REMAINING
    probes only (resolved probes leave via an anti-join), and candidate
    volume per probe is bounded by the local density at the smallest
    sufficient radius — never an all-pairs pass except for the leftover
    probes of the last round. Probe frames are localCheckpoint-ed per
    round so the loop's plan does not grow.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = float(initial_radius_km)
    if not (r > 0.0):
        raise ValueError(f"initial_radius_km must be > 0, got {initial_radius_km!r}")
    from pyspark.sql import Window

    pts = probes_df.select(query_id, lng, lat).localCheckpoint(eager=False)
    out = None
    while True:
        r = min(r, _HALF_CIRCUMFERENCE_KM)
        cand = geo_distance_join(
            data_df, pts, r, cfg, data_id=data_id, query_id=query_id,
            lng=lng, lat=lat,
        )
        w = Window.partitionBy(query_id).orderBy("dist_m", data_id)
        ranked = cand.withColumn("rank", F.row_number().over(w))
        if r >= _HALF_CIRCUMFERENCE_KM:
            resolved = ranked.where(F.col("rank") <= k)
        else:
            # no broadcast HINT: `full` is probe-bounded but probes can be
            # arbitrarily many — AQE broadcasts it when it is actually small
            full = ranked.where(F.col("rank") == k).select(query_id)
            resolved = ranked.where(F.col("rank") <= k).join(
                full, on=query_id, how="left_semi"
            )
        resolved = resolved.select(
            query_id, data_id, "dist_m", F.col("rank").cast("int").alias("rank")
        ).localCheckpoint(eager=True)
        out = resolved if out is None else out.unionByName(resolved)
        if r >= _HALF_CIRCUMFERENCE_KM:
            return out
        pts = pts.join(
            resolved.select(query_id).distinct(), on=query_id, how="left_anti"
        ).localCheckpoint(eager=True)
        if pts.isEmpty():
            return out
        r *= 4.0


def ripley_k(
    points_df: DataFrame,
    radii: list,
    cfg: EngineConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Ripley's K-function numerators (spatstat ``Kest`` — the classic
    spatial point-pattern clustering statistic): for each radius r of an
    increasing ladder, the number of ORDERED pairs (i, j), i != j, with
    Euclidean distance <= r. Coordinates are integers, distances are
    compared as exact long d^2 vs r^2 — no float, so the counts
    hash-gate; downstream K(r) = area * n_pairs / (n * (n-1)) is the
    caller's one float division.

    Scale shape: ONE cell-routed spatial join at the LARGEST radius
    (degenerate point boxes through batch_query — inherits packed/sql
    routing and hot-cell salting), the exact d^2 filter and min-radius
    bucketing ride the same rows, then a <=len(radii)-row groupBy and a
    tiny cumulative window. No pair materializes beyond r_max, and no
    per-radius rescan.

    → (radius, n_pairs) long rows, cumulative, one per ladder radius."""
    rs = [int(r) for r in radii]
    if not rs or any(b <= a for a, b in zip(rs, rs[1:])) or rs[0] <= 0:
        raise ValueError("radii must be a strictly increasing positive ladder")
    rmax = float(rs[-1])
    pts = points_df.select(
        F.col(id_col).alias("_pid"),
        F.col(x).cast("long").alias("_x"),
        F.col(y).cast("long").alias("_y"),
    )
    data = pts.select(
        F.col("_pid").alias("id"),
        F.col("_x").cast("double").alias("xmin"),
        F.col("_y").cast("double").alias("ymin"),
        F.col("_x").cast("double").alias("xmax"),
        F.col("_y").cast("double").alias("ymax"),
    )
    probes = pts.select(
        F.col("_pid").alias("qid"),
        (F.col("_x").cast("double") - rmax).alias("xmin"),
        (F.col("_y").cast("double") - rmax).alias("ymin"),
        (F.col("_x").cast("double") + rmax).alias("xmax"),
        (F.col("_y").cast("double") + rmax).alias("ymax"),
    )
    cand = _probe.batch_query(data, probes, cfg, "id", "qid").where(
        F.col("id") != F.col("qid")
    )
    a = pts.select(F.col("_pid").alias("qid"), F.col("_x").alias("_ax"),
                   F.col("_y").alias("_ay"))
    b = pts.select(F.col("_pid").alias("id"), F.col("_x").alias("_bx"),
                   F.col("_y").alias("_by"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    d2 = (dx * dx + dy * dy).alias("_d2")
    # smallest ladder index whose r^2 covers the pair (exact long compare)
    bucket = F.lit(None).cast("int")
    for i, r in reversed(list(enumerate(rs))):
        bucket = F.when(F.col("_d2") <= F.lit(r * r), F.lit(i)).otherwise(bucket)
    per = (
        cand.join(a, on="qid").join(b, on="id")
        .select(d2)
        .where(F.col("_d2") <= F.lit(rs[-1] * rs[-1]))
        .select(bucket.alias("_k"))
        .groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
    )
    ladder = points_df.sparkSession.createDataFrame(
        [(i, r) for i, r in enumerate(rs)], "_k int, radius long"
    )
    w = Window.orderBy("_k").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    return (
        ladder.join(per, on="_k", how="left")
        .select("_k", "radius", F.coalesce("_n", F.lit(0)).alias("_n"))
        .select("radius", F.sum("_n").over(w).cast("long").alias("n_pairs"))
    )
