"""Trajectory analytics over point streams — north-rule extension: given
timestamped lng/lat pings per entity, compute per-entity movement
statistics (hop count, total/max great-circle hop length) — the standard
GPS-track summarization op (movingpandas / ST_MakeLine+ST_Length shape).

Plan: ONE shuffle on the entity key; within each partition a window
ordered by (ts, ping id) pairs every ping with its predecessor (lag), the
haversine hop length evaluates as pure JVM column arithmetic, and each
hop is quantized to integer meters BEFORE the per-entity sum — long
addition is order-independent, so the aggregate is partitioning-proof
and exactly oracle-gateable (same fixed-point trick as
distance_join/area_weighted_transfer).

Skew note: entities are users/devices — the per-key row count is bounded
by one entity's ping history, not the corpus; a power-law hot entity
still fits a task since the window is a single linear pass. No Python
anywhere in the plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.operators.distance import EARTH_RADIUS_KM

__all__ = [
    "trajectory_stats",
    "od_matrix",
    "trajectory_simplify",
    "trajectory_hausdorff_join",
]


def trajectory_simplify(
    pings_df: DataFrame,
    epsilon_m: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
    units: str = "meters",
) -> DataFrame:
    """Douglas–Peucker track simplification — the compaction step every
    mobility pipeline runs before storing/serving GPS tracks (movingpandas
    ``MinDistanceGeneralizer`` / PostGIS ``ST_Simplify`` shape): per
    entity, drop pings whose perpendicular deviation from the kept
    polyline is under ``epsilon_m`` meters.

    Geometry: each entity's track is projected once into a local
    equirectangular frame (meters east/north of its first ping, the
    standard small-track approximation: x = Δlng·cos(lat₀), y = Δlat,
    both scaled by meters-per-degree), and classic stack-based DP runs on
    that plane. Endpoints are always kept; ``epsilon_m = 0`` keeps every
    ping that is not exactly collinear.

    ``units`` picks the geometry frame:

    - ``"meters"`` (default): the equirectangular meter frame above;
      float math, tolerance in meters.
    - ``"coords"``: raw coordinate space (the PostGIS ``ST_Simplify``
      convention — tolerance in layer units, here DEGREES), with
      coordinates quantized to integer MICRODEGREES and every keep/drop
      decision made on exact int64 cross products compared through
      shared IEEE-double expressions. That makes the kept set
      bit-reproducible across engines (numpy vs a SQL oracle evaluating
      the identical expressions), which is what lets the driver
      hash-gate this operator; the quantization error (≤ 0.11 m) is far
      below any useful tolerance.

    Scale shape: identical to trajectory_stats — ONE shuffle on the
    entity key; each group is one entity's task-sized history, processed
    by an Arrow-batched applyInPandas kernel whose per-segment distance
    math is vectorized numpy (the stack recursion is O(track length) in
    the worst case, per entity, in one task). No driver involvement.

    → the kept pings: (entity, ts, id, lng, lat), sorted order NOT
    guaranteed (it's a DataFrame)."""
    import numpy as np
    import pandas as pd

    if epsilon_m < 0:
        raise ValueError(f"epsilon_m must be >= 0, got {epsilon_m}")
    if units not in ("meters", "coords"):
        raise ValueError(f"units must be 'meters' or 'coords', got {units!r}")
    m_per_deg = EARTH_RADIUS_KM * 1000.0 * math.pi / 180.0
    # shared-literal discipline: the oracle embeds repr() of this exact
    # product, so both sides compare against the identical double
    eps2 = (epsilon_m * 1e6) * (epsilon_m * 1e6)

    def simplify_coords(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", id_col], kind="stable").reset_index(
            drop=True)
        n = len(pdf)
        if n <= 2:
            return pdf.drop(columns=["_us"])
        # integer microdegrees; floor(v*1e6 + 0.5) is round-half-up in
        # BOTH numpy and SQL (never Python round(): banker's rounding)
        x = np.floor(pdf[lng].to_numpy() * 1e6 + 0.5).astype(np.int64)
        y = np.floor(pdf[lat].to_numpy() * 1e6 + 0.5).astype(np.int64)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            seg = slice(a + 1, b)
            dx = int(x[b]) - int(x[a])
            dy = int(y[b]) - int(y[a])
            L2 = dx * dx + dy * dy  # ≤ ~2.6e17, exact in int64
            if L2 == 0:
                # degenerate chord: deviation = distance to the point
                score = (x[seg] - x[a]) ** 2 + (y[seg] - y[a]) ** 2
                i = int(np.argmax(score))  # ties → first, as the oracle
                split = float(score[i]) > eps2
            else:
                # |cross| orders deviations exactly (sqrt(L2) is a
                # per-segment constant); the threshold test squares the
                # chosen |cross| in doubles — the oracle's expression
                score = np.abs(dy * (x[seg] - x[a]) - dx * (y[seg] - y[a]))
                i = int(np.argmax(score))
                split = float(score[i]) * float(score[i]) > eps2 * float(L2)
            if split:
                m = a + 1 + i
                keep[m] = True
                stack.append((a, m))
                stack.append((m, b))
        return pdf[keep].drop(columns=["_us"])

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", id_col], kind="stable").reset_index(
            drop=True)
        n = len(pdf)
        if n <= 2:
            return pdf.drop(columns=["_us"])
        lat0 = float(pdf[lat].iloc[0])
        x = (pdf[lng].to_numpy() - float(pdf[lng].iloc[0])) \
            * math.cos(math.radians(lat0)) * m_per_deg
        y = (pdf[lat].to_numpy() - lat0) * m_per_deg
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            seg = slice(a + 1, b)
            dx, dy = x[b] - x[a], y[b] - y[a]
            L2 = dx * dx + dy * dy
            if L2 == 0.0:
                d = np.hypot(x[seg] - x[a], y[seg] - y[a])
            else:
                # perpendicular distance to the INFINITE line a-b (the
                # classic DP criterion)
                d = np.abs(dy * (x[seg] - x[a]) - dx * (y[seg] - y[a])) \
                    / math.sqrt(L2)
            i = int(np.argmax(d))
            if d[i] > epsilon_m:
                m = a + 1 + i
                keep[m] = True
                stack.append((a, m))
                stack.append((m, b))
        return pdf[keep].drop(columns=["_us"])

    if units == "coords":
        simplify = simplify_coords

    prepped = pings_df.select(
        F.col(entity_col),
        F.col(ts_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(lng), F.col(lat),
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in prepped.schema.fields if f.name != "_us"
    )
    return prepped.groupBy(entity_col).applyInPandas(simplify, schema=schema)


def od_matrix(
    pings_df: DataFrame,
    zoom: int,
    period_sec: int = 86400,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Origin–destination flow matrix — the trip-table primitive of
    transport/mobility analytics (OD matrices in GTFS/telco studies):
    per (entity, period) the FIRST ping's tile is the origin and the
    LAST ping's tile the destination (ordered by (ts, id) — the id
    breaks timestamp ties deterministically), then trips aggregate into
    per-(origin, destination) flow counts.

    Plan: ONE shuffle on the (entity, period) trip key — both the
    row_number and the per-trip count ride the same window sort — then
    one map-side-combined groupBy on the O/D cell pair. Same skew
    posture as trajectory_stats: a trip's row count is one entity's
    pings per period, never corpus-scale; hot O/D cell pairs are
    aggregation skew, which partial aggregation absorbs.

    → (o_tx, o_ty, d_tx, d_ty, flows) — slippy tiles at ``zoom``;
    flows = number of (entity, period) trips (long)."""
    from python_prtree_spark.functions.geo import lnglat_tile_cols

    if period_sec <= 0:
        raise ValueError(f"period_sec must be positive, got {period_sec}")
    tx, ty = lnglat_tile_cols(F.col(lng), F.col(lat), zoom)
    period = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(int(period_sec) * 1_000_000)
        )
    ).cast("long")
    w = Window.partitionBy("_e", "_p").orderBy("_ts", "_id")
    wall = Window.partitionBy("_e", "_p")
    rows = (
        pings_df.select(
            F.col(entity_col).alias("_e"),
            period.alias("_p"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            tx.alias("_tx"),
            ty.alias("_ty"),
        )
        .select(
            "_e", "_p", "_tx", "_ty",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(wall).alias("_n"),
        )
    )
    trips = rows.groupBy("_e", "_p").agg(
        F.min(F.when(F.col("_rn") == 1, F.col("_tx"))).alias("o_tx"),
        F.min(F.when(F.col("_rn") == 1, F.col("_ty"))).alias("o_ty"),
        F.min(F.when(F.col("_rn") == F.col("_n"), F.col("_tx"))).alias("d_tx"),
        F.min(F.when(F.col("_rn") == F.col("_n"), F.col("_ty"))).alias("d_ty"),
    )
    return (
        trips.groupBy("o_tx", "o_ty", "d_tx", "d_ty")
        .agg(F.count(F.lit(1)).cast("long").alias("flows"))
    )


def trajectory_stats(
    pings_df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """→ (entity, n_pings, n_hops, total_m, max_m): pings ordered by
    (ts, id) — the id breaks timestamp ties deterministically — with each
    consecutive pair contributing one haversine hop in integer meters
    (floor(d_km * 1000)). Entities with a single ping report 0 hops."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    plng, plat = F.lag(lng).over(w), F.lag(lat).over(w)
    sdphi = F.sin((F.radians(lat) - F.radians(plat)) / F.lit(2.0))
    sdlam = F.sin((F.radians(lng) - F.radians(plng)) / F.lit(2.0))
    h = sdphi * sdphi \
        + F.cos(F.radians(plat)) * F.cos(F.radians(lat)) * sdlam * sdlam
    dkm = F.lit(2.0) * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(F.lit(1.0), h)))
    hop_m = F.floor(dkm * F.lit(1000.0)).cast("long")
    hops = pings_df.select(
        F.col(entity_col).alias("entity"),
        F.when(plat.isNotNull(), hop_m).alias("_hop"),
    )
    return hops.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count("_hop").alias("n_hops"),
        F.coalesce(F.sum("_hop"), F.lit(0)).cast("long").alias("total_m"),
        F.coalesce(F.max("_hop"), F.lit(0)).cast("long").alias("max_m"),
    )


def trajectory_hausdorff_join(
    pings_df: DataFrame,
    tau_deg: float,
    entity_col: str = "user_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Trajectory-similarity self-join: entity pairs whose point sets
    are within symmetric discrete Hausdorff distance ``tau_deg`` — the
    similarity predicate of trajectory clustering / carpool detection /
    map-matching QA pipelines (PostGIS ``ST_HausdorffDist``,
    movingpandas ``TrajectoryCollection`` similarity).

    Geometry is the units='coords' planar frame of trajectory_simplify:
    integer microdegrees, exact int64 squared distances, thresholds
    evaluated through shared IEEE-double expressions — so results
    hash-gate against a SQL oracle.

    Distributed shape (the dedup candidate→verify discipline):

    1. distinct (entity, x, y) points — exact-duplicate collapse, the
       same degenerate-skew guard as embedding_near_dup's;
    2. per-entity bbox (one groupBy; entities ≪ pings, so the bbox
       frame is a broadcast-sized dim);
    3. candidate pairs by the NECESSARY condition H ≤ τ ⇒ each bbox
       lies inside the other expanded by τ (pure-integer margin
       ``ceil(τ·1e6)`` — a safe superset), ordered a < b once;
    4. exact phase: point-pair rows per candidate (the pair-key
       shuffle), each row exploded to its two probe sides, then
       min-per-probe-point → max-per-side → max-per-pair — three
       map-side-combinable groupBys, zero UDFs, zero driver state;
    5. final filter H² ≤ τ² on the exact integer H².

    Worst case is Σ_pairs |A|·|B| point rows — the candidate prefilter
    is what bounds it, exactly like LSH banding bounds the minhash
    verify phase. → (entity_a, entity_b, haus_d2) with haus_d2 in
    squared microdegrees."""
    if tau_deg < 0:
        raise ValueError(f"tau_deg must be >= 0, got {tau_deg}")
    # shared-literal discipline: the oracle embeds repr() of this product
    tau2 = (tau_deg * 1e6) * (tau_deg * 1e6)
    margin = int(math.floor(tau_deg * 1e6)) + 1  # integer-safe superset

    pts = pings_df.select(
        F.col(entity_col).alias("ent"),
        F.floor(F.col(lng) * 1e6 + 0.5).cast("long").alias("x"),
        F.floor(F.col(lat) * 1e6 + 0.5).cast("long").alias("y"),
    ).distinct()
    box = pts.groupBy("ent").agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    a, b = box.alias("a"), box.alias("b")
    m = F.lit(margin)
    cand = a.join(
        b,
        (F.col("a.ent") < F.col("b.ent"))
        # bbox(A) ⊆ expand(bbox(B), τ)  AND  bbox(B) ⊆ expand(bbox(A), τ)
        & (F.col("a.xmin") >= F.col("b.xmin") - m)
        & (F.col("a.xmax") <= F.col("b.xmax") + m)
        & (F.col("a.ymin") >= F.col("b.ymin") - m)
        & (F.col("a.ymax") <= F.col("b.ymax") + m)
        & (F.col("b.xmin") >= F.col("a.xmin") - m)
        & (F.col("b.xmax") <= F.col("a.xmax") + m)
        & (F.col("b.ymin") >= F.col("a.ymin") - m)
        & (F.col("b.ymax") <= F.col("a.ymax") + m),
    ).select(
        F.col("a.ent").alias("ea"), F.col("b.ent").alias("eb"))
    pp = (
        cand.join(pts.alias("pa"), F.col("ea") == F.col("pa.ent"))
        .join(pts.alias("pb"), F.col("eb") == F.col("pb.ent"))
        .select(
            "ea", "eb",
            F.col("pa.x").alias("ax"), F.col("pa.y").alias("ay"),
            F.col("pb.x").alias("bx"), F.col("pb.y").alias("by"),
            (
                (F.col("pa.x") - F.col("pb.x"))
                * (F.col("pa.x") - F.col("pb.x"))
                + (F.col("pa.y") - F.col("pb.y"))
                * (F.col("pa.y") - F.col("pb.y"))
            ).alias("d2"),
        )
    )
    sides = pp.select(
        "ea", "eb", "d2",
        F.explode(F.array(
            F.struct(F.lit(0).alias("s"),
                     F.col("ax").alias("px"), F.col("ay").alias("py")),
            F.struct(F.lit(1).alias("s"),
                     F.col("bx").alias("px"), F.col("by").alias("py")),
        )).alias("probe"),
    ).select("ea", "eb", "d2", "probe.s", "probe.px", "probe.py")
    directed = (
        sides.groupBy("ea", "eb", "s", "px", "py")
        .agg(F.min("d2").alias("nn_d2"))
        .groupBy("ea", "eb", "s")
        .agg(F.max("nn_d2").alias("h_dir"))
    )
    return (
        directed.groupBy("ea", "eb")
        .agg(F.max("h_dir").alias("haus_d2"))
        .where(F.col("haus_d2").cast("double") <= F.lit(tau2))
        .select(
            F.col("ea").alias("entity_a"),
            F.col("eb").alias("entity_b"),
            F.col("haus_d2"),
        )
    )
