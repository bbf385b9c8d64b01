"""kNN join — north-rule extension (no counterpart in the reference; the
reference's only probe is box overlap).

Semantics (FIXTURES.md F6): for each probe point, the k nearest data-box
*centroids* by Euclidean distance, ties broken by ascending data id.
Output: (qid, id, rank) with rank 1..k.

Distributed expanding-radius search — the grid analogue of an R-tree
best-first kNN, with a per-round correctness certificate:

  round r: probe a box [p ± R_r] through the cell-routed spatial join,
  take the per-probe top-k by (dist², id) with a window; a probe is
  RESOLVED iff it found ≥ k candidates whose k-th distance ≤ R_r (every
  point within R_r of p lies inside the probe box, so nothing closer can
  be outside it). Unresolved probes continue with R *= 4; once R covers
  the extent diagonal the box contains everything and the round is exact.

Each round runs only the still-unresolved probes — geometric shrink, a
handful of rounds total. All heavy work is the same cell-join machinery as
batch_query; the driver only sees per-round resolved counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["knn_join"]

# probe batches whose Catalyst plan estimate is under this take the
# single-scan broadcast route (the expanding-radius loop costs one full
# data-side pass PER ROUND — never scan 100 TB three times to answer a
# thousand probes). ~40k probe points; map-side work is O(rows x m).
_BCAST_PROBE_BYTES = 1 << 20
# hard row cap checked AFTER toPandas: Catalyst's sizeInBytes is an
# estimate (with CBO off it can grossly undercount after selective
# filters/projections) — if the materialized probe set is in fact large,
# abandon the broadcast route rather than ship it to every task
_BCAST_PROBE_ROWS = 100_000


def _broadcast_probe_pts(points_df: DataFrame, query_id: str, x: str, y: str):
    """Materialize + broadcast a gated-tiny probe set as numpy arrays, or
    None when the row cap trips. LIMIT cap+1 BEFORE toPandas: driver
    memory stays bounded even when Catalyst's sizeInBytes estimate
    grossly undercounts (the cap would otherwise trip only after the full
    probe set already materialized)."""
    import numpy as np

    pts = points_df.select(query_id, x, y).limit(_BCAST_PROBE_ROWS + 1).toPandas()
    if len(pts) > _BCAST_PROBE_ROWS:
        return None  # estimate lied — caller falls back to the radius path
    return points_df.sparkSession.sparkContext.broadcast((
        pts[query_id].to_numpy(),
        pts[x].to_numpy(np.float64),
        pts[y].to_numpy(np.float64),
    ))


def _local_topk_chunks(qids, px, py, ids, cx, cy, kk, out_q, out_i, out_d):
    """Chunked map-side kNN combine: append every candidate with dist <=
    the k-th smallest per probe (np.partition, O(m*c), no sort) — a
    SUPERSET of the chunk's true top-k including all boundary ties, so no
    exact (dist, id) ordering is needed Python-side; the final window is
    the only arbiter of ranks. Emitted rows ~= k + ties per
    (probe, chunk). Shared by the live centroid scan and the
    LoadedIndex pack scan."""
    import numpy as np

    m = len(qids)
    c = max(256, (1 << 23) // max(m, 1))  # m x c doubles <= ~64 MB
    for lo in range(0, len(ids), c):
        hi = min(lo + c, len(ids))
        d = ((cx[None, lo:hi] - px[:, None]) ** 2
             + (cy[None, lo:hi] - py[:, None]) ** 2)
        if hi - lo > kk:
            kth = np.partition(d, kk - 1, axis=1)[:, kk - 1:kk]
            qi, ci = np.nonzero(d <= kth)
        else:
            qi, ci = np.nonzero(np.isfinite(d))
        out_q.append(qids[qi])
        out_i.append(ids[lo:hi][ci])
        out_d.append(d[qi, ci])


def _global_topk(local: DataFrame, k: int, data_id: str, query_id: str) -> DataFrame:
    """(qid, id, dist2) candidate rows → global top-k with the engine-wide
    tie-break: ascending (dist2, id)."""
    w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(data_id).asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(query_id, data_id, "rank")
    )


def _knn_broadcast(
    cent_xy: DataFrame, points_df: DataFrame, k: int,
    data_id: str, query_id: str, x: str, y: str,
) -> DataFrame:
    """Single-pass exact kNN for tiny probe batches: probes are broadcast
    into an Arrow kernel over the data partitions; each partition emits its
    LOCAL top-k per probe ((partitions x m x k) skinny rows — the map-side
    combine of kNN), and one window takes the global top-k. ONE scan of the
    data side, zero data shuffle, one skinny exchange. Tie-break matches
    the expanding-radius path: ascending (dist2, id)."""
    import numpy as np

    bc = _broadcast_probe_pts(points_df, query_id, x, y)
    if bc is None:
        return None
    kk = int(k)
    qt = points_df.schema[query_id].dataType.simpleString()
    dt = cent_xy.schema[data_id].dataType.simpleString()

    def gen(batches):
        import pandas as pd

        qids, px, py = bc.value
        if len(qids) == 0:
            return
        out_q, out_i, out_d = [], [], []
        for pdf in batches:
            _local_topk_chunks(
                qids, px, py,
                pdf[data_id].to_numpy(),
                pdf["_cx"].to_numpy(np.float64),
                pdf["_cy"].to_numpy(np.float64),
                kk, out_q, out_i, out_d,
            )
        if out_q:
            yield pd.DataFrame({
                query_id: np.concatenate(out_q),
                data_id: np.concatenate(out_i),
                "dist2": np.concatenate(out_d),
            })

    from python_prtree_spark.operators.dedup import _spread

    # spread the data side across the cores first: a small parquet scan
    # arrives as one task, and the whole m x n distance kernel would run
    # on a single Python worker (measured 0.7 s serial vs ~0.05 s spread
    # at 20k x 1k on local[32]); no-op when the scan is already parallel
    local = _spread(cent_xy.select(data_id, "_cx", "_cy")).mapInPandas(
        gen, schema=f"{query_id} {qt}, {data_id} {dt}, dist2 double"
    )
    return _global_topk(local, kk, data_id, query_id)


def _knn_radius_rounds(
    points_df: DataFrame,
    k: int,
    cfg: EngineConfig,
    n_data: int,
    cand_fn,
    data_id: str,
    query_id: str,
    x: str,
    y: str,
    r0: float | None,
    max_rounds: int,
) -> DataFrame:
    """The expanding-radius kNN loop, parameterized over candidate
    generation so the live path (cell-join over centroid boxes) and the
    LoadedIndex path (bucket-pruned pack probe) share the identical
    certificate logic. ``cand_fn(probe_boxes)`` must return a DataFrame
    (query_id, data_id, _cx, _cy) containing AT LEAST every data row whose
    centroid lies inside the probe box (supersets are fine — scoring and
    the window discard extras), each (query_id, data_id) at most once."""
    ext = cfg.extent
    diag = math.hypot(ext.width(), ext.height())
    if r0 is None:
        # density heuristic: radius of a disc expected to hold ~2k centroids
        area = ext.width() * ext.height()
        r0 = diag if n_data == 0 else min(
            diag, 1.5 * math.sqrt(max(k, 1) * area / max(n_data, 1))
        )

    pending = points_df.select(query_id, F.col(x).alias("_px"), F.col(y).alias("_py"))
    results: list[DataFrame] = []
    r = r0
    w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(data_id).asc())

    def score(probes):
        cand = cand_fn(probes.select(query_id, "xmin", "ymin", "xmax", "ymax"))
        return (
            cand.join(probes.select(query_id, "_px", "_py"), on=query_id)
            .withColumn(
                "dist2",
                (F.col("_cx") - F.col("_px")) ** 2 + (F.col("_cy") - F.col("_py")) ** 2,
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    for _rnd in range(max_rounds):
        probes = pending.select(
            query_id, "_px", "_py",
            (F.col("_px") - r).alias("xmin"), (F.col("_py") - r).alias("ymin"),
            (F.col("_px") + r).alias("xmax"), (F.col("_py") + r).alias("ymax"),
        )
        scored = score(probes).localCheckpoint(eager=True)  # materialize
        # once: reused by the certificate, the result slice, AND the union
        exact = r >= diag  # the box now contains every centroid
        if exact:
            results.append(scored.select(query_id, data_id, "rank"))
            pending = None
            break
        # certificate: k-th (or last, if fewer) distance must be <= r
        per_q = scored.groupBy(query_id).agg(
            F.count(F.lit(1)).alias("n_found"), F.max("dist2").alias("kth_d2")
        )
        resolved_q = per_q.where(
            (F.col("n_found") >= F.least(F.lit(k), F.lit(n_data)))
            & (F.sqrt("kth_d2") <= F.lit(float(r)))
        ).select(query_id)
        results.append(
            scored.join(resolved_q, on=query_id, how="left_semi")
            .select(query_id, data_id, "rank")
        )
        # one eager checkpoint doubles as lineage truncation (driver-loop
        # DAG growth otherwise re-executes every prior round's joins) AND
        # the source for the emptiness probe — one light job per round,
        # not two (the heavy job per round stays the single `scored` one)
        pending = pending.join(
            resolved_q, on=query_id, how="left_anti"
        ).localCheckpoint(eager=True)
        if pending.isEmpty():
            pending = None
            break
        r *= 4.0

    if pending is not None:
        # final exact fallback: full-extent box
        probes = pending.select(
            query_id, "_px", "_py",
            F.lit(float("-1e308")).alias("xmin"), F.lit(float("-1e308")).alias("ymin"),
            F.lit(float("1e308")).alias("xmax"), F.lit(float("1e308")).alias("ymax"),
        )
        results.append(score(probes).select(query_id, data_id, "rank"))

    out = results[0]
    for nxt in results[1:]:
        out = out.unionByName(nxt)
    return out


def knn_join(
    data_df: DataFrame,
    points_df: DataFrame,
    k: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    query_id: str = "qid",
    x: str = "x",
    y: str = "y",
    r0: float | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """k nearest data-box centroids per probe point → (qid, id, rank)."""
    # centroids once; reused by both routes / across rounds
    cent = data_df.select(
        data_id,
        ((F.col("xmin") + F.col("xmax")) / 2).alias("_cx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("_cy"),
        "xmin", "ymin", "xmax", "ymax",
    )
    cent_xy = cent.select(data_id, "_cx", "_cy")

    # tiny probe batch + numeric ids → single-scan broadcast kNN (decided
    # from Catalyst's own size estimate, like probe._pick_strategy; no job
    # is scheduled — not even resolve_geometry's count, which only the
    # radius loop needs). The expanding-radius loop below costs one
    # data-side pass per round — strictly worse whenever the probes fit
    # in memory.
    if cent_xy.schema[data_id].dataType.simpleString() in ("bigint", "int"):
        from python_prtree_spark.plans.explain import plan_size_estimate

        est = plan_size_estimate(points_df)
        if est is not None and est <= _BCAST_PROBE_BYTES:
            out = _knn_broadcast(cent_xy, points_df, k, data_id, query_id, x, y)
            if out is not None:  # None = row-cap tripped after materializing
                return out

    cfg, n_data = _probe.resolve_geometry(
        data_df.select(data_id, "xmin", "ymin", "xmax", "ymax"), cfg
    )
    cent_boxes = cent.select(
        data_id,
        F.col("_cx").alias("xmin"), F.col("_cy").alias("ymin"),
        F.col("_cx").alias("xmax"), F.col("_cy").alias("ymax"),
    )

    def cand_fn(probe_boxes):
        return _probe.batch_query(
            cent_boxes, probe_boxes, cfg, data_id, query_id, n_data_hint=n_data,
        ).join(cent_xy, on=data_id)

    return _knn_radius_rounds(
        points_df, k, cfg, n_data, cand_fn, data_id, query_id, x, y, r0, max_rounds
    )
