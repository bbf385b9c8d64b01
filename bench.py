"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headliners (chosen to mirror the reference's benchmark suite,
/root/reference/benchmarks/cpp/: construction, query throughput, parallel
scaling — plus the training-data ops the north rule adds):

  build_lineitem   — index construction over ~600k boxes (reference:
                     9.2-11 M boxes/s single node, BASELINE.md)
  spatial_join_big — 600k x 150k box-overlap join (packed strategy)
  batch_query      — part x supplier probe join (the correctness query)
  intersections    — self-join over part boxes
  knn              — k=5 over part centroids, supplier probes
  distance_join    — customers within 2.0 of part boxes (ST_DWithin)
  dedup_minhash    — MinHash-LSH near-dup pairs over documents
  ann_ivf          — IVF top-10 over embeddings

Extra keys (throughputs, row counts) ride along for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_prtree_spark import (
    EngineConfig, Extent, batch_query, distance_join, knn_join, query_intersections,
)
from python_prtree_spark.operators.build import build_index
from python_prtree_spark.operators.ann import ivf_topk
from python_prtree_spark.operators.dedup import minhash_lsh_pairs
from __spark_entry__ import part_boxes, supplier_probes

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=4)


def lineitem_boxes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    xmin = ((k * 2654435761) % 100000).cast("double") / 1000.0
    ymin = ((k * 2246822519) % 100000).cast("double") / 1000.0
    return li.select(
        k.alias("id"),
        xmin.alias("xmin"), ymin.alias("ymin"),
        (xmin + 0.05 + ((k * 3266489917) % 300).cast("double") / 1000.0).alias("xmax"),
        (ymin + 0.05 + ((k * 668265263) % 300).cast("double") / 1000.0).alias("ymax"),
    )


def orders_probes(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    xmin = ((k * 377424577) % 99000).cast("double") / 1000.0
    ymin = ((k * 285995483) % 99000).cast("double") / 1000.0
    return o.select(
        k.alias("qid"),
        xmin.alias("xmin"), ymin.alias("ymin"),
        (xmin + 0.05 + ((k * 198491329) % 400).cast("double") / 1000.0).alias("xmax"),
        (ymin + 0.05 + ((k * 954979807) % 400).cast("double") / 1000.0).alias("ymax"),
    )


def warmup(spark: SparkSession) -> None:
    """One pass through each hot code path before any timed stage —
    steady-state is the regime a long-running job lives in; cold stages
    measure the JIT, not the engine. Three one-time costs to pay up front:
    (a) EVERY python worker's numpy/pyarrow import — needs a shuffle wide
    enough (>= 2x cores partitions) that all workers spawn once; (b)
    whole-stage-codegen compilation per PLAN SHAPE — level/extent literals
    are baked into the generated source, so warm the exact level-5 (build/
    big-join) and level-4 (batch_query) shapes the timed stages use; (c)
    Arrow writer + LSH kernel spin-up."""
    d = spark.range(0, 120_000, 1, 64).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("xmin"),
        ((F.col("id") * 7) % 100).cast("double").alias("ymin"),
        ((F.col("id") % 100) + 1.0).cast("double").alias("xmax"),
        (((F.col("id") * 7) % 100) + 1.0).cast("double").alias("ymax"),
    )
    q = d.limit(2000).select(F.col("id").alias("qid"), "xmin", "ymin", "xmax", "ymax")
    lvl5 = CFG.with_(level=5, strategy="packed")
    build_index(d, lvl5, n_data_hint=120_000)[0].agg(F.sum("n_rows")).collect()
    batch_query(d, q, CFG, n_data_hint=120_000).count()
    docs = spark.createDataFrame(
        [(i, "warm up tokens " + "x" * (i % 7)) for i in range(256)], "doc_id long, text string"
    )
    minhash_lsh_pairs(docs, 0.8, bands=16).count()


def calib() -> float:
    """Fixed-flops numpy probe (8 x 512^3 matmuls): ~0.03-0.06 s when the
    host grants full CPU, 3-16x that inside a hypervisor throttle window
    (r4's filed bench read 0.595/0.917 and its numbers were 1.6-3x off)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((512, 512))
    t0 = time.perf_counter()
    for _ in range(8):
        a = a @ a / 512.0
    return round(time.perf_counter() - t0, 3)


def calib_gate(extras: dict, tag: str) -> bool:
    """r4 VERDICT item 2: the headline bench must carry the same
    calibration-gating discipline as bench/scaling_gated.py. Probe the
    fixed-flops calibration; while it reads above the gate (default
    0.08 s ~ 2x the r3 clean-host stamp), wait out the throttle window
    and retry, bounded. EVERY probed value is recorded in extras so the
    artifact shows the windows that were rejected; if no clean window
    arrives within the budget the suite still runs (the driver needs its
    JSON line) and the artifact self-reports <tag>_gate_passed=false."""
    gate = float(os.environ.get("SPARK_GRAFT_CALIB_GATE", "0.08"))
    tries = int(os.environ.get("SPARK_GRAFT_GATE_TRIES", "8"))
    wait = float(os.environ.get("SPARK_GRAFT_GATE_WAIT_SEC", "40"))
    calib()  # discard: the first probe in a process pays BLAS/threadpool init
    probes = []
    for i in range(max(1, tries)):
        c = calib()
        probes.append(c)
        if c <= gate:
            break
        if i < tries - 1:
            time.sleep(wait)
    extras[f"{tag}_gate_probes"] = probes
    extras[f"{tag}_gate_passed"] = probes[-1] <= gate
    return probes[-1] <= gate


def run(spark: SparkSession, sf_dir: str, repeats: int = 3) -> dict:
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    warmup(spark)
    calib_gate(extras, "suite")

    def timed(name: str, fn):
        """Min over `repeats` runs: the sandbox VM's hypervisor throttles
        CPU in multi-minute windows (measured in BENCH.md), so a single
        sample can be 3-4x off with zero code change. The minimum measures
        the engine's steady-state capability — the regime a long-running
        100 TB job lives in. Nothing is cached across runs (each run
        builds fresh plans → fresh shuffles)."""
        best, out = None, None
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    li = lineitem_boxes(spark, sf_dir).cache()
    n_li = li.count()
    probes = orders_probes(spark, sf_dir).cache()
    n_probes = probes.count()

    # construction throughput (reference: benchmark_construction.cpp)
    cfg_li = CFG.with_(level=5, strategy="packed")
    idx_rows = timed(
        "build_lineitem",
        lambda: build_index(li, cfg_li, n_data_hint=n_li)[0]
        .agg(F.sum("n_rows")).collect()[0][0],
    )
    extras["build_boxes_per_sec"] = round(n_li / timings["build_lineitem"], 1)
    extras["build_index_rows"] = int(idx_rows)

    n_big = timed(
        "spatial_join_big",
        lambda: batch_query(li, probes, cfg_li, n_data_hint=n_li).count(),
    )
    extras["spatial_join_big_pairs"] = int(n_big)
    extras["spatial_join_rows_per_sec"] = round(
        (n_li + n_probes) / timings["spatial_join_big"], 1
    )

    pb = part_boxes(spark, sf_dir)
    sp = supplier_probes(spark, sf_dir)
    timed("batch_query", lambda: batch_query(pb, sp, CFG).count())
    timed("intersections", lambda: query_intersections(pb, CFG).count())

    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    pts = s.select(
        k.alias("qid"),
        (((k * 377424577) % 100000).cast("double") / 1000.0).alias("x"),
        (((k * 285995483) % 100000).cast("double") / 1000.0).alias("y"),
    )
    timed("knn", lambda: knn_join(pb, pts, 5, CFG).count())

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey")
    cust_pts = c.select(
        ck.alias("qid"),
        (((ck * 961748927) % 100000).cast("double") / 1000.0).alias("x"),
        (((ck * 920419813) % 100000).cast("double") / 1000.0).alias("y"),
    )
    timed("distance_join", lambda: distance_join(pb, cust_pts, 2.0, CFG).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # threshold 0.8 / 16 bands: r=8 rows per band keeps collisions sane on
    # the driver corpus's tiny 31-word vocabulary (still ~3M true pairs)
    timed("dedup_minhash", lambda: minhash_lsh_pairs(docs, 0.8, bands=16).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann_probes = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    timed("ann_ivf", lambda: ivf_topk(emb, ann_probes, 10, n_centroids=32, n_probe=4).count())

    # at-scale construction throughput (synthetic 8M boxes, level-7 grid —
    # the regime BASELINE.md's 9.2M boxes/s reference figure lives in;
    # sf0.1's 600k-box build above is fixed-overhead-dominated). Reported
    # in extras only: it is a throughput probe, not a headline stage, so
    # it does not inflate the suite wall time being tracked across rounds.
    #
    # Throttle robustness (BENCH.md methodology; the sandbox hypervisor
    # throttles CPU in multi-minute windows, 3-4x between runs with zero
    # code change): the probe takes min over >= 5 samples, and a
    # fixed-flops numpy calibration runs before and after so the recorded
    # artifact carries direct evidence of the throttle state the samples
    # were taken under (calib ~0.5 s unthrottled; 3-4x that when the VM is
    # being starved).
    n8 = 8_000_000
    big = (
        spark.range(n8).select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 100000 / 1000.0).alias("xmin"),
            ((F.col("id") * 2246822519) % 100000 / 1000.0).alias("ymin"))
        .withColumn("xmax", F.col("xmin") + 0.01)
        .withColumn("ymax", F.col("ymin") + 0.01)
        .localCheckpoint()
    )
    cfg8 = CFG.with_(extent=Extent(0, 0, 105, 105), level=7)
    calib_gate(extras, "build8m")
    extras["calib_sec_pre"] = calib()
    best8 = None
    # each sample builds a FRESH DataFrame: fresh Catalyst analysis, fresh
    # shuffle — nothing reusable between samples. (A shared DataFrame
    # instance would let Spark reuse the prior job's shuffle map files and
    # report a fantasy number.)
    for _ in range(max(5, repeats)):
        t0 = time.perf_counter()
        build_index(big, cfg8, n_data_hint=n8, validate=False)[0] \
            .agg(F.sum("n_rows")).collect()
        dt = time.perf_counter() - t0
        best8 = dt if best8 is None else min(best8, dt)
    extras["calib_sec_post"] = calib()
    extras["build_8m_sec"] = round(best8, 3)
    extras["build_8m_boxes_per_sec"] = round(n8 / best8, 1)
    big.unpersist()

    # raster pipeline throughput (extras only — the r4 zonal/rasterize/
    # pyramid family is new, so it is recorded for BASELINE.md without
    # changing the headline suite tracked across rounds). Tiles are
    # materialized first so the probe times the operators, not the
    # fixture generation.
    from python_prtree_spark.operators.raster import (
        pyramid_level_values, rasterize_tiles, zonal_stats,
    )
    from python_prtree_spark.sources.datagen import formula_tiles
    from __spark_entry__ import nation_triangles

    tiles = formula_tiles(c.select(ck.cast("long").alias("id"))).localCheckpoint()
    n_tiles = tiles.count()
    tris = nation_triangles(spark, sf_dir)
    best_z = None
    for _ in range(2):
        t0 = time.perf_counter()
        zonal_stats(tiles, tris, CFG).count()
        dt = time.perf_counter() - t0
        best_z = dt if best_z is None else min(best_z, dt)
    extras["zonal_tiles"] = int(n_tiles)
    extras["zonal_sec"] = round(best_z, 3)
    extras["zonal_tiles_per_sec"] = round(n_tiles / best_z, 1)
    best_p = None
    for _ in range(2):
        t0 = time.perf_counter()
        pyramid_level_values(rasterize_tiles(sp, CFG, px=16),
                             level=CFG.level, px=16).count()
        dt = time.perf_counter() - t0
        best_p = dt if best_p is None else min(best_p, dt)
    extras["rasterize_pyramid_sec"] = round(best_p, 3)
    tiles.unpersist()

    # r4 additions (extras, same rationale): geodesic join + polygonize
    from __spark_entry__ import _q_geo_distance, _q_polygonize

    best_g, n_geo = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_geo = _q_geo_distance(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best_g = dt if best_g is None else min(best_g, dt)
    extras["geo_distance_pairs"] = int(n_geo)
    extras["geo_distance_sec"] = round(best_g, 3)
    best_pg, n_reg = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_reg = _q_polygonize(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best_pg = dt if best_pg is None else min(best_pg, dt)
    extras["polygonize_regions"] = int(n_reg)
    extras["polygonize_sec"] = round(best_pg, 3)

    li.unpersist()
    probes.unpersist()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline suite wall time (build + spatial joins + knn + distance + dedup + ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "extras": extras,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("python_prtree_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if os.access("/dev/shm", os.W_OK):  # tmpfs shuffle: don't benchmark the disk
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    result = run(spark, sf_dir, repeats=repeats)
    result["cpus"] = int(cpus)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
