"""Per-stage isolation harness for the r6 optimization round (guide §1).

NOT the driver bench — bench.py is frozen. This file decomposes each
headline query into its expensive sub-stages, times each with the noop
sink (guide §1.4) so the computation is measured rather than the sink,
and dumps `.explain("formatted")` for any stage on request.

Usage:
    python bench_extra.py [stage ...]      # default: all stages
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
Prints one JSON line: {"stages": {name: sec, ...}}.
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
from python_prtree_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures
from __spark_entry__ import part_boxes, supplier_probes

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=4)

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("python_prtree_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if os.access("/dev/shm", os.W_OK):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    only = set(sys.argv[1:])
    stages: dict[str, float] = {}

    def timed(name, fn, repeats=REPEATS):
        if only and not any(name.startswith(o) for o in only):
            return
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        stages[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    # ---- fixtures (mirror bench.py) ----
    from bench import lineitem_boxes, orders_probes, warmup
    warmup(spark)

    li = lineitem_boxes(spark, sf_dir).cache()
    n_li = li.count()
    probes = orders_probes(spark, sf_dir).cache()
    probes.count()
    cfg_li = CFG.with_(level=5, strategy="packed")

    from python_prtree_spark.functions.tiling import explode_cells
    from python_prtree_spark.operators.probe import _hot_cells

    # ---- build_lineitem decomposition ----
    timed("build.0_explode_noop", lambda: noop(
        explode_cells(li.select("id", "xmin", "ymin", "xmax", "ymax"),
                      cfg_li.extent, cfg_li.level)))
    cells = explode_cells(li.select("id", "xmin", "ymin", "xmax", "ymax"),
                          cfg_li.extent, cfg_li.level).select(
        F.col("id").alias("_did"), "cell", "xmin", "ymin", "xmax", "ymax")
    timed("build.1_hotcells", lambda: _hot_cells(cells, cfg_li, n_li))
    timed("build.2_agg_nrows", lambda: build_index(
        li, cfg_li, n_data_hint=n_li)[0].agg(F.sum("n_rows")).collect())
    timed("build.3_full_noop", lambda: noop(
        build_index(li, cfg_li, n_data_hint=n_li)[0]))

    # ---- spatial_join_big ----
    timed("sjoin.full", lambda: batch_query(
        li, probes, cfg_li, n_data_hint=n_li).count())

    pb = part_boxes(spark, sf_dir)
    sp = supplier_probes(spark, sf_dir)
    timed("batch_query.full", lambda: batch_query(pb, sp, CFG).count())
    timed("intersections.full", lambda: query_intersections(pb, CFG).count())

    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    pts = s.select(
        k.alias("qid"),
        (((k * 377424577) % 100000).cast("double") / 1000.0).alias("x"),
        (((k * 285995483) % 100000).cast("double") / 1000.0).alias("y"),
    )
    timed("knn.full", lambda: knn_join(pb, pts, 5, CFG).count())

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey")
    cust_pts = c.select(
        ck.alias("qid"),
        (((ck * 961748927) % 100000).cast("double") / 1000.0).alias("x"),
        (((ck * 920419813) % 100000).cast("double") / 1000.0).alias("y"),
    )
    timed("distance_join.full", lambda: distance_join(pb, cust_pts, 2.0, CFG).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("minhash.0_signatures_noop", lambda: noop(minhash_signatures(docs, 128)))
    timed("minhash.full", lambda: minhash_lsh_pairs(docs, 0.8, bands=16).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann_probes = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("qid"), "embedding")
    timed("ann.full", lambda: ivf_topk(
        emb, ann_probes, 10, n_centroids=32, n_probe=4).count())

    print(json.dumps({"stages": stages, "sf": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
