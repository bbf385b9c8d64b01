"""The scaling job: one fixed, large spatial workload run at a given
cluster size. Invoked by bench/scaling.py at local-cluster[1,8] (N = 1
executor x 8 cores) and local-cluster[4,8] (4N = 4 executors x 8 cores) —
REAL separate executor JVMs (the in-sandbox stand-in for N vs 4N
executors per the round rules), same input (deterministic JVM-side
generation, fixed seeds, fixed 256 shuffle partitions) so ONLY the
executor count varies.

Workload: build a packed index over 8M synthetic boxes and probe it with
2M query boxes (level-6 grid, PBSM mapInArrow) — the engine's hot path at
a size where parallel work dominates fixed overheads.

Methodology: one cold warm-up iteration (JIT + Arrow init), then
ITERS timed iterations; the per-stage MINIMUM is the steady-state number
(a long-running 100 TB job runs hot; single-JVM cold runs measure the JIT
compiler, not the engine). Single-JVM local[n] is NOT used: 32 task
threads inside one JVM serialize on the memory/shuffle managers and
understate scaling by ~2x (measured; see BENCH.md).

Prints one JSON line: {"cpus", "executors", "t_build", "t_join", "pairs",
"rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, batch_query
from python_prtree_spark.operators.build import build_index

N_DATA = int(os.environ.get("SPARK_GRAFT_NDATA", 16_000_000))
N_PROBE = N_DATA // 4  # big enough that the one-off driver plan compile
PARTS = 256            # (~0.6 s) amortizes — scaling must measure the
ITERS = 4              # per-row engine, not per-job fixed cost


def gen_boxes(spark, n: int, id_col: str, c1: int, c2: int, c3: int, c4: int,
              base_ext: float, ext_scale: int):
    k = F.col("id") + 1
    xmin = ((k * c1) % 100000).cast("double") / 1000.0
    ymin = ((k * c2) % 100000).cast("double") / 1000.0
    return (
        spark.range(0, n, 1, 128)
        .select(
            F.col("id").alias(id_col),
            xmin.alias("xmin"), ymin.alias("ymin"),
            (xmin + base_ext + ((k * c3) % ext_scale).cast("double") / 1000.0).alias("xmax"),
            (ymin + base_ext + ((k * c4) % ext_scale).cast("double") / 1000.0).alias("ymax"),
        )
    )


def main():
    n_exec = int(os.environ.get("SPARK_GRAFT_EXECUTORS", "4"))
    cores_per = int(os.environ.get("SPARK_GRAFT_CORES_PER", "8"))
    b = (
        SparkSession.builder.master(f"local-cluster[{n_exec},{cores_per},8192]")
        .appName(f"scaling-{n_exec}x{cores_per}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.sql.adaptive.enabled", "false")  # fixed plan shape
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    # extra tuning knobs (same value applied to EVERY cluster size — a
    # fairness requirement): "k=v;k=v" via SPARK_GRAFT_EXTRA_CONF
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            b = b.config(k.strip(), v.strip())
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # ship the package to executors exactly like spark-submit --py-files
    import shutil
    import tempfile
    zip_base = os.path.join(tempfile.mkdtemp(prefix="prtree_pyfiles_"), "python_prtree_spark")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="python_prtree_spark")
    spark.sparkContext.addPyFile(zip_path)
    cfg = EngineConfig(extent=Extent(0, 0, 105, 105), level=6, strategy="packed",
                       salt_threshold=500_000)
    data = gen_boxes(spark, N_DATA, "id", 2654435761, 2246822519, 3266489917, 668265263,
                     0.02, 100).cache()
    probes = gen_boxes(spark, N_PROBE, "qid", 377424577, 285995483, 198491329, 954979807,
                       0.02, 150).cache()
    n_d, n_p = data.count(), probes.count()  # materialize gen outside timing

    t_builds, t_joins = [], []
    n_idx = pairs = 0
    for it in range(ITERS + 1):
        t0 = time.perf_counter()
        idx, _ = build_index(data, cfg, n_data_hint=n_d, validate=False)
        n_idx = idx.agg(F.sum("n_rows")).collect()[0][0]
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = batch_query(data, probes, cfg, n_data_hint=n_d).count()
        tj = time.perf_counter() - t0
        if it:  # iteration 0 is the JIT warm-up
            t_builds.append(tb)
            t_joins.append(tj)
    t_build, t_join = min(t_builds), min(t_joins)

    print(json.dumps({
        "executors": n_exec, "cores_per_executor": cores_per,
        "cpus": n_exec * cores_per,
        "n_data": n_d, "n_probe": n_p, "index_rows": int(n_idx), "pairs": int(pairs),
        "t_build": round(t_build, 2), "t_join": round(t_join, 2),
        "t_builds": [round(t, 2) for t in t_builds],
        "t_joins": [round(t, 2) for t in t_joins],
        "build_boxes_per_sec": round(n_d / t_build, 1),
        "join_rows_per_sec": round((n_d + n_p) / t_join, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
