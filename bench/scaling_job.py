"""The scaling job: one fixed, large spatial-join workload run at a given
parallelism level. Invoked by bench/scaling.py at local[8] (N) and
local[32] (4N) — same input (deterministic JVM-side generation, same seed
constants, fixed partition counts) so ONLY the core count varies.

Workload: build a packed index over 8M synthetic boxes and probe it with
2M query boxes (level-6 grid, cogrouped STRPack UDF) — the engine's hot
path at a size where parallel work dominates fixed overheads.

Prints one JSON line: {"cpus", "t_build", "t_join", "pairs", "rows_per_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent, batch_query
from python_prtree_spark.operators.build import build_index

N_DATA = 8_000_000
N_PROBE = 2_000_000
PARTS = 128  # fixed across levels: identical plans, only cores differ


def gen_boxes(spark, n: int, id_col: str, c1: int, c2: int, c3: int, c4: int,
              base_ext: float, ext_scale: int):
    k = F.col("id") + 1
    xmin = ((k * c1) % 100000).cast("double") / 1000.0
    ymin = ((k * c2) % 100000).cast("double") / 1000.0
    return (
        spark.range(0, n, 1, PARTS)
        .select(
            F.col("id").alias(id_col),
            xmin.alias("xmin"), ymin.alias("ymin"),
            (xmin + base_ext + ((k * c3) % ext_scale).cast("double") / 1000.0).alias("xmax"),
            (ymin + base_ext + ((k * c4) % ext_scale).cast("double") / 1000.0).alias("ymax"),
        )
    )


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.sql.adaptive.enabled", "false")  # fixed plan shape
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(extent=Extent(0, 0, 105, 105), level=6, strategy="packed",
                       salt_threshold=500_000)
    data = gen_boxes(spark, N_DATA, "id", 2654435761, 2246822519, 3266489917, 668265263,
                     0.02, 100).cache()
    probes = gen_boxes(spark, N_PROBE, "qid", 377424577, 285995483, 198491329, 954979807,
                       0.02, 150).cache()
    n_d, n_p = data.count(), probes.count()  # materialize gen outside timing

    t0 = time.perf_counter()
    idx, _ = build_index(data, cfg, n_data_hint=n_d, validate=False)
    n_idx = idx.agg(F.sum("n_rows")).collect()[0][0]
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = batch_query(data, probes, cfg, n_data_hint=n_d).count()
    t_join = time.perf_counter() - t0

    print(json.dumps({
        "cpus": cpus,
        "n_data": n_d, "n_probe": n_p, "index_rows": int(n_idx), "pairs": int(pairs),
        "t_build": round(t_build, 2), "t_join": round(t_join, 2),
        "build_boxes_per_sec": round(n_d / t_build, 1),
        "join_rows_per_sec": round((n_d + n_p) / t_join, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
