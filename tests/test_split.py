"""split_col / split_assign: stability, proportions, group cohesion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_prtree_spark.operators.split import split_assign, split_col


def test_split_properties(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97).alias("grp")
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, w, key="id", seed=3)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # STABILITY under repartitioning and under corpus growth: the label
    # of id < 5000 is unchanged when 5000 more rows arrive
    out2 = split_assign(
        spark.range(0, 10000).repartition(17).select(F.col("id")),
        w, key="id", seed=3,
    ).where(F.col("id") < 5000)
    a = {r["id"]: r["split"] for r in out.select("id", "split").collect()}
    b = {r["id"]: r["split"] for r in out2.collect()}
    assert a == b
    # seed changes the assignment
    c = {r["id"]: r["split"]
         for r in split_assign(df, w, key="id", seed=4).select("id", "split").collect()}
    assert a != c
    # GROUP-keyed split: every row of a group shares one label
    g = split_assign(df, w, key="grp", seed=3)
    assert g.groupBy("grp").agg(
        F.countDistinct("split").alias("k")).where(F.col("k") > 1).count() == 0


def test_split_errors(spark):
    with pytest.raises(ValueError, match="non-empty"):
        split_col("id", {})
    with pytest.raises(ValueError, match="non-negative"):
        split_col("id", {"a": -1.0, "b": 2.0})
