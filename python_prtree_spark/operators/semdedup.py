"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, compare pairs
ONLY within a cluster, and drop every item that has an in-cluster
neighbor above the cosine threshold with a smaller id (deterministic
keep-the-min-id rule — engine-independent, unlike the paper's
centroid-proximity tie-break which depends on float k-means geometry).

This is the major training-data dedup family the suite lacked (r4
VERDICT item 8): MinHash/SimHash/Jaccard catch lexical duplication,
``embedding_near_dup_pairs`` catches metric near-duplication globally;
SemDeDup trades global recall for cluster-bounded cost, which is what
makes all-pairs cosine feasible at 10^9-document scale.

Scale shape: one shuffle assigns rows to clusters; the within-cluster
all-pairs compare is decomposed into a TRIANGLE OF BLOCK PAIRS — each
cluster's rows hash into ``n_blocks`` blocks and the quadratic compare
becomes B(B+1)/2 independent (cluster, block_a, block_b) join keys (the
same decomposition LoadedIndex.query_intersections uses for salted
cells), so one hot cluster spreads over many tasks instead of one
straggler. No collect_list, no driver-side pair state; the only driver
work is the <= sample_size centroid fit shared with ``ivf_topk``.

Exactness: with ``n_clusters=1`` every pair is compared, so the result
is EXACT semantic dedup at the threshold — the hash-gated driver
configuration (same recall-1 pattern as ``ann_ivf_exhaustive``). The
similarity is computed on fixed-point components (integer dot products,
exactly associative) divided by IEEE-exact sqrt, so Spark and an ANSI
SQL engine produce bit-identical doubles.

Reference scope note: the reference engine (atksh/python_prtree) has no
embedding operators; this module is part of the LLM-data-pipeline
surface the brief adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    kmeans_rounds: int = 5,
    sample_size: int = 10_000,
    quantize_scale: int = 10_000,
    n_blocks: int = 8,
) -> DataFrame:
    """→ one row per input id: (id_col, cluster_id, keep, dup_of, n_dups).

    keep = no in-cluster neighbor with cosine >= threshold and a smaller
    id; dup_of = the smallest such neighbor id (null when kept); n_dups =
    how many such neighbors. Filtering ``keep`` reproduces SemDeDup's
    retained set under the min-id keeper rule.
    """
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    if n_blocks < 1:
        raise ValueError("n_blocks must be >= 1")

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )

    if n_clusters == 1:
        assigned = base.withColumn("cluster_id", F.lit(0))
    else:
        import numpy as np

        from python_prtree_spark.operators.ann import train_centroids

        planes = train_centroids(
            df, n_clusters, id_col, vec_col, seed, kmeans_rounds, sample_size
        )

        def assign(batches):
            for pdf in batches:
                vecs = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                vn = vecs / np.maximum(
                    np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
                )
                pdf = pdf.copy()
                pdf["cluster_id"] = (vn @ planes.T).argmax(axis=1).astype(np.int32)
                yield pdf

        it = base.schema["_id"].dataType.simpleString()
        assigned = base.mapInPandas(
            assign, schema=f"_id {it}, _v array<double>, cluster_id int"
        )

    # fixed-point components once; integer self-dot for the norm term
    qv = F.transform(
        "_v", lambda x: F.floor(x * quantize_scale + F.lit(0.5)).cast("long")
    )
    n2 = F.aggregate(
        F.zip_with("_q", "_q", lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    rows = (
        assigned.withColumn("_q", qv)
        .withColumn("_n2", n2)
        .select("_id", "cluster_id", "_q", "_n2")
    )

    # triangle-of-blocks decomposition of the within-cluster self-join:
    # row with block b participates as the LEFT side of keys (b, j) for
    # j >= b and as the RIGHT side of keys (i, b) for i < b — every
    # unordered block pair compared exactly once, quadratic work split
    # over B(B+1)/2 keys per cluster
    blk = F.pmod(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)),
                 F.lit(n_blocks)).cast("int")
    rows = rows.withColumn("_blk", blk)
    s = F.col("_blk")
    a_keys = F.transform(
        F.sequence(s, F.lit(n_blocks - 1)),
        lambda j: F.struct(s.alias("ba"), j.cast("int").alias("bb"),
                           F.lit(1).cast("int").alias("side")),
    )
    b_keys = F.transform(
        F.filter(F.sequence(F.lit(0), F.lit(n_blocks - 1)), lambda i: i < s),
        lambda i: F.struct(i.cast("int").alias("ba"), s.alias("bb"),
                           F.lit(2).cast("int").alias("side")),
    )
    repl = rows.withColumn("_k", F.explode(F.concat(a_keys, b_keys)))
    left = repl.where(
        (F.col("_k.side") == 1) | (F.col("_k.ba") == F.col("_k.bb"))
    ).select(
        "cluster_id", F.col("_k.ba").alias("ba"), F.col("_k.bb").alias("bb"),
        F.col("_id").alias("_ida"), F.col("_q").alias("_qa"),
        F.col("_n2").alias("_n2a"),
    )
    right = repl.where(
        (F.col("_k.side") == 2) | (F.col("_k.ba") == F.col("_k.bb"))
    ).select(
        "cluster_id", F.col("_k.ba").alias("ba"), F.col("_k.bb").alias("bb"),
        F.col("_id").alias("_idb"), F.col("_q").alias("_qb"),
        F.col("_n2").alias("_n2b"),
    )
    dot = F.aggregate(
        F.zip_with("_qa", "_qb", lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    # diagonal keys (ba == bb) see both orientations of every in-block
    # pair — the _ida < _idb guard keeps one. Off-diagonal keys produce
    # each cross-block pair exactly once but in arbitrary id order, so
    # normalize with least/greatest instead of filtering (a filter would
    # silently DROP pairs whose left row has the larger id).
    pairs = (
        left.join(right, on=["cluster_id", "ba", "bb"])
        .where((F.col("ba") != F.col("bb")) | (F.col("_ida") < F.col("_idb")))
        .withColumn("_dot", dot)
        .withColumn(
            "_sim",
            F.col("_dot")
            / F.sqrt(F.col("_n2a").cast("double") * F.col("_n2b").cast("double")),
        )
        .where(F.col("_sim") >= threshold)
        .select(
            F.least("_ida", "_idb").alias("_ida"),
            F.greatest("_ida", "_idb").alias("_idb"),
        )
    )

    smaller = pairs.groupBy("_idb").agg(
        F.min("_ida").alias("dup_of"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )
    return (
        assigned.select(F.col("_id"), "cluster_id")
        .join(smaller, on=[F.col("_id") == F.col("_idb")], how="left")
        .select(
            F.col("_id").alias(id_col),
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            F.coalesce("n_dups", F.lit(0).cast("long")).alias("n_dups"),
        )
    )
