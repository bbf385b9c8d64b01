"""Connected components over duplicate-pair edges — the step a training-data
dedup pipeline runs right after pair generation (pairs → clusters → keep one
representative per cluster).

Algorithm: alternating Large-Star / Small-Star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — a published MapReduce
algorithm, re-expressed as DataFrame groupBy/join rounds):

  * large_star: for every node u, hang all strictly-larger neighbors onto
    min(Γ(u) ∪ {u});
  * small_star: orient edges toward the smaller endpoint and hang all
    smaller-or-equal neighbors onto the minimum.

Both are one groupBy + one generate each (shuffle on node id); the
alternation converges in O(log² n) rounds even on adversarial path graphs —
unlike naive min-label propagation, whose round count is the graph DIAMETER
(a 100 TB web-duplicate chain can be millions of hops). Each round is
localCheckpoint-ed so the driver-loop plan does not grow.

Output: (node, component) where component = the smallest node id reachable —
deterministic, engine-independent, so an exact SQL oracle (recursive CTE)
can gate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "duplicate_clusters"]


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    grouped = sym.groupBy("a").agg(
        F.collect_set("b").alias("nbrs"),
    ).select(
        "a",
        F.least(F.array_min("nbrs"), F.col("a")).alias("m"),
        F.filter("nbrs", lambda v: v > F.col("a")).alias("bigger"),
    )
    return (
        grouped.select(F.explode("bigger").alias("a"), "m")
        .select("a", F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    grouped = o.groupBy("a").agg(F.collect_set("b").alias("nbrs")).select(
        "a",
        F.array_min("nbrs").alias("m"),
        "nbrs",
    )
    out = grouped.select(
        F.explode(
            F.array_union("nbrs", F.array("a"))
        ).alias("v"), F.col("m"),
    ).where(F.col("v") != F.col("m")).select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    return out.distinct()


# Graphs at or below this edge count are solved with one driver-side
# union-find instead of the alternating-star loop: every star round costs
# ~4 Spark jobs + a checksum collect, pure constant overhead when the
# border-edge graph is tiny (r4 VERDICT: polygonize paid 5.4 s for a
# 2-region raster). The gate is a bounded limit(cap+1) probe — never an
# unbounded collect; 50k edges is a few MB of driver memory.
SMALL_GRAPH_CAP = 50_000


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 50,
    small_graph_cap: int = SMALL_GRAPH_CAP,
) -> DataFrame:
    """→ (node, component) for every node appearing in ``pairs``;
    component = min node id of the connected component."""
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    if small_graph_cap:
        # probe BEFORE checkpointing: for small graphs (the common case for
        # border-edge CC) the limit-collect is the only job; the eager
        # checkpoint below then never runs. Large graphs recompute the
        # distinct once more for the checkpoint — amortized by the star
        # rounds that follow.
        head = e.limit(small_graph_cap + 1).collect()
        if len(head) <= small_graph_cap:
            spark = pairs.sparkSession
            dt = pairs.schema[a_col].dataType.simpleString()
            schema = f"node {dt}, component {dt}"
            if not head:
                return spark.createDataFrame([], schema)
            # union-find keyed so the root is always the MIN id — the
            # same (node, component=min reachable id) contract as the
            # distributed loop
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                ra, rb = find(row["a"]), find(row["b"])
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            nodes = {row["a"] for row in head} | {row["b"] for row in head}
            return spark.createDataFrame(
                [(n, find(n)) for n in sorted(nodes)], schema
            )
    e = e.localCheckpoint(eager=True)
    prev = _checksum(e)
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: e is a star forest (node → root). Roots map to themselves.
    nodes = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return nodes.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Dedup decision table: (node, component, keep) — keep=true for the
    cluster representative (smallest id), false for every other member.
    Feed any pair generator (exact, MinHash, SimHash, embedding) in."""
    comp = connected_components(pairs, a_col, b_col)
    return comp.withColumn("keep", F.col("node") == F.col("component"))
