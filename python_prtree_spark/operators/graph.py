"""Fixed-point PageRank over an edge list — exact across engines.

The graph-centrality primitive of a web-corpus curation pipeline (link
authority as a quality prior, crawl frontier ranking). Joins the
connected-components operator (components.py) as the second member of
the graph family.

Reference parity note: the reference engine (atksh/python_prtree) has no
graph surface; this belongs to the training-data-pipeline extension
family (SURVEY.md §2.1b).

Determinism: every quantity is an int64 — scores are held in SCALE
units, per-edge shares use integer division by the sender's out-degree,
damping is the integer pair (d_num, d_den). No float exists anywhere,
so Spark and any ANSI-SQL oracle produce bit-identical scores at every
iteration. (Integer division makes total mass decay by a few units per
round — the standard trade for cross-engine exactness; rankings are
unaffected.)

Scale shape: out-degrees are ONE groupBy, then each iteration is one
shuffle — an edge-key join from the current scores plus a dst-key
groupBy, with a left join back onto the node set so sink-only nodes
keep their base mass. K iterations = K passes over the EDGE list (the
unavoidable cost of power iteration); scores stay node-sized. No driver
loop over data — the Python for-loop only builds the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank in pure int64 fixed point.

    Nodes are the union of sources and destinations. With N nodes and
    out-degree deg(u):

        score_0(v)   = SCALE // N
        base         = ((d_den − d_num) · (SCALE // N)) // d_den
        share_k(u)   = score_k(u) // deg(u)            (per out-edge)
        score_{k+1}(v) = base + (d_num · Σ_{u→v} share_k(u)) // d_den

    Multi-edges contribute once per edge; sink nodes (no out-edges)
    simply stop forwarding mass (their in-mass still accrues).

    → (node, score_q) — score_q in SCALE units, bit-exact vs SQL.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < d_num < d_den:
        raise ValueError(f"need 0 < d_num < d_den, got {d_num}/{d_den}")

    e = edges.select(
        F.col(src).cast("long").alias("_s"), F.col(dst).cast("long").alias("_d")
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    n = nodes.count()  # scalar contract (tfidf n_docs / bm25 avgdl)
    init = SCALE // n
    base = ((d_den - d_num) * init) // d_den

    scores = nodes.select("node", F.lit(init).cast("long").alias("score_q"))
    for _ in range(n_iter):
        # 64-bit integer DIV (not double /): bit-exact vs the SQL oracle
        inflow = (
            e.join(deg, on="_s")
            .join(scores, on=F.col("_s") == F.col("node"))
            .select(
                F.col("_d").alias("node"),
                F.expr("score_q DIV _deg").alias("_sh"),
            )
            .groupBy("node")
            .agg(F.sum("_sh").alias("_in"))
        )
        scores = (
            nodes.join(inflow, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({d_num} * coalesce(_in, 0)) DIV {d_den}")
                ).cast("long").alias("score_q"),
            )
        )
    return scores


def triangle_counts(edges_df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact per-vertex triangle counts (the clustering-coefficient /
    community-detection primitive; GraphX ``TriangleCount`` semantics)
    over an undirected simple graph given as (a, b) pairs (either
    orientation, duplicates tolerated; self-loops dropped).

    Scale shape — the degree-ordered orientation that makes distributed
    triangle counting tractable (Suri-Vassilvitskii / Cohen): every
    edge is oriented from its (degree, id)-smaller endpoint, which
    turns the graph into a DAG whose out-degrees are O(sqrt(m)) — so
    the wedge join (out-edges self-joined on their source) cannot blow
    up on celebrity vertices the way a naive neighbor join does. One
    groupBy for degrees (+ a broadcast-sized join back), ONE wedge
    self-join, ONE closing equi-join against the oriented edge set,
    then an explode-by-corner groupBy. Every join is an equi-join.

    → (id, n_tri) long rows, one per vertex in >= 1 triangle."""
    e_raw = edges_df.select(
        F.col(a).cast("long").alias("_x"), F.col(b).cast("long").alias("_y")
    ).where(F.col("_x") != F.col("_y"))
    und = e_raw.select(
        F.least("_x", "_y").alias("_u"), F.greatest("_x", "_y").alias("_v")
    ).distinct()
    deg = (
        und.select(F.col("_u").alias("_n")).unionAll(
            und.select(F.col("_v").alias("_n")))
        .groupBy("_n").agg(F.count(F.lit(1)).alias("_d"))
    )
    # orient each edge out of its (degree, id)-smaller endpoint
    ed = (
        und.join(deg.select(F.col("_n").alias("_u"), F.col("_d").alias("_du")),
                 on="_u")
        .join(deg.select(F.col("_n").alias("_v"), F.col("_d").alias("_dv")),
              on="_v")
        .select(
            F.when((F.col("_du") < F.col("_dv"))
                   | ((F.col("_du") == F.col("_dv"))
                      & (F.col("_u") < F.col("_v"))),
                   F.struct(F.col("_u").alias("s"), F.col("_v").alias("t")))
            .otherwise(
                F.struct(F.col("_v").alias("s"), F.col("_u").alias("t")))
            .alias("_e")
        )
        .select(F.col("_e.s").alias("s"), F.col("_e.t").alias("t"))
    )
    # wedges out of s: (t1, t2) with t1 "before" t2 in the same order
    o1 = ed.select("s", F.col("t").alias("t1"))
    o2 = ed.select("s", F.col("t").alias("t2"))
    w = o1.join(o2, on="s").where(F.col("t1") != F.col("t2"))
    closing = ed.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = w.join(closing, on=["t1", "t2"]).select(
        F.col("s").alias("c1"), F.col("t1").alias("c2"),
        F.col("t2").alias("c3"),
    )
    corners = (
        tri.select(F.col("c1").alias("id"))
        .unionAll(tri.select(F.col("c2").alias("id")))
        .unionAll(tri.select(F.col("c3").alias("id")))
    )
    return corners.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


def clustering_coefficient(
    edges_df: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Exact local clustering-coefficient NUMERATORS (networkx
    ``clustering`` without the float division): per vertex, n_tri
    (triangles through it) and n_wedges = d*(d-1)/2 (its possible
    closures) — cc = n_tri / n_wedges is the caller's one float step,
    while thresholds compare cross-multiplied integers. Vertices of
    degree >= 1 all appear (n_tri 0 where none close).

    Composition: triangle_counts (degree-ordered, equi-joins only) +
    one degree groupBy + one left join. → (id, degree, n_tri,
    n_wedges) long rows."""
    e_raw = edges_df.select(
        F.col(a).cast("long").alias("_x"), F.col(b).cast("long").alias("_y")
    ).where(F.col("_x") != F.col("_y"))
    und = e_raw.select(
        F.least("_x", "_y").alias("_u"), F.greatest("_x", "_y").alias("_v")
    ).distinct()
    deg = (
        und.select(F.col("_u").alias("id")).unionAll(
            und.select(F.col("_v").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges_df, a, b)
    d = F.col("degree").cast("long")
    return (
        deg.join(tri, on="id", how="left")
        .select(
            "id", d.alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            (d * (d - F.lit(1)) / F.lit(2)).cast("long").alias("n_wedges"),
        )
    )


def bfs_hops(
    edges_df: DataFrame,
    sources_df: DataFrame,
    a: str = "a",
    b: str = "b",
    id_col: str = "id",
    max_rounds: int = 64,
) -> DataFrame:
    """Unweighted multi-source shortest hop counts (GraphX ``Pregel``
    BFS / SQL shortest-path): for every vertex reachable from ANY
    source, the minimum number of edges to the nearest source. The
    grid-world twin is cost_distance; this is the general-graph form.

    Frontier rounds: only newly-settled vertices expand (each edge
    carries a frontier at most twice — once per endpoint — so total
    shuffle volume is O(E) across ALL rounds, not O(E * diameter));
    per-round localCheckpoint truncates lineage, driver state is one
    boolean per round (the emptiness check that also certifies
    convergence). Raises if the diameter exceeds ``max_rounds`` —
    silent truncation would be wrong, loud is right.

    → (id, hops) long rows."""
    und0 = edges_df.select(
        F.col(a).cast("long").alias("_x"), F.col(b).cast("long").alias("_y")
    ).where(F.col("_x") != F.col("_y"))
    adj = und0.unionAll(
        und0.select(F.col("_y").alias("_x"), F.col("_x").alias("_y"))
    ).distinct()
    settled = sources_df.select(
        F.col(id_col).cast("long").alias("id"), F.lit(0).cast("long").alias("hops")
    ).distinct().localCheckpoint()
    frontier = settled
    for rnd in range(1, int(max_rounds) + 1):
        nxt = (
            frontier.join(adj, frontier["id"] == adj["_x"])
            .select(F.col("_y").alias("id"),
                    (F.col("hops") + F.lit(1)).alias("hops"))
            .distinct()
            .join(settled.select("id"), on="id", how="left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            return settled
        settled = settled.unionAll(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"bfs_hops did not converge within {max_rounds} rounds; "
        "raise max_rounds for graphs of larger hop diameter"
    )
