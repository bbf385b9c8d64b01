"""convex_hull vs an O(n^3) brute-force strict-vertex test."""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from python_prtree_spark.operators.polygon import convex_hull


def _pts_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(pts, columns=["x", "y"]), "x long, y long"
    )


def _brute(pts):
    """p is a strict hull vertex iff p is not inside-or-on a
    nondegenerate triangle of other points and not strictly between two
    other points (Caratheodory over the distinct set)."""
    pts = sorted(set(pts))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    out = set()
    for p in pts:
        others = [q for q in pts if q != p]
        covered = False
        for a, b in combinations(others, 2):
            if cross(p, a, b) == 0 and \
               (a[0] - p[0]) * (b[0] - p[0]) + (a[1] - p[1]) * (b[1] - p[1]) < 0:
                covered = True
                break
        if not covered:
            for a, b, c in combinations(others, 3):
                d = cross(a, b, c)
                if d == 0:
                    continue
                s1, s2, s3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
                if (s1 >= 0 and s2 >= 0 and s3 >= 0 and d > 0) or \
                   (s1 <= 0 and s2 <= 0 and s3 <= 0 and d < 0):
                    covered = True
                    break
        if not covered:
            out.add(p)
    return out


def _run(spark, pts):
    return {(r["x"], r["y"]) for r in convex_hull(_pts_df(spark, pts)).collect()}


def test_vs_brute_pseudorandom(spark):
    pts = [((i * 7368787) % 97 - 48, (i * 15485863) % 89 - 44)
           for i in range(60)]
    assert _run(spark, pts) == _brute(pts)


def test_square_grid_keeps_corners_only(spark):
    # every edge midpoint is collinear -> only the 4 corners are strict
    pts = [(x, y) for x in range(5) for y in range(5)]
    assert _run(spark, pts) == {(0, 0), (0, 4), (4, 0), (4, 4)}


def test_collinear_keeps_endpoints(spark):
    pts = [(i, 2 * i) for i in range(10)]
    assert _run(spark, pts) == {(0, 0), (9, 18)}


def test_duplicates_and_tiny_sets(spark):
    assert _run(spark, [(3, 3), (3, 3), (3, 3)]) == {(3, 3)}
    assert _run(spark, [(1, 2), (5, 6), (1, 2)]) == {(1, 2), (5, 6)}
    assert _run(spark, []) == set()


def test_interior_duplicates_of_vertex(spark):
    # duplicated VERTEX coordinates must still count as one vertex
    pts = [(0, 0), (10, 0), (0, 10), (10, 10), (10, 10), (5, 5)]
    assert _run(spark, pts) == {(0, 0), (10, 0), (0, 10), (10, 10)}


def _brute_diameter(pts):
    pts = sorted(set(pts))
    best = None
    for i, a in enumerate(pts):
        for b in pts[i + 1:]:
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            key = (-d2, a[0], a[1], b[0], b[1])
            if best is None or key < best:
                best = key
    if best is None:
        return None
    return (best[1], best[2], best[3], best[4], -best[0])


def test_diameter_vs_brute(spark):
    from python_prtree_spark.operators.polygon import hull_diameter

    pts = [((i * 7368787) % 97 - 48, (i * 15485863) % 89 - 44)
           for i in range(60)]
    rows = hull_diameter(_pts_df(spark, pts)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["x1"], r["y1"], r["x2"], r["y2"], r["d2"]) == _brute_diameter(pts)


def test_diameter_tie_break(spark):
    from python_prtree_spark.operators.polygon import hull_diameter

    # square: both diagonals tie at d2 = 200 -> lexicographic smallest
    pts = [(0, 0), (10, 0), (0, 10), (10, 10), (5, 5)]
    r = hull_diameter(_pts_df(spark, pts)).collect()[0]
    assert (r["x1"], r["y1"], r["x2"], r["y2"], r["d2"]) == _brute_diameter(pts)
    assert r["d2"] == 200 and (r["x1"], r["y1"]) == (0, 0)


def test_diameter_degenerate(spark):
    from python_prtree_spark.operators.polygon import hull_diameter

    assert hull_diameter(_pts_df(spark, [(7, 7)])).collect() == []
    assert hull_diameter(_pts_df(spark, [])).collect() == []


def _jarvis(pts):
    """Independent oracle for larger sets: gift wrapping with
    farthest-on-collinear tie-break (skips non-strict boundary points)."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return set(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    start = pts[0]
    hull, cur = [], start
    while True:
        cand = None
        for q in pts:
            if q == cur:
                continue
            if cand is None:
                cand = q
                continue
            c = cross(cur, cand, q)
            if c < 0 or (c == 0 and d2(cur, q) > d2(cur, cand)):
                cand = q
        hull.append(cand)
        cur = cand
        if cand == start:
            break
    return set(hull)


def test_many_partitions(spark):
    # two-level chain: local hulls then final — exercise >1 partition
    pts = [((i * 2654435761) % 1001 - 500, (i * 2246822519) % 997 - 498)
           for i in range(500)]
    df = _pts_df(spark, pts).repartition(8)
    got = {(r["x"], r["y"]) for r in convex_hull(df).collect()}
    assert got == _jarvis(pts)


def test_jarvis_agrees_with_brute(spark):
    # tie the two oracles together on the small set
    pts = [((i * 7368787) % 97 - 48, (i * 15485863) % 89 - 44)
           for i in range(60)]
    assert _jarvis(pts) == _brute(pts)
