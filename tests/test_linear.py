"""nearest_segment_join (point→nearest-segment snap) vs brute force:
clamped-projection distance, radius cut, quantized-rank tie-break,
degenerate zero-length segments."""

from __future__ import annotations

import math

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.linear import nearest_segment_join

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def _segs_df(spark, segs):
    return spark.createDataFrame(
        [(int(i), float(a), float(b), float(c), float(d))
         for i, (a, b, c, d) in enumerate(segs)],
        "seg_id long, ax double, ay double, bx double, by double",
    )


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(pts)],
        "qid long, x double, y double",
    )


def _d2q(p, s):
    ax, ay, bx, by = s
    abx, aby = bx - ax, by - ay
    apx, apy = p[0] - ax, p[1] - ay
    ab2 = abx * abx + aby * aby
    t = max(0.0, min(1.0, (apx * abx + apy * aby) / ab2)) if ab2 > 0 else 0.0
    dx, dy = apx - t * abx, apy - t * aby
    return math.floor((dx * dx + dy * dy) * 1e6)


def _oracle(segs, pts, r):
    out = {}
    for qi, p in enumerate(pts):
        best = None
        for si, s in enumerate(segs):
            dq = _d2q(p, s)
            ax, ay, bx, by = s
            abx, aby = bx - ax, by - ay
            apx, apy = p[0] - ax, p[1] - ay
            ab2 = abx * abx + aby * aby
            t = max(0.0, min(1.0, (apx * abx + apy * aby) / ab2)) if ab2 > 0 else 0.0
            dx, dy = apx - t * abx, apy - t * aby
            if dx * dx + dy * dy <= r * r and (best is None or (dq, si) < best):
                best = (dq, si)
        if best is not None:
            out[qi] = (best[1], best[0])
    return out


def test_nearest_segment_random(spark):
    rng = np.random.default_rng(61)
    segs = [
        (a, b, a + rng.uniform(-6, 6), b + rng.uniform(-6, 6))
        for a, b in rng.uniform(0, 100, (80, 2))
    ]
    pts = list(map(tuple, rng.uniform(0, 100, (60, 2))))
    got = {
        r["qid"]: (r["seg_id"], r["dist2_q"])
        for r in nearest_segment_join(
            _segs_df(spark, segs), _pts_df(spark, pts), 5.0, CFG
        ).collect()
    }
    assert got == _oracle(segs, pts, 5.0)
    assert got


def test_nearest_segment_degenerate_and_tiebreak(spark):
    # two zero-length segments equidistant from the point: quantized
    # distances tie → smaller seg_id wins; interior projection beats
    # a closer endpoint-distance segment
    segs = [
        (11.0, 10.0, 11.0, 10.0),   # degenerate, d=2
        (7.0, 10.0, 7.0, 10.0),     # degenerate, d=2 — same quantum, id 1
        (0.0, 9.0, 20.0, 9.0),      # horizontal line, d=1 (projection)
    ]
    pts = [(9.0, 10.0)]
    rows = nearest_segment_join(
        _segs_df(spark, segs), _pts_df(spark, pts), 5.0, CFG
    ).collect()
    assert len(rows) == 1
    assert rows[0]["seg_id"] == 2 and rows[0]["dist2_q"] == 1_000_000
    # drop the line: the degenerate tie resolves to seg 0
    rows2 = nearest_segment_join(
        _segs_df(spark, segs[:2]), _pts_df(spark, pts), 5.0, CFG
    ).collect()
    assert rows2[0]["seg_id"] == 0 and rows2[0]["dist2_q"] == 4_000_000


def test_nearest_segment_out_of_range_empty(spark):
    segs = [(0.0, 0.0, 1.0, 0.0)]
    pts = [(50.0, 50.0)]
    assert nearest_segment_join(
        _segs_df(spark, segs), _pts_df(spark, pts), 2.0, CFG
    ).count() == 0
    with pytest.raises(ValueError, match="radius"):
        nearest_segment_join(
            _segs_df(spark, segs), _pts_df(spark, pts), -1.0, CFG
        )


def _clip_len_q(seg, cx0, cy0, cw, side, idx, ext=100.0):
    ax, ay, bx, by = seg
    dx, dy = bx - ax, by - ay

    def axis(d, a, lo, hi, i):
        if d > 0:
            return (lo - a) / d, (hi - a) / d
        if d < 0:
            return (hi - a) / d, (lo - a) / d
        # degenerate axis: the clamped floor-routing cell owns it
        own = 0.0 <= a <= ext and max(0, min(side - 1, math.floor(a / ext * side))) == i
        return (0.0, 1.0) if own else (2.0, -1.0)

    xl, xh = axis(dx, ax, cx0, cx0 + cw, idx[0])
    yl, yh = axis(dy, ay, cy0, cy0 + cw, idx[1])
    t0, t1 = max(0.0, xl, yl), min(1.0, xh, yh)
    ln = (t1 - t0) * math.sqrt(dx * dx + dy * dy) if t1 > t0 else 0.0
    return math.floor(ln * 1e6)


def test_line_density_vs_brute(spark):
    from python_prtree_spark.operators.linear import line_density

    rng = np.random.default_rng(71)
    segs = [
        (a, b, a + rng.uniform(-30, 30), b + rng.uniform(-30, 30))
        for a, b in rng.uniform(0, 100, (50, 2))
    ]
    segs += [(20.0, 5.0, 20.0, 95.0),   # vertical, interior of a column
             (5.0, 50.0, 95.0, 50.0),   # horizontal ON the iy=3/4 cell edge
             (40.0, 40.0, 40.0, 40.0)]  # degenerate point
    side, cw = 8, 100.0 / 8
    exp = {}
    for s in segs:
        for cell in range(side * side):
            lq = _clip_len_q(
                s, (cell // side) * cw, (cell % side) * cw, cw,
                side, (cell // side, cell % side),
            )
            if lq > 0:
                n, t = exp.get(cell, (0, 0))
                exp[cell] = (n + 1, t + lq)
    df = line_density(_segs_df(spark, segs), CFG)
    got = {r["cell"]: (r["n_segs"], r["len_q"]) for r in df.collect()}
    assert got == exp
    # the long horizontal line crosses every column band once
    row_cells = [c for c in exp if (c % side) == int(50.0 // cw)]
    assert len(row_cells) >= side


def test_segment_intersection_join_cases(spark):
    from python_prtree_spark.operators.linear import segment_intersection_join

    def adf(rows, idc):
        return spark.createDataFrame(
            [(int(i), float(a), float(b), float(c), float(d))
             for i, (a, b, c, d) in enumerate(rows)],
            f"{idc} long, ax double, ay double, bx double, by double",
        )

    a = [
        (10, 10, 20, 20),   # 0: crossing b0
        (0, 5, 5, 0),       # 1: bbox overlaps b1 but segments miss
        (30, 30, 40, 30),   # 2: touches b2 at an endpoint
        (50, 50, 60, 50),   # 3: collinear overlap with b3
        (70, 70, 70, 70),   # 4: degenerate point ON b4
    ]
    b = [
        (20, 10, 10, 20),   # crosses a0
        (0, 0, 1, 1),       # near a1, no hit
        (40, 30, 45, 35),   # endpoint touch with a2
        (55, 50, 90, 50),   # collinear overlap with a3
        (65, 70, 75, 70),   # horizontal through the a4 point
    ]
    got = {
        (r["a_id"], r["b_id"])
        for r in segment_intersection_join(adf(a, "a_id"), adf(b, "b_id"), CFG).collect()
    }
    assert (0, 0) in got
    assert (1, 1) not in got
    assert (2, 2) in got
    assert (3, 3) in got
    assert (4, 4) in got


def test_segment_intersection_random_vs_brute(spark):
    from python_prtree_spark.operators.linear import segment_intersection_join

    def brute(p1, p2, q1, q2):
        def cross(o, p, q):
            return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

        def on(p, q, r):
            return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                    and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

        d1, d2 = cross(q1, q2, p1), cross(q1, q2, p2)
        d3, d4 = cross(p1, p2, q1), cross(p1, p2, q2)
        if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 \
                and ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0:
            return True
        return (d1 == 0 and on(q1, q2, p1)) or (d2 == 0 and on(q1, q2, p2)) \
            or (d3 == 0 and on(p1, p2, q1)) or (d4 == 0 and on(p1, p2, q2))

    rng = np.random.default_rng(91)
    a = [(x, y, x + rng.uniform(-10, 10), y + rng.uniform(-10, 10))
         for x, y in rng.uniform(0, 100, (60, 2))]
    b = [(x, y, x + rng.uniform(-10, 10), y + rng.uniform(-10, 10))
         for x, y in rng.uniform(0, 100, (60, 2))]

    def adf(rows, idc):
        return spark.createDataFrame(
            [(int(i), float(p), float(q), float(r), float(s))
             for i, (p, q, r, s) in enumerate(rows)],
            f"{idc} long, ax double, ay double, bx double, by double",
        )

    got = {
        (r["a_id"], r["b_id"])
        for r in segment_intersection_join(adf(a, "a_id"), adf(b, "b_id"), CFG).collect()
    }
    exp = {
        (i, j)
        for i, s1 in enumerate(a) for j, s2 in enumerate(b)
        if brute((s1[0], s1[1]), (s1[2], s1[3]), (s2[0], s2[1]), (s2[2], s2[3]))
    }
    assert got == exp
    assert exp
