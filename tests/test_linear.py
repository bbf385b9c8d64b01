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
