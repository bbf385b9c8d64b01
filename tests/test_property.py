"""Property-based correctness: random box corpora (degenerate boxes,
touching edges, negative / out-of-extent coordinates) against the
closed-interval numpy oracle, through BOTH physical strategies.

Complements the fixed-seed oracle tests: hypothesis explores the
adversarial corners (a box collapsing to a point, probes entirely
outside the configured extent, coordinates straddling cell borders) and
shrinks any failure to a minimal corpus. Cells only route — results may
never depend on the tiling (SURVEY §2.2) — so the engine must match the
oracle for ANY extent/level, including geometry the extent doesn't
cover (clamped into border cells, reference bounding_box.h:104-123
semantics preserved exactly).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_prtree_spark import EngineConfig, Extent, batch_query, query_intersections
from tests.conftest import boxes_df, oracle_pairs

# extent deliberately SMALLER than the coordinate domain below, so some
# geometry always lands outside and exercises border-cell clamping
CFG = EngineConfig(extent=Extent(0, 0, 50, 50), level=3)

coord = st.floats(min_value=-100.0, max_value=150.0,
                  allow_nan=False, allow_infinity=False, width=64)


@st.composite
def box_corpus(draw, max_n=60):
    n = draw(st.integers(min_value=1, max_value=max_n))
    xs = draw(st.lists(coord, min_size=4 * n, max_size=4 * n))
    a = np.array(xs, dtype=np.float64).reshape(n, 4)
    lo = np.minimum(a[:, :2], a[:, 2:])
    hi = np.maximum(a[:, :2], a[:, 2:])
    # bias some rows to degenerate (point) boxes and exact touching
    degen = draw(st.booleans())
    if degen:
        hi[0] = lo[0]
    return np.hstack([lo, hi])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(d=box_corpus(), q=box_corpus(max_n=12))
@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_batch_query_matches_oracle(spark, strategy, d, q):
    got = {
        (r["qid"], r["id"])
        for r in batch_query(
            boxes_df(spark, d), boxes_df(spark, q, "qid"),
            CFG.with_(strategy=strategy),
        ).collect()
    }
    assert got == oracle_pairs(q, d)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(d=box_corpus(max_n=40))
@pytest.mark.parametrize("strategy", ["sql", "packed"])
def test_intersections_matches_oracle(spark, strategy, d):
    got = {
        (r["id_a"], r["id_b"])
        for r in query_intersections(
            boxes_df(spark, d), CFG.with_(strategy=strategy)
        ).collect()
    }
    exp = {
        (i, j)
        for (i, j) in oracle_pairs(d, d)
        if i < j
    }
    assert got == exp
