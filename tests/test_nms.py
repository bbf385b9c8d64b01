"""NMS (greedy + dominance) vs a brute-force sequential oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.nms import (
    detection_ap,
    fuse_boxes,
    iou_match,
    nms_boxes,
    optimal_iou_match,
    overlap_iou_pairs,
    reliability_bins,
    track_by_iou,
)

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=3)


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter, ar_a + ar_b - inter


def _brute_greedy(pdf, t_num, t_den):
    order = pdf.sort_values(["score", "id"], ascending=[False, True])
    kept = []
    out = {}
    for _, r in order.iterrows():
        box = (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
        dead = False
        for kb in kept:
            inter, union = _iou(box, kb)
            if inter * t_den > t_num * union:
                dead = True
                break
        if not dead:
            kept.append(box)
        out[int(r["id"])] = not dead
    return out


def _brute_dominance(pdf, t_num, t_den):
    rows = pdf.to_dict("records")
    out = {}
    for r in rows:
        dead = False
        for a in rows:
            if (a["score"], -a["id"]) <= (r["score"], -r["id"]):
                continue
            inter, union = _iou(
                (a["xmin"], a["ymin"], a["xmax"], a["ymax"]),
                (r["xmin"], r["ymin"], r["xmax"], r["ymax"]),
            )
            if inter * t_den > t_num * union:
                dead = True
                break
        out[int(r["id"])] = not dead
    return out


def _dets(seed, n=300):
    rng = np.random.default_rng(seed)
    mins = rng.random((n, 2)) * 90
    ext = 1.0 + rng.random((n, 2)) * 8
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "score": rng.integers(0, 50, n),  # small range => real ties
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })


@pytest.mark.parametrize("seed", [7, 23])
@pytest.mark.parametrize("mode,brute", [
    ("greedy", _brute_greedy), ("dominance", _brute_dominance),
])
def test_nms_matches_brute_force(spark, seed, mode, brute):
    pdf = _dets(seed)
    got = nms_boxes(
        spark.createDataFrame(pdf).repartition(8), 1, 2, CFG, mode=mode
    ).toPandas()
    want = brute(pdf, 1, 2)
    assert len(got) == len(pdf)
    assert {int(r.id): bool(r.kept) for r in got.itertuples()} == want


def test_greedy_revives_chain_dominance_kills(spark):
    """A > B > C chain with IoU(A,B) > t, IoU(B,C) > t, IoU(A,C) <= t:
    greedy keeps C (its only suppressor B died), dominance kills it."""
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "score": [90, 80, 70],
        "xmin": [0.0, 6.0, 12.0], "ymin": [0.0, 0.0, 0.0],
        "xmax": [10.0, 16.0, 22.0], "ymax": [10.0, 10.0, 10.0],
    })
    sdf = spark.createDataFrame(pdf)
    g = {int(r.id): bool(r.kept)
         for r in nms_boxes(sdf, 1, 5, CFG, mode="greedy").collect()}
    d = {int(r.id): bool(r.kept)
         for r in nms_boxes(sdf, 1, 5, CFG, mode="dominance").collect()}
    assert g == {1: True, 2: False, 3: True}
    assert d == {1: True, 2: False, 3: False}


def _brute_match(dets, gts, t_num, t_den):
    """Sequential VOC matching: dets by (score DESC, id), each claims the
    unclaimed gt with max IoU among IoU > t, ties -> smaller gt id."""
    claimed = set()
    out = {}
    for _, r in dets.sort_values(["score", "id"], ascending=[False, True]).iterrows():
        box = (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
        best = None
        for _, g in gts[gts["img"] == r["img"]].iterrows():
            if int(g["id"]) in claimed:
                continue
            inter, union = _iou(box, (g["xmin"], g["ymin"], g["xmax"], g["ymax"]))
            if not inter * t_den > t_num * union:
                continue
            key = (-inter / union, int(g["id"]))
            if best is None or key < best[0]:
                best = (key, int(g["id"]))
        if best is not None:
            claimed.add(best[1])
            out[int(r["id"])] = best[1]
        else:
            out[int(r["id"])] = None
    return out


@pytest.mark.parametrize("seed", [11, 42])
def test_iou_match_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    n = 400
    img = rng.integers(0, 12, n)
    mins = rng.random((n, 2)) * 8
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "img": img,
        "score": rng.integers(0, 30, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    dets, gts = pdf[pdf["id"] % 3 != 0], pdf[pdf["id"] % 3 == 0]
    got = iou_match(
        spark.createDataFrame(dets).repartition(8),
        spark.createDataFrame(gts).repartition(8),
        1, 3,
    ).toPandas()
    want = _brute_match(dets, gts, 1, 3)
    assert len(got) == len(dets)
    got_map = {
        int(r.det_id): (None if pd.isna(r.gt_id) else int(r.gt_id))
        for r in got.itertuples()
    }
    assert got_map == want
    # tp flag is exactly "claimed a gt", and each gt claimed at most once
    assert all(bool(r.tp) == (got_map[int(r.det_id)] is not None)
               for r in got.itertuples())
    matched = got.dropna(subset=["gt_id"])
    assert matched.groupby(["img", "gt_id"]).size().max() <= 1


def test_iou_match_gt_only_and_det_only_images(spark):
    """Images with no dets emit nothing; dets with no gts are all FP."""
    dets = pd.DataFrame({
        "id": [1, 2], "img": [0, 0], "score": [9, 8],
        "xmin": [0.0, 1.0], "ymin": [0.0, 1.0],
        "xmax": [4.0, 5.0], "ymax": [4.0, 5.0],
    })
    gts = pd.DataFrame({
        "id": [10], "img": [1],
        "xmin": [0.0], "ymin": [0.0], "xmax": [4.0], "ymax": [4.0],
    })
    got = iou_match(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 2
    ).toPandas()
    assert set(got["img"]) == {0}
    assert not got["tp"].any()
    assert got["gt_id"].isna().all()


def _brute_ap(dets, gts, t_num, t_den):
    """All-points-interpolated AP per class from the brute matcher."""
    match = _brute_match(dets, gts, t_num, t_den)
    out = {}
    for cls in sorted(gts["cls"].unique()):
        dc = dets[dets["cls"] == cls].sort_values(
            ["score", "id"], ascending=[False, True]
        )
        n_gt = int((gts["cls"] == cls).sum())
        tps = [match[int(r["id"])] is not None for _, r in dc.iterrows()]
        precs = []
        ctp = 0
        for k, tp in enumerate(tps, 1):
            ctp += int(tp)
            precs.append(ctp / k)
        # interpolate: running max from the right
        for i in range(len(precs) - 2, -1, -1):
            precs[i] = max(precs[i], precs[i + 1])
        ap_units = sum(
            int(np.floor(p * 1e9)) for p, tp in zip(precs, tps) if tp
        )
        out[int(cls)] = (n_gt, ap_units)
    return out


def test_detection_ap_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    n = 360
    img = rng.integers(0, 18, n)
    mins = rng.random((n, 2)) * 8
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "img": img,
        "cls": img % 3,          # class constant per image
        "score": rng.integers(0, 25, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    dets, gts = pdf[pdf["id"] % 3 != 0], pdf[pdf["id"] % 3 == 0]
    got = detection_ap(
        spark.createDataFrame(dets).repartition(8),
        spark.createDataFrame(gts).repartition(8),
        1, 3,
    ).toPandas()
    want = _brute_ap(dets, gts, 1, 3)
    assert set(got["cls"]) == set(want)
    for r in got.itertuples():
        n_gt, ap_units = want[int(r.cls)]
        assert int(r.n_gt) == n_gt
        assert int(r.ap_units) == ap_units
        assert r.ap == ap_units / 1e9 / n_gt
        assert 0.0 <= r.ap <= 1.0


def test_detection_ap_perfect_detector_is_one(spark):
    """Detections identical to ground truth, one per gt -> AP = 1."""
    gts = pd.DataFrame({
        "id": [1, 2, 3], "img": [0, 0, 1], "cls": [0, 0, 0],
        "xmin": [0.0, 10.0, 0.0], "ymin": [0.0, 10.0, 0.0],
        "xmax": [4.0, 14.0, 4.0], "ymax": [4.0, 14.0, 4.0],
    })
    dets = gts.assign(id=[11, 12, 13], score=[9, 8, 7])
    got = detection_ap(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 2
    ).toPandas()
    assert len(got) == 1
    assert int(got["n_tp"].iloc[0]) == 3
    assert got["ap"].iloc[0] == pytest.approx(1.0, abs=1e-8)


def test_reliability_bins_matches_brute_force(spark):
    rng = np.random.default_rng(77)
    n = 300
    img = rng.integers(0, 15, n)
    mins = rng.random((n, 2)) * 8
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "img": img,
        "score": rng.integers(0, 1000, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    dets, gts = pdf[pdf["id"] % 3 != 0], pdf[pdf["id"] % 3 == 0]
    got = reliability_bins(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 3
    ).toPandas()
    match = _brute_match(dets, gts, 1, 3)
    bins = {}
    for _, r in dets.iterrows():
        b = min(9, int(r["score"]) * 10 // 1000)
        nb, tp, ss = bins.get(b, (0, 0, 0))
        bins[b] = (nb + 1, tp + int(match[int(r["id"])] is not None),
                   ss + int(r["score"]))
    assert set(got["bin"]) == set(bins)
    for r in got.itertuples():
        nb, tp, ss = bins[int(r.bin)]
        assert (int(r.n), int(r.n_tp)) == (nb, tp)
        assert r.acc == tp / nb
        assert r.conf == ss / (nb * 1000.0)
        assert int(r.gap_units) == int(np.floor(abs(tp / nb - ss / (nb * 1000.0)) * nb * 1e9))
    assert int(got["n"].sum()) == len(dets)


def _brute_tracks(pdf, t_num, t_den):
    """Union-find over brute consecutive-frame IoU>t edges."""
    parent = {int(i): int(i) for i in pdf["id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = pdf.to_dict("records")
    for a in rows:
        for b in rows:
            if b["frame"] != a["frame"] + 1:
                continue
            inter, union = _iou(
                (a["xmin"], a["ymin"], a["xmax"], a["ymax"]),
                (b["xmin"], b["ymin"], b["xmax"], b["ymax"]),
            )
            if inter * t_den > t_num * union:
                ra, rb = find(int(a["id"])), find(int(b["id"]))
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in parent}


def test_track_by_iou_matches_union_find(spark):
    rng = np.random.default_rng(31)
    n = 240
    mins = rng.random((n, 2)) * 9
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "frame": rng.integers(0, 20, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    got = track_by_iou(
        spark.createDataFrame(pdf).repartition(8), 1, 5, CFG
    ).toPandas()
    want = _brute_tracks(pdf, 1, 5)
    assert len(got) == n
    assert {int(r.id): int(r.track) for r in got.itertuples()} == want
    # some multi-detection track must exist in this corpus (else the
    # test exercises nothing)
    assert got.groupby("track").size().max() >= 2


def test_track_by_iou_chain_and_gap(spark):
    """A chain over frames 0-1-2 is ONE track; a frame gap (0 -> 2)
    never links even at IoU=1."""
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 10, 11],
        "frame": [0, 1, 2, 5, 7],
        "xmin": [0.0, 0.2, 0.4, 50.0, 50.0],
        "ymin": [0.0, 0.0, 0.0, 50.0, 50.0],
        "xmax": [4.0, 4.2, 4.4, 54.0, 54.0],
        "ymax": [4.0, 4.0, 4.0, 54.0, 54.0],
    })
    got = {
        int(r.id): int(r.track)
        for r in track_by_iou(spark.createDataFrame(pdf), 1, 5, CFG).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == 10 and got[11] == 11


def _gain_matrix(dets, gts, t_num, t_den):
    import numpy as np

    g = np.zeros((len(dets), len(gts)), dtype=np.int64)
    for i, (_, d) in enumerate(dets.iterrows()):
        for j, (_, q) in enumerate(gts.iterrows()):
            inter, union = _iou(
                (d["xmin"], d["ymin"], d["xmax"], d["ymax"]),
                (q["xmin"], q["ymin"], q["xmax"], q["ymax"]),
            )
            if inter * t_den > t_num * union:
                g[i, j] = int(np.floor(inter * 1e6 / union))
    return g


def _brute_best_total(gain):
    """Max total gain over one-to-one assignments, by permutations."""
    import itertools

    nd, ng = gain.shape
    best = 0
    if nd <= ng:
        for perm in itertools.permutations(range(ng), nd):
            best = max(best, sum(gain[i, j] for i, j in enumerate(perm)))
    else:
        for perm in itertools.permutations(range(nd), ng):
            best = max(best, sum(gain[i, j] for j, i in enumerate(perm)))
    return best


def test_optimal_iou_match_is_optimal_vs_permutations(spark):
    rng = np.random.default_rng(3)
    n = 90
    img = rng.integers(0, 18, n)
    mins = rng.random((n, 2)) * 6
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "img": img,
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    dets, gts = pdf[pdf["id"] % 2 == 0], pdf[pdf["id"] % 2 == 1]
    got = optimal_iou_match(
        spark.createDataFrame(dets).repartition(8),
        spark.createDataFrame(gts).repartition(8),
        1, 4,
    ).toPandas()
    # one-to-one
    assert got["det_id"].is_unique and got["gt_id"].is_unique
    for g in set(img):
        dsub = dets[dets["img"] == g]
        gsub = gts[gts["img"] == g]
        if len(dsub) == 0 or len(gsub) == 0 or len(dsub) > 7 or len(gsub) > 7:
            continue
        gain = _gain_matrix(dsub, gsub, 1, 4)
        want = _brute_best_total(gain)
        have = int(got[got["img"] == g]["iou_q"].sum())
        assert have == want, f"img {g}: {have} != optimal {want}"


def test_optimal_beats_greedy_on_crossing_case(spark):
    """Classic greedy trap: the top-score det claims the shared gt,
    optimal reassigns for a higher total."""
    dets = pd.DataFrame({
        "id": [1, 2], "img": [0, 0], "score": [9, 1],
        # det 1 overlaps BOTH gts (better on gt B); det 2 only gt B
        "xmin": [4.0, 8.0], "ymin": [0.0, 0.0],
        "xmax": [12.0, 16.0], "ymax": [4.0, 4.0],
    })
    gts = pd.DataFrame({
        "id": [10, 11], "img": [0, 0],
        "xmin": [0.0, 7.0], "ymin": [0.0, 0.0],
        "xmax": [8.0, 15.0], "ymax": [4.0, 4.0],
    })
    opt = optimal_iou_match(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 10
    ).toPandas()
    m = {int(r.det_id): int(r.gt_id) for r in opt.itertuples()}
    # optimal: det1->gt10, det2->gt11 (total beats det1->gt11 alone)
    assert m == {1: 10, 2: 11}
    gr = iou_match(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 10
    ).toPandas()
    greedy_pairs = {
        int(r.det_id): int(r.gt_id)
        for r in gr.itertuples() if not pd.isna(r.gt_id)
    }
    assert greedy_pairs[1] == 11  # greedy grabs the better single IoU
    gain = _gain_matrix(dets, gts, 1, 10)
    greedy_total = sum(
        gain[[1, 2].index(d), [10, 11].index(g)]
        for d, g in greedy_pairs.items()
    )
    assert int(opt["iou_q"].sum()) > greedy_total


def test_fuse_boxes_weighted_mean_and_singletons(spark):
    """Two overlapping boxes fuse at the score-weighted mean; the far
    singleton passes through unchanged with its own id as cluster."""
    pdf = pd.DataFrame({
        "id": [1, 2, 9],
        "score": [3, 1, 5],
        "xmin": [0.0, 1.0, 50.0], "ymin": [0.0, 1.0, 50.0],
        "xmax": [4.0, 5.0, 54.0], "ymax": [4.0, 5.0, 54.0],
    })
    got = fuse_boxes(spark.createDataFrame(pdf), 1, 5, CFG).toPandas()
    got = got.set_index("cluster")
    assert set(got.index) == {1, 9}
    f = got.loc[1]
    assert int(f.n) == 2 and int(f.score_sum) == 4
    assert f.xmin == (3 * 0 + 1 * 1000) / (4 * 1000.0)
    assert f.xmax == (3 * 4000 + 1 * 5000) / (4 * 1000.0)
    s = got.loc[9]
    assert int(s.n) == 1 and s.xmin == 50.0 and s.ymax == 54.0


def test_fuse_boxes_counts_partition_input(spark):
    rng = np.random.default_rng(21)
    n = 200
    mins = rng.random((n, 2)) * 60
    ext = 1.0 + rng.random((n, 2)) * 5
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "score": rng.integers(1, 30, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    got = fuse_boxes(spark.createDataFrame(pdf).repartition(8), 1, 2, CFG).toPandas()
    assert int(got["n"].sum()) == n          # every box in exactly one cluster
    assert int(got["score_sum"].sum()) == int(pdf["score"].sum())
    # fused boxes stay inside their members' hull: min <= mean <= max
    assert (got["xmin"] <= got["xmax"]).all()
    assert (got["ymin"] <= got["ymax"]).all()


def test_iou_pairs_threshold_is_strict(spark):
    # identical boxes: IoU = 1 -> 1*den > num*1 must use strict >
    pdf = pd.DataFrame({
        "id": [1, 2], "score": [5, 4],
        "xmin": [0.0, 0.0], "ymin": [0.0, 0.0],
        "xmax": [4.0, 4.0], "ymax": [4.0, 4.0],
    })
    sdf = spark.createDataFrame(pdf)
    assert overlap_iou_pairs(sdf, 1, 1, CFG).count() == 0  # t=1: never >
    assert overlap_iou_pairs(sdf, 99, 100, CFG).count() == 1


def test_ap_and_bins_with_per_image_det_ids(spark):
    """ADVICE r5: det ids only unique PER IMAGE must not fan out the
    score join-back in detection_ap / reliability_bins. Oracle: the same
    data with ids bijectively remapped to globally-unique values whose
    (det_id, img) order is preserved (gid = id * 1000 + img) — every
    output column must match exactly."""
    rng = np.random.default_rng(9)
    n = 240
    img = rng.integers(0, 12, n)
    mins = rng.random((n, 2)) * 8
    ext = 1.0 + rng.random((n, 2)) * 3
    pdf = pd.DataFrame({
        # per-image ids: (img, id) unique, raw id heavily repeated
        "id": np.arange(n, dtype=np.int64) // 12,
        "img": img,
        "cls": img % 3,
        "score": rng.integers(0, 25, n),
        "xmin": mins[:, 0], "ymin": mins[:, 1],
        "xmax": mins[:, 0] + ext[:, 0], "ymax": mins[:, 1] + ext[:, 1],
    })
    pdf = pdf.drop_duplicates(["img", "id"]).reset_index(drop=True)
    gpdf = pdf.assign(id=pdf["id"] * 1000 + pdf["img"])  # global twin
    dets, gts = pdf[pdf.index % 3 != 0], pdf[pdf.index % 3 == 0]
    gdets, ggts = gpdf[gpdf.index % 3 != 0], gpdf[gpdf.index % 3 == 0]

    ap = detection_ap(
        spark.createDataFrame(dets).repartition(8),
        spark.createDataFrame(gts).repartition(8), 1, 3,
    ).toPandas().sort_values("cls").reset_index(drop=True)
    ap_g = detection_ap(
        spark.createDataFrame(gdets).repartition(8),
        spark.createDataFrame(ggts).repartition(8), 1, 3,
    ).toPandas().sort_values("cls").reset_index(drop=True)
    for c in ("cls", "n_gt", "n_det", "n_tp", "ap_units"):
        assert list(ap[c]) == list(ap_g[c]), c
    # no fan-out: each class's detections are counted exactly once
    assert int(ap["n_det"].sum()) == len(dets)

    rb = reliability_bins(
        spark.createDataFrame(dets), spark.createDataFrame(gts), 1, 3,
        score_max=25,
    ).toPandas().sort_values("bin").reset_index(drop=True)
    rb_g = reliability_bins(
        spark.createDataFrame(gdets), spark.createDataFrame(ggts), 1, 3,
        score_max=25,
    ).toPandas().sort_values("bin").reset_index(drop=True)
    for c in ("bin", "n", "n_tp", "gap_units"):
        assert list(rb[c]) == list(rb_g[c]), c
    assert int(rb["n"].sum()) == len(dets)
