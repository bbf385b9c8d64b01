"""Image codec + multimodal plumbing + text analysis + the deterministic
image+caption table (BASELINE.json input_hint invariants)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_prtree_spark.functions.codec import decode_image, phash64
from python_prtree_spark.functions.text import langid_col, quality_cols, token_count_col
from python_prtree_spark.operators.multimodal import (
    audio_features_stub,
    decode_stats,
    recompute_phash,
    resize_images,
    verify_roundtrip,
    video_frame_sample_stub,
)
from python_prtree_spark.sources.datagen import boxes_pdf, gen_pixels, image_table


@pytest.fixture(scope="module")
def images(spark):
    return image_table(spark, 200, partitions=4).cache()


def test_image_table_deterministic(spark, images):
    """Same seed → identical table, including bytes and phash; footprints
    match the driver-side twin."""
    rows = {r["id"]: r for r in images.collect()}
    assert len(rows) == 200
    again = {r["id"]: r for r in image_table(spark, 200, partitions=2).collect()}
    for i in (0, 7, 199):
        assert bytes(rows[i]["bytes"]) == bytes(again[i]["bytes"])
        assert rows[i]["phash"] == again[i]["phash"]
        assert rows[i]["caption"] == again[i]["caption"]
    b = boxes_pdf(200)
    for i in (0, 42, 150):
        assert rows[i]["xmin"] == pytest.approx(b[i, 0])
        assert rows[i]["ymax"] == pytest.approx(b[i, 3])


def test_per_row_invariants(spark, images):
    """input_hint: decoded-pixel exactness (raw) / PSNR >= 40 dB (lossy) +
    caption equality per row."""
    vr = verify_roundtrip(images)
    bad = vr.where(~F.col("ok")).count()
    assert bad == 0
    lossy_min = vr.where(F.col("fmt") == "lossy").agg(F.min("psnr")).collect()[0][0]
    assert lossy_min >= 40.0
    # caption equality: regenerate caption from id and compare
    recon = images.select(
        "id", "caption",
        F.format_string("img%010d", F.col("id")).alias("img_name"),
    ).where(~F.col("caption").contains(F.col("img_name")))
    assert recon.count() == 0


def test_phash_roundtrip(spark, images):
    """Stored phash == phash recomputed from decoded pixels, distributed."""
    j = recompute_phash(images).join(images.select("image_id", "phash"), on="image_id")
    assert j.where(F.col("phash") != F.col("phash2")).count() == 0
    # and against the driver-side kernel
    r0 = images.where(F.col("id") == 3).first()
    assert phash64(gen_pixels(3, r0["w"], r0["h"])) == r0["phash"]


def test_decode_stats(spark, images):
    st = {r["image_id"]: r for r in decode_stats(images).collect()}
    r5 = images.where(F.col("id") == 5).first()
    px = decode_image(bytes(r5["bytes"]))
    m = px.reshape(-1, 3).mean(axis=0)
    s = st[r5["image_id"]]
    assert (s["w"], s["h"]) == (r5["w"], r5["h"])
    assert s["mean_r"] == pytest.approx(m[0])


def test_resize(spark, images):
    out = resize_images(images.limit(10), 8, 8)
    rows = out.collect()
    assert all(r["w"] == 8 and r["h"] == 8 for r in rows)
    px = decode_image(bytes(rows[0]["bytes"]))
    assert px.shape == (8, 8, 3)


def test_audio_video_stubs(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [1, 2], "bytes": [b"\x00\x7f\xff" * 100, b"\x10" * 50]})
    )
    rows = {r["clip_id"]: r for r in audio_features_stub(df).collect()}
    assert rows[1]["n_samples"] == 300 and rows[2]["rms"] >= 0
    with pytest.raises(Exception, match="NotImplementedError|external codec"):
        audio_features_stub(df, real_decode=True).collect()
    vdf = df.withColumnRenamed("clip_id", "video_id")
    frames = video_frame_sample_stub(vdf, every_n=1).collect()
    assert len(frames) >= 2
    with pytest.raises(Exception, match="NotImplementedError|external codec"):
        video_frame_sample_stub(vdf, real_decode=True).collect()


# ---------------------------------------------------------------------------
# text analysis on the driver-provided documents table
# ---------------------------------------------------------------------------

def test_text_metrics(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        "doc_id", "text",
        token_count_col("text").alias("n_tok"),
        *[v.alias(k) for k, v in quality_cols("text").items()],
    ).limit(20).collect()
    for r in out:
        assert r["n_tok"] == len(r["text"].split())
        assert r["n_chars"] == len(r["text"])


def test_langid_heuristic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [
            "the cat is a friend of the dog and the bird",
            "le chat est dans la maison et les oiseaux",
            "xyzzy plugh qwerty",
        ]})
    )
    got = {r["doc_id"]: r["pred"] for r in
           df.select("doc_id", langid_col("text").alias("pred")).collect()}
    assert got[0] == "en" and got[1] == "fr" and got[2] == "und"


def test_tile_caption_invariant(spark):
    """North-star per-row contract: every image gets a tile and its caption
    equals the recomputed caption (caption equality per row) — driver entry
    mm_tile_caption must be all-true, not merely row-producing."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    df = e._q_mm_tile_caption(spark, None)
    assert df.count() == 500
    assert df.where(~F.col("caption_ok")).count() == 0
    side = 1 << e.CFG.level
    rng = df.agg(F.min("tile"), F.max("tile")).collect()[0]
    assert 0 <= rng[0] and rng[1] < side * side


def test_pii_cols_counts_and_redaction(spark):
    from python_prtree_spark.functions.text import pii_cols

    rows = [
        (1, "write to bob.smith+x@mail-host.org or call +555-123-4567 now"),
        (2, "two mails a@b.co c.d@e.io and ip 192.168.0.1 plus 555-000-1111"),
        (3, "clean text, no pii at all"),
        # phone-shaped local part swallowed by the email match: counted as
        # neither phone nor ip (counts == placeholder occurrences)
        (4, "mail 555-123-4567@mail.co only"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    ne, np_, ni, red = pii_cols("text")
    got = {
        r["id"]: (r["e"], r["p"], r["i"], r["r"])
        for r in df.select(
            "id", ne.alias("e"), np_.alias("p"), ni.alias("i"), red.alias("r")
        ).collect()
    }
    assert got[1][:3] == (1, 1, 0)
    assert got[1][3] == "write to <EMAIL> or call <PHONE> now"
    assert got[2][:3] == (2, 1, 1)
    assert got[2][3] == "two mails <EMAIL> <EMAIL> and ip <IP> plus <PHONE>"
    assert got[3] == (0, 0, 0, "clean text, no pii at all")
    assert got[4] == (1, 0, 0, "mail <EMAIL> only")


def test_bm25_scores_vs_brute_force(spark):
    import math

    from python_prtree_spark.functions.text import bm25_scores

    corpus = [
        (0, "spark table spark merge"),
        (1, "table row row row"),
        (2, "window hash hash spark"),
        (3, "nothing relevant here"),
    ]
    q = ["spark", "table", "hash"]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hits"], r["score_q"])
        for r in bm25_scores(df, q).collect()
    }
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = float(sum(len(t) for t in toks.values()) / n)
    exp = {}
    for d, t in toks.items():
        hits = 0
        score = 0
        for term in q:
            tf = t.count(term)
            if tf == 0:
                continue
            df_t = sum(1 for tt in toks.values() if term in tt)
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            w = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(t) / avgdl)))
            hits += 1
            score += math.floor((idf * w) * 1e6)
        if hits:
            exp[d] = (hits, score)
    assert got == exp
    assert 3 not in got  # no query term → no row


def test_bm25_rejects_empty_query(spark):
    import pytest as _pytest

    from python_prtree_spark.functions.text import bm25_scores

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="query_terms"):
        bm25_scores(df, [])
