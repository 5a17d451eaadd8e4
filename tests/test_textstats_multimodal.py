"""Text analysis + multimodal plumbing operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators.multimodal import (
    extract_features,
    fake_image_decoder,
    not_implemented_decoder,
    resize_images,
    sample_frames,
    synth_media,
)
from sfa_spark.operators.textstats import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_count,
    tokens,
)


def test_lang_id_on_profiles(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was good"),
            (2, "der hund ist nicht mit der katze und das haus"),
            (3, "le chat est dans la maison et les jardins pour"),
            (4, "el perro y el gato es una casa de los campos"),
            (5, "xyzzy plugh qwerty"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_lang_id_agrees_with_documents_lang(spark, documents):
    # the testdata documents carry a lang column; the heuristic should get
    # a clear majority right on en docs with enough tokens
    en = documents.filter((F.col("lang") == "en") & (F.col("n_chars") > 200))
    n = en.count()
    if n == 0:
        pytest.skip("no long en docs at this sf")
    hits = en.select(lang_id(F.col("text")).alias("g")).filter(F.col("g") == "en").count()
    assert hits / n > 0.5


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! 123 foo-bar")], "id long, text string")
    r = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 4
    assert r["bpe"] > r["ws"]  # punctuation splits add tokens


def test_quality_score_ranks_sanely(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and it was a good day for everyone in the town"),
            (2, "buy buy buy buy buy buy buy buy buy buy"),
            (3, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        ],
        "id long, text string",
    )
    q = {r["id"]: r["quality"] for r in quality_score(df).select("id", "quality").collect()}
    assert q[1] > q[2] > q[3]


def test_rolling_fingerprints_detect_containment(spark):
    long_text = " ".join(f"word{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, long_text), (2, long_text + " extra tail"), (3, "completely different content here")],
        "id long, text string",
    )
    fp = {r["id"]: set(r["fingerprint"]) for r in rolling_fingerprints(df, id_col="id").collect()}
    overlap_12 = len(fp[1] & fp[2]) / len(fp[1])
    overlap_13 = len(fp[1] & fp[3]) / len(fp[1])
    assert overlap_12 > 0.8
    assert overlap_13 == 0.0


def test_multimodal_feature_extraction_fake_decoder(spark):
    media = synth_media(spark, n=12)
    feats = extract_features(media, decoder=fake_image_decoder).toPandas()
    assert len(feats) == 12
    assert all(len(f) > 0 for f in feats["features"])


def test_multimodal_resize_shapes(spark):
    media = synth_media(spark, n=6)
    out = resize_images(media, 8, 8, decoder=fake_image_decoder).toPandas()
    for _, r in out.iterrows():
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
        assert len(bytes(r["payload"])) == 8 * 8 * r["meta"]["channels"]


def test_multimodal_frame_sampling_plan(spark):
    media = synth_media(spark, n=12)
    plan = sample_frames(media, every_ms=500).toPandas()
    assert (plan["ts_ms"] % 500 == 0).all()
    vids = media.filter(F.col("kind") == "video").toPandas()
    for _, v in vids.iterrows():
        frames = plan[plan["media_id"] == v["media_id"]]
        assert len(frames) == v["meta"]["duration_ms"] // 500 + 1


def test_decoder_stub_raises(spark):
    media = synth_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, decoder=not_implemented_decoder).collect()
