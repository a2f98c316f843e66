"""Multimodal plumbing tests: Arrow-batched decode/feature extraction over
binary columns, metadata-only plans (no blob reads), stubbed codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.functions.multimodal import (
    decode_image,
    extract_image_features,
    fake_decode_image,
    frame_sample_plan,
    resize_plan,
    synth_image_table,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def images(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return synth_image_table(spark, docs, "doc_id", "text").cache()


def test_feature_extraction_shape_and_determinism(images):
    out = extract_image_features(images).collect()
    assert len(out) == 50
    for r in out:
        assert len(r["features"]) == 16
    # deterministic: same input -> same features on a second run
    again = {r["id"]: r["features"] for r in extract_image_features(images).collect()}
    for r in out:
        assert again[r["id"]] == r["features"]


def test_arrow_twin_matches_pandas_path(images):
    """mapInArrow (zero-copy RecordBatch) must produce byte-identical
    features to the mapInPandas twin -- the two paths differ only in the
    Python-side transport, never in results."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.multimodal import (
        extract_image_features_arrow,
    )

    pandas_out = {
        r["id"]: (r["features"], r["width"])
        for r in extract_image_features(images).collect()
    }
    arrow_out = {
        r["id"]: (r["features"], r["width"])
        for r in extract_image_features_arrow(images).collect()
    }
    assert arrow_out == pandas_out


def test_decode_stub_raises_without_codec():
    try:
        import PIL  # noqa: F401

        pytest.skip("codec present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_is_pure():
    a = fake_decode_image(b"hello world")
    b = fake_decode_image(b"hello world")
    c = fake_decode_image(b"hello worlds")
    assert (a == b).all() and not (a == c).all()


def test_resize_plan_prunes_binary(spark, sf_dir):
    # UNcached table with a lineage distinct from the cached fixture's
    # (same plan fragment would be silently swapped for the cached
    # InMemoryRelation by Spark's cache manager, defeating the assertion)
    docs = load_table(spark, sf_dir, "documents").limit(49)
    fresh = synth_image_table(spark, docs, "doc_id", "text")
    plan = resize_plan(fresh, max_side=128)
    rows = plan.collect()
    assert all(max(r["target_w"], r["target_h"]) <= 128 for r in rows)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "content" not in explained


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, bytearray(b"v"), (30.0, 10.0, "fake/mp4"))],
        "id long, content binary, meta struct<fps: double, duration_s: double, format: string>",
    )
    out = frame_sample_plan(vids, every_s=2.0).collect()[0]
    assert out["frame_indices"] == [0, 60, 120, 180, 240, 300]


def test_audio_features_match_numpy_reference(spark, sf_dir):
    """The distributed audio path must equal a driver-side numpy
    recomputation exactly (same fake decode, same rounding)."""
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.multimodal import (
        extract_audio_features,
        fake_decode_audio,
        synth_audio_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = synth_audio_table(spark, docs, "doc_id", "text")
    got = {r["id"]: r for r in extract_audio_features(media).collect()}
    assert len(got) == 20

    for row in media.collect():
        sr, n = row["meta"]["sample_rate"], row["meta"]["n_samples"]
        pcm = fake_decode_audio(bytes(row["content"]), n)
        zc = int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        r = got[row["id"]]
        assert r["duration_s"] == round(n / sr, 6)
        assert r["rms"] == round(float(np.sqrt(np.mean(pcm**2))), 6)
        assert r["zcr"] == round(zc / (n - 1), 6)


def test_video_frame_plan_prunes_binary(spark, sf_dir):
    """mm03's whole premise: the frame plan must never read the blobs."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.multimodal import (
        synth_video_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(31)
    plan = frame_sample_plan(synth_video_table(spark, docs, "doc_id", "text"), every_s=2.0)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "content" not in explained
