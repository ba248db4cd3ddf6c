"""Multimodal plumbing: binary columns through Arrow batches, stubbed
decode, frame-sampling explode plan."""

import pytest

from napalm_logs_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    real_decoder,
    synth_media_pandas,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(synth_media_pandas(n=30), schema=MEDIA_SCHEMA)


def test_feature_extraction_roundtrip(media):
    out = extract_features(media).orderBy("media_id").collect()
    assert len(out) == 30
    assert all(len(r.features) == 8 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.features)
    # deterministic: same payload → same digest/features across partitions
    again = extract_features(media.repartition(7)).orderBy("media_id").collect()
    assert [r.digest for r in out] == [r.digest for r in again]
    assert [r.features for r in out] == [r.features for r in again]


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        real_decoder("image", b"...")


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=200).collect()
    vids = media.filter("kind = 'video'").count()
    assert len(frames) == vids * 5  # 1000ms / 200ms
    assert all(r.frame_off_ms % 200 == 0 for r in frames)


def test_resize_images_box_math_and_determinism(spark):
    from napalm_logs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
        synth_media_pandas,
    )

    pdf = synth_media_pandas(n=32, seed=7)
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(df, max_side=48).collect()}
    src = {int(r.media_id): r for _, r in pdf[pdf["kind"] == "image"].iterrows()}
    assert set(out) == set(src)
    for mid, r in out.items():
        w, h = src[mid]["width"], src[mid]["height"]
        assert max(r.out_width, r.out_height) <= 48
        if max(w, h) <= 48:  # never upscale
            assert (r.out_width, r.out_height) == (w, h)
        else:  # aspect preserved within rounding
            assert abs(r.out_width / r.out_height - w / h) < 0.1
    # stable under repartitioning (pure per-row stage)
    out2 = {
        r.media_id: r.resized_digest
        for r in resize_images(df.repartition(7), max_side=48).collect()
    }
    assert out2 == {k: v.resized_digest for k, v in out.items()}
