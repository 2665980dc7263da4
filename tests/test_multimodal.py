"""Multimodal plumbing: schema, Arrow batching, stub kernels."""

import pytest

from industrial_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake", 640, 480, None, None),
        (2, "video", b"\x00vid", None, None, 3500, None),
        (3, "audio", b"RIFFfake", None, None, 2000, 44100),
        (4, "image", None, None, None, None, None),   # NULL payload
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_extraction_shape_and_determinism(media):
    out = MM.extract_features(media).collect()
    by_id = {r.media_id: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}
    assert len(by_id[1].feature) == MM.FEATURE_DIM
    assert all(0 <= x < 1 for x in by_id[1].feature)
    assert by_id[4].feature is None  # NULL payload propagates
    # deterministic across runs
    again = {r.media_id: r.feature for r in
             MM.extract_features(media).collect()}
    assert again[1] == by_id[1].feature


def test_frame_sampling_expansion(media):
    frames = MM.sample_frames(media, every_ms=1000).collect()
    assert {f.media_id for f in frames} == {2}  # only the video row
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]  # 3500ms/1000
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]
    assert len({f.frame_hash for f in frames}) == 4  # distinct per frame


def test_resize_updates_metadata_only(media):
    out = MM.resize_images(media, 128, 128).collect()
    assert all(r.kind == "image" for r in out)
    assert all(r.width == 128 and r.height == 128 for r in out)


def test_real_decode_raises_not_implemented(media):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        MM.extract_features(media, decode_stub=False).collect()
