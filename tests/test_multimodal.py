"""Multimodal plumbing: deterministic fake decode, frame sampling,
stub gating (NotImplementedError without a codec)."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from tweetf0rm_spark.multimodal import (
    FEAT_DIM,
    _fake_feature,
    decode_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"x" * 40),
        (2, "audio", b"y" * 17),
        (3, "video", b"z" * 64),
        (4, "video", b"w" * 5),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )


def test_decode_features_deterministic(spark, media):
    out = decode_features(media, fake=True).orderBy("media_id").collect()
    assert [r.media_id for r in out] == [1, 2, 3, 4]
    assert all(r.feat_dim == FEAT_DIM for r in out)
    assert [r.byte_len for r in out] == [40, 17, 64, 5]
    expect = _fake_feature(b"x" * 40)
    assert out[0].feature == pytest.approx(list(expect))
    # run twice → identical (pure function of bytes)
    again = decode_features(media, fake=True).orderBy("media_id").collect()
    assert [r.feature for r in again] == [r.feature for r in out]


def test_decode_without_codec_raises(spark, media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media, fake=False).collect()


def test_sample_frames_shape(spark, media):
    frames = sample_frames(media, every_n_bytes=16).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # only video rows; 64 bytes → 4 frames, 5 bytes → max(1, 0)=1 frame
    assert set(by_id) == {3, 4}
    assert len(by_id[3]) == 4
    assert len(by_id[4]) == 1
    assert sorted(r.frame_idx for r in by_id[3]) == [0, 1, 2, 3]
    assert by_id[3][0].frame_md5 == hashlib.md5(b"z" * 16).hexdigest()
