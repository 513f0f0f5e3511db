"""Multimodal plumbing: Arrow batch shapes, deterministic fake decode, and
the NotImplementedError gate where real codecs would plug in."""

import hashlib

import pytest

from suckit_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.attach_payload(docs).cache()


def test_meta_deterministic(spark, media):
    meta = {r.media_id: r for r in multimodal.extract_media_meta(media).collect()}
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(meta) == set(rows)
    for mid, payload in list(rows.items())[:50]:
        m = meta[mid]
        assert m.n_bytes == len(payload)
        assert m.content_md5 == hashlib.md5(payload).hexdigest()
        assert 1 <= m.width <= 1920 and 1 <= m.height <= 1080


def test_frames_shape(spark, media):
    frames = multimodal.sample_frames(media, every_n_bytes=64,
                                      max_frames=4).collect()
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    for mid, fs in list(by_media.items())[:30]:
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(idxs)))
        for f in fs:
            assert f.frame_md5 == hashlib.md5(bytes(f.frame_bytes)).hexdigest()


def test_real_decode_is_gated(spark, media):
    with pytest.raises(Exception) as exc:
        multimodal.extract_media_meta(media, real=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError)
