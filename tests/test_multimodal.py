"""Multimodal plumbing tests: schema, batch shape, deterministic fake
decode, stubbed real decode."""

import numpy as np
import pytest

from scalablevectorsearch_spark.pipeline.multimodal import (
    decode_image,
    extract_features,
    fake_decode,
    media_from_documents,
    media_stats,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(documents):
    return media_from_documents(documents.select("doc_id", "text"))


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<format:string,width:int")


def test_media_stats_match_text_bytes(media, documents):
    stats = {r["media_id"]: r["n_bytes"] for r in media_stats(media).collect()}
    chars = {r["doc_id"]: len(r["text"].encode()) for r in documents.collect()}
    assert stats == chars


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic_and_shaped():
    a = fake_decode(b"hello world", 8, 8)
    b = fake_decode(b"hello world", 8, 8)
    assert a.shape == (8, 8) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, fake_decode(b"other bytes!", 8, 8))


def test_resize_shapes():
    img = fake_decode(b"abcdef", 10, 6)
    assert resize_image(img, 4, 4).shape == (4, 4)
    assert resize_image(img, 16, 3).shape == (3, 16)


def test_extract_features_batch_path(media):
    f = extract_features(media, n_features=8)
    rows = f.collect()
    assert len(rows) == media.count()
    for r in rows[:5]:
        assert len(r["features"]) == 8
        assert all(0 <= v <= 255 for v in r["features"])
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_features(media, 8).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert first == again


def test_sample_frames(media):
    fr = sample_frames(media, every=2)
    rows = fr.collect()
    # n_frames=4, every=2 -> frames 0 and 2 per media row
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2] for v in per.values())
