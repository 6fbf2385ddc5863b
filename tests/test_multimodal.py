"""Multimodal plumbing tests: binary+metadata schema, resize and
frame-sample mapInPandas stages, stubbed decode."""

import pytest

from postfix_log_parser_spark.ext.multimodal import (
    FRAME_BYTES,
    FRAME_EVERY,
    _fake_resize,
    decode_image,
    resize_media,
    sample_frames,
    to_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "a" * 300, 300, "en"),
            (2, "web", "b" * 64, 64, "en"),
            (3, "book", "c" * 65, 65, "de"),
        ],
        "doc_id long, source string, text string, n_chars long, lang string",
    )
    return to_media_table(docs)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_media(media):
    rows = {r["doc_id"]: r for r in resize_media(media, target_bytes=100).collect()}
    assert len(rows[1]["content"]) == 100
    assert rows[1]["meta"]["resized"] is True and rows[1]["meta"]["n_bytes"] == 100
    # payloads at/below target pass through unchanged
    assert bytes(rows[2]["content"]) == b"b" * 64
    # deterministic subsample
    assert bytes(rows[1]["content"]) == _fake_resize(b"a" * 300, 100)


def test_sample_frames(media):
    rows = sorted(
        ((r["doc_id"], r["frame_idx"], len(r["frame"])) for r in
         sample_frames(media).collect())
    )
    # doc1: 300 bytes -> 5 frames (64*4 + 44), sampled j=0,4 -> sizes 64, 44
    # doc2: 64 bytes -> 1 frame, sampled j=0 -> 64
    # doc3: 65 bytes -> 2 frames, sampled j=0 -> 64
    assert rows == [(1, 0, 64), (1, 4, 44), (2, 0, 64), (3, 0, 64)]
    assert FRAME_BYTES == 64 and FRAME_EVERY == 4
