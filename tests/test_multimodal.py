"""Multimodal plumbing tests: binary+metadata schema, resize and
frame-sample mapInPandas stages, real P6 decode (codec formats stubbed)."""

import pytest

from postfix_log_parser_spark.ext.multimodal import (
    FRAME_BYTES,
    FRAME_EVERY,
    SYNTH_W,
    _fake_resize,
    decode_image,
    extract_features,
    resize_media,
    sample_frames,
    synth_ppm,
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


def test_decode_codec_formats_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_decode_p6_roundtrip():
    """The P6 decoder is real: header tokenizer (with comments) + raster."""
    raster = bytes(range(2 * 3 * 3))
    img = decode_image(b"P6\n# a comment\n3 2\n255\n" + raster)
    assert img.shape == (2, 3, 3)
    assert img.flatten().tolist() == list(range(18))
    # truncated raster is an error, not silent garbage
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n3 2\n255\n" + raster[:-1])
    # 16-bit maxval needs a wider raster layout we don't support
    with pytest.raises(NotImplementedError):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_synth_ppm_decodes_to_expected_gradient():
    img = decode_image(synth_ppm(42, 100))
    h = 1 + 100 % 7
    assert img.shape == (h, SYNTH_W, 3)
    a = (42 * 31) % 256
    n = h * SYNTH_W * 3
    assert int(img.sum()) == sum((a + i) % 256 for i in range(n))


def test_decode_wav_roundtrip():
    """The RIFF/WAVE parser is real: chunk walking, PCM16 validation."""
    import struct

    from postfix_log_parser_spark.ext.multimodal import decode_audio, synth_wav

    s = decode_audio(synth_wav(3, 10))
    assert len(s) == 64 + 10 % 64
    assert s[0] == (3 * 7) % 2048 - 1024
    assert s[5] == (3 * 7 + 13 * 5) % 2048 - 1024
    # unknown chunks are skipped per the RIFF spec (chunk walker, not
    # fixed offsets): splice a junk chunk before fmt/data
    wav = synth_wav(3, 10)
    spliced = wav[:12] + b"JUNK" + struct.pack("<I", 4) + b"abcd" + wav[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert (decode_audio(spliced) == s).all()
    # non-PCM and non-WAV payloads refuse rather than mis-decode
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00 mp3 frame")
    float_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    float_wav = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + float_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_audio(float_wav)


def test_extract_features_runs_real_decode(media):
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    # doc 1: n_chars=300 -> h=1+300%7=7, a=31
    n = 7 * SYNTH_W * 3
    assert rows[1]["n_px"] == n
    assert rows[1]["px_sum"] == sum((31 + i) % 256 for i in range(n))
    assert rows[1]["n_bytes"] == 300  # byte-level features still present


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
