"""Multimodal plumbing tests: binary+metadata schema, resize and
frame-sample mapInPandas stages, real P6 + PNG decode (codec formats
stubbed)."""

import struct
import zlib

import pytest

from postfix_log_parser_spark.ext.multimodal import (
    FRAME_BYTES,
    FRAME_EVERY,
    SYNTH_W,
    _PNG_SIG,
    _fake_resize,
    decode_image,
    extract_features,
    resize_media,
    sample_frames,
    synth_png,
    synth_ppm,
    to_media_table,
)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _png(w, h, depth, color, interlace, raw) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
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
    # since r9 a JPEG SOI routes into the REAL baseline decoder
    # (ext/jpeg.py) — corrupt entropy data is a clear ValueError, not a
    # not-implemented refusal (those cover progressive/arithmetic/12-bit
    # modes, pinned in test_jpeg.py)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    # a truncated PNG signature is NOT a PNG — generic refusal, not a crash
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_png_decodes_same_pixels_as_ppm():
    """synth_png carries the same gradient raster as synth_ppm through
    real zlib compression with the filter type cycling 0..4 by row —
    heights 1..7 cover every PNG filter, and decoded pixels must be
    byte-identical to the uncompressed P6 twin."""
    for doc_id in (0, 7, 12345):
        for n_chars in (0, 4, 6, 13, 100):
            a = decode_image(synth_ppm(doc_id, n_chars))
            b = decode_image(synth_png(doc_id, n_chars))
            assert a.shape == b.shape and (a == b).all(), (doc_id, n_chars)


def test_png_grayscale_and_rgba_paths():
    # 2x2 grayscale: row 0 filter None, row 1 filter Up
    g = decode_image(_png(2, 2, 8, 0, 0, bytes([0, 10, 20, 2, 5, 5])))
    assert g.shape == (2, 2, 3)
    assert g[0, 0].tolist() == [10, 10, 10]  # gray replicated to RGB
    assert g[1, 0].tolist() == [15, 15, 15]  # Up: 10 + 5
    # 1x1 RGBA: alpha dropped
    r = decode_image(_png(1, 1, 8, 6, 0, bytes([0, 1, 2, 3, 255])))
    assert r.shape == (1, 1, 3) and r[0, 0].tolist() == [1, 2, 3]


def test_png_refusal_seams():
    """Palette / 16-bit / interlaced stay behind NotImplementedError —
    the refusal contract now tested against a working compressed
    decoder, not in place of one."""
    for depth, color, interlace in ((8, 3, 0), (16, 2, 0), (8, 2, 1)):
        with pytest.raises(NotImplementedError):
            decode_image(_png(1, 1, depth, color, interlace, b"\x00\x00\x00\x00"))


def test_png_integrity_errors():
    # corrupt a byte inside IHDR: CRC verification must catch it
    payload = bytearray(synth_png(5, 10))
    payload[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(payload))
    # raster shorter than h*(stride+1): size check, not silent garbage
    with pytest.raises(ValueError, match="size mismatch"):
        decode_image(_png(2, 2, 8, 2, 0, bytes([0, 1, 2, 3])))


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


def test_decode_ima_adpcm_state_machine():
    """The IMA ADPCM decoder is the real state machine: hand-stepped
    reference values, clamping, and the 4:1 compressed WAV container."""
    import struct

    import numpy as np

    from postfix_log_parser_spark.ext.multimodal import (
        _IMA_STEPS,
        decode_audio,
        synth_adpcm_wav,
    )

    # hand-stepped: pred0=0, idx0=0 (step 7), nibbles [2, 9]
    #   nib=2: diff = 7>>3 + 7>>1 = 0+3 = 3 -> pred 3, idx 0-1 -> clamp 0
    #   nib=9: diff = 7>>3 + 7>>2 = 0+1 = 1, sign -> pred 2, idx -> 0
    block = struct.pack("<hBB", 0, 0, 0) + bytes([2 | (9 << 4)])
    from postfix_log_parser_spark.ext.multimodal import _decode_ima_adpcm

    assert _decode_ima_adpcm(block).tolist() == [0, 3, 2]

    # clamping: start at max predictor with the largest step, additive nibble
    block = struct.pack("<hBB", 32767, 88, 0) + bytes([7 | (15 << 4)])
    out = _decode_ima_adpcm(block)
    assert out[0] == 32767 and out[1] == 32767  # clamped high
    assert out[2] >= -32768  # subtractive nibble stays in range
    assert _IMA_STEPS[88] == 32767

    # container round trip: length, header sample, determinism
    s = decode_audio(synth_adpcm_wav(5, 17))
    assert len(s) == 1 + 64 + 2 * (17 % 32)
    assert s[0] == (5 * 7) % 2048 - 1024
    assert (decode_audio(synth_adpcm_wav(5, 17)) == s).all()
    assert s.dtype == np.int16

    # refusal: stereo ADPCM is not supported (mono state machine only)
    fmt = struct.pack("<HHIIHHHH", 17, 2, 8000, 8000, 256, 4, 2, 505)
    wav = (
        b"RIFF" + struct.pack("<I", 30) + b"WAVE"
        + b"fmt " + struct.pack("<I", 20) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_audio(wav)
