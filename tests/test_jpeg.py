"""The dependency-free baseline JPEG codec (ext/jpeg.py, r9).

No imaging library exists in this environment, so correctness is pinned
structurally: bounded lossy roundtrip over every synthetic image
identity class, marker-surgery refusal seams, restart-marker and
grayscale decode paths, byte-stuffing handling, and the decode_image
dispatch.  The roundtrip bound (max |err| <= 32) is a real gate — a
broken Huffman state, wrong dequant table, or bad IDCT produces errors
in the hundreds immediately.
"""

import numpy as np
import pytest

from postfix_log_parser_spark.ext.jpeg import (
    JPEG_W,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    synth_jpeg,
    synth_raster,
)
from postfix_log_parser_spark.ext.multimodal import decode_image


def _max_err(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def test_roundtrip_bounded_across_identities():
    """Every (a, h) identity class roundtrips within the q163 bound —
    a is sampled densely, all 3 heights exhaustively."""
    for doc_id in range(0, 256, 7):
        for n_chars in range(3):
            px = synth_raster(doc_id, n_chars)
            out = decode_baseline_jpeg(encode_baseline_jpeg(px))
            assert out.shape == px.shape
            assert _max_err(out, px) <= 32
            assert abs(float(out.mean()) - float(px.mean())) <= 2.0


def test_jfif_structure():
    b = synth_jpeg(11, 4)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in b  # SOF0 = baseline sequential
    assert b.count(b"\xff\xc4") >= 4  # 4 huffman tables


def test_byte_stuffing_roundtrips():
    """An entropy stream containing 0xFF bytes must be stuffed (FF 00)
    and un-stuffed transparently."""
    found = False
    for doc_id in range(16):
        b = encode_baseline_jpeg(synth_raster(doc_id, 1))
        scan = b[b.index(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            found = True
            px = synth_raster(doc_id, 1)
            assert _max_err(decode_baseline_jpeg(b), px) <= 32
    assert found, "no stuffed byte in 16 sample streams — suspicious"


def test_restart_markers_decode_identically():
    px = synth_raster(42, 7)
    plain = decode_baseline_jpeg(encode_baseline_jpeg(px))
    for interval in (1, 2, 3):
        b = encode_baseline_jpeg(px, restart=interval)
        assert b"\xff\xdd" in b  # DRI segment
        assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
        assert np.array_equal(decode_baseline_jpeg(b), plain)


def test_grayscale_single_component():
    px = synth_raster(9, 2)
    out = decode_baseline_jpeg(encode_baseline_jpeg(px, grayscale=True))
    assert out.shape == px.shape
    # all three channels replicate the luma plane
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(out[..., 0].astype(float) - luma).max() <= 32
    # grayscale + restart combined
    out2 = decode_baseline_jpeg(
        encode_baseline_jpeg(px, grayscale=True, restart=2)
    )
    assert np.array_equal(out, out2)


def test_synth_identity_classes_share_bytes():
    """(doc_id*31) mod 256 defines the image: doc_id and doc_id+256
    produce byte-identical payloads — the property q163's closed-form
    cluster oracle rests on."""
    assert synth_jpeg(5, 1) == synth_jpeg(261, 1)
    assert synth_jpeg(5, 1) == synth_jpeg(5, 4)  # n_chars mod 3 identical
    assert synth_jpeg(5, 1) != synth_jpeg(6, 1)
    assert synth_jpeg(5, 1) != synth_jpeg(5, 2)  # different height
    assert synth_raster(0, 0).shape == (16, JPEG_W, 3)
    assert synth_raster(0, 2).shape == (32, JPEG_W, 3)


def test_decode_image_dispatches_jpeg():
    px = synth_raster(3, 0)
    out = decode_image(encode_baseline_jpeg(px))
    assert out.shape == px.shape and _max_err(out, px) <= 32


def _swap_marker(b: bytes, old: bytes, new: bytes) -> bytes:
    i = b.index(old)
    return b[:i] + new + b[i + len(old) :]


def test_progressive_refused_by_name():
    b = _swap_marker(synth_jpeg(1, 0), b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_baseline_jpeg(b)


def test_arithmetic_refused_by_name():
    b = _swap_marker(synth_jpeg(1, 0), b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_baseline_jpeg(b)


def test_12bit_precision_refused():
    b = synth_jpeg(1, 0)
    i = b.index(b"\xff\xc0")
    # SOF0 body starts after marker+length: precision byte at i+4
    b = b[: i + 4] + bytes([12]) + b[i + 5 :]
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_baseline_jpeg(b)


def test_16bit_quant_table_refused():
    b = synth_jpeg(1, 0)
    i = b.index(b"\xff\xdb")
    # DQT body: pq/tq byte at i+4 — set pq=1 (16-bit)
    b = b[: i + 4] + bytes([0x10]) + b[i + 5 :]
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_baseline_jpeg(b)


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"P6\n1 1\n255\nxyz")
