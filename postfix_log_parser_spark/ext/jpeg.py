"""Dependency-free baseline JPEG codec (r9 — VERDICT r8 item #6).

A real JFIF encoder + decoder in stdlib-plus-numpy, closing the second
compressed-image refusal seam (PNG closed in r8):

* ``encode_baseline_jpeg``: baseline-sequential (SOF0) YCbCr with
  4:2:0 chroma subsampling, the JPEG Annex K example quantization and
  Huffman tables (ITU T.81 §K.1/K.3 — public spec constants), DC
  prediction across blocks, run-length AC coding, byte stuffing.
* ``decode_baseline_jpeg``: marker walk (DQT/SOF0/DHT/DRI/SOS), canonical
  Huffman decode with stuffed-byte removal and restart-marker handling,
  dequantize → dezigzag → IDCT (orthonormal 8×8 DCT matrix, one numpy
  matmul per block), sample-factor box upsampling, JFIF YCbCr→RGB.

The refusal seam shrinks to the genuinely-out-of-scope modes:
progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision and
hierarchical — each raises ``NotImplementedError`` with the mode named.

Scale notes: encode/decode run inside ``mapInPandas`` batches
(ext/multimodal's plumbing) — the per-image Python cost is the point of
the seam (a production deployment swaps in libjpeg-turbo); the Spark
side (schema, partitioning, Arrow batch shape) is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec constants (ITU T.81 Annex K) --------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# (bits[1..16], huffval) — Annex K.3 typical tables
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8x8 DCT-II matrix: dct = C @ B @ C.T, idct = C.T @ B @ C
_C = np.array([
    [(np.sqrt(0.125) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


# --- bit I/O -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past marker in entropy segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # spec: pad bits at segment end are don't-care
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def reset(self) -> None:
        self._acc = 0
        self._n = 0
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit raw value to its signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- color transforms --------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------


def _encode_block(
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    bw: _BitWriter,
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def encode_baseline_jpeg(
    px: np.ndarray, restart: int = 0, grayscale: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline-sequential JFIF bytes, 4:2:0.

    ``restart=N`` emits a DRI segment and RSTm markers every N MCUs
    (predictors reset, bitstream byte-aligned — the error-resilience
    machinery real encoders use for streamable scans).  ``grayscale``
    emits a single-component (luma-only) frame."""
    h, w = px.shape[:2]
    ycc = _rgb_to_ycbcr(px)
    y = ycc[..., 0]
    if grayscale:
        return _encode_gray(y, h, w, restart)
    # 4:2:0 chroma: average each 2x2 (edge-replicate odd dims first)
    y2 = _pad_to(y, h + (h & 1), w + (w & 1))
    cb = _pad_to(ycc[..., 1], h + (h & 1), w + (w & 1))
    cr = _pad_to(ycc[..., 2], h + (h & 1), w + (w & 1))
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))

    mcus_x = (w + 15) // 16
    mcus_y = (h + 15) // 16
    y_pad = _pad_to(y2, mcus_y * 16, mcus_x * 16)
    cb_pad = _pad_to(cb, mcus_y * 8, mcus_x * 8)
    cr_pad = _pad_to(cr, mcus_y * 8, mcus_x * 8)

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    bw = _BitWriter()
    pred = [0, 0, 0]  # Y, Cb, Cr DC predictors
    rst = 0
    for m in range(mcus_y * mcus_x):
        if restart and m and m % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred = [0, 0, 0]
        my, mx = divmod(m, mcus_x)
        for by in range(2):
            for bx in range(2):
                r0, c0 = my * 16 + by * 8, mx * 16 + bx * 8
                pred[0] = _encode_block(
                    y_pad[r0 : r0 + 8, c0 : c0 + 8],
                    QUANT_LUMA, dc_l, ac_l, pred[0], bw,
                )
        r0, c0 = my * 8, mx * 8
        pred[1] = _encode_block(
            cb_pad[r0 : r0 + 8, c0 : c0 + 8],
            QUANT_CHROMA, dc_c, ac_c, pred[1], bw,
        )
        pred[2] = _encode_block(
            cr_pad[r0 : r0 + 8, c0 : c0 + 8],
            QUANT_CHROMA, dc_c, ac_c, pred[2], bw,
        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(v) for v in table.reshape(-1)[ZIGZAG]
        ))

    def dht(cls: int, tid: int, spec: tuple) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart)) if restart else b""
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0])   # Y: 2x2 sampling, quant 0
               + bytes([2, 0x11, 1])   # Cb: 1x1, quant 1
               + bytes([3, 0x11, 1]))  # Cr
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0
        + dqt(0, QUANT_LUMA) + dqt(1, QUANT_CHROMA)
        + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
        + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
        + dri + sof0 + sos + bytes(bw.out) + b"\xff\xd9"
    )


def _encode_gray(y: np.ndarray, h: int, w: int, restart: int) -> bytes:
    """Single-component (luma-only) baseline frame."""
    blocks_x = (w + 7) // 8
    blocks_y = (h + 7) // 8
    y_pad = _pad_to(y, blocks_y * 8, blocks_x * 8)
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    rst = 0
    for m in range(blocks_y * blocks_x):
        if restart and m and m % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred = 0
        by, bx = divmod(m, blocks_x)
        pred = _encode_block(
            y_pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
            QUANT_LUMA, dc_l, ac_l, pred, bw,
        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dri = seg(0xDD, struct.pack(">H", restart)) if restart else b""
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0]) + bytes(
            int(v) for v in QUANT_LUMA.reshape(-1)[ZIGZAG]))
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1]))
        + dri
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out) + b"\xff\xd9"
    )


# --- decoder -----------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JFIF bytes → (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + length]
        pos += length
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} not supported — "
                "baseline-sequential (SOF0) only"
            )
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                quant[tq] = zz[_UNZIGZAG].astype(np.int32).reshape(8, 8)
                i += 65
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit JPEG precision not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []  # (cid, dc_tid, ac_tid)
            for c in range(ns):
                cid, t = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, t >> 4, t & 0x0F))
            return _decode_scan(data, pos, frame, quant, huff, scan, restart)
        # else: APPn / COM — skipped
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, quant, huff, scan, restart):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8))
        for cid, hs, vs, _tq in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(data, pos)
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            # skip to and consume the RSTn marker, reset predictors
            while reader.marker is None:
                reader.bit()  # drain pad bits until the marker surfaces
            if not (0xD0 <= reader.marker <= 0xD7):
                raise ValueError("expected restart marker")
            reader.reset()
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(m, mcus_x)
        for cid, dc_tid, ac_tid in scan:
            _cid, hs, vs, tq = by_id[cid]
            q = quant[tq]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    t = _decode_huffman(reader, huff[(0, dc_tid)])
                    diff = _extend(reader.receive(t), t) if t else 0
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _decode_huffman(reader, huff[(1, ac_tid)])
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC index overflow")
                        size = rs & 0x0F
                        zz[k] = _extend(reader.receive(size), size)
                        k += 1
                    coef = (zz * q.reshape(-1)[ZIGZAG])[np.argsort(ZIGZAG)]
                    blk = _C.T @ coef.reshape(8, 8).astype(np.float64) @ _C
                    r0 = (my * vs + by) * 8
                    c0 = (mx * hs + bx) * 8
                    planes[cid][r0 : r0 + 8, c0 : c0 + 8] = blk + 128.0
    # upsample each component to full resolution by box replication
    full = {}
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]
    ids = [c[0] for c in comps]
    if len(ids) == 1:
        y = np.clip(full[ids[0]].round(), 0, 255)
        return np.repeat(y[..., None], 3, axis=2).astype(np.uint8)
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]])


# --- deterministic synthetic generator ---------------------------------------

JPEG_W = 24


def synth_raster(doc_id: int, n_chars: int) -> np.ndarray:
    """Deterministic smooth RGB raster: triangle-wave gradient (no
    mod-256 wrap edge, so baseline quantization error stays small and
    boundable).  Same identity contract as synth_ppm/synth_png: the
    image is a pure function of ((doc_id*31) %% 256, n_chars %% 3)."""
    a = (doc_id * 31) % 256
    h = 16 + 8 * (n_chars % 3)
    idx = a + np.arange(h * JPEG_W * 3)
    tri = np.abs((idx % 510) - 255).astype(np.uint8)  # 255..0..255 wave
    return tri.reshape(h, JPEG_W, 3)


def synth_jpeg(doc_id: int, n_chars: int) -> bytes:
    """Real baseline JFIF bytes for a document's synthetic raster."""
    return encode_baseline_jpeg(synth_raster(doc_id, n_chars))
