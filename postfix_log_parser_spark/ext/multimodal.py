"""Multimodal column plumbing — binary payloads with typed metadata.

Images / audio / video are opaque ``binary`` columns plus a typed metadata
struct; per-item decode / feature-extraction runs as an Arrow-batched
``mapInPandas`` stage (the idiomatic shape for CPU-bound per-item Python
work: vectorized transfer, per-partition execution, no driver loop).

``decode_image`` REALLY decodes two formats, no imaging library needed:
binary PPM (P6; pure-Python header+raster parser — q31 exercises it
end-to-end with deterministic synthetic payloads whose exact integer
pixel features flow into the oracle-checked aggregate) and PNG (stdlib
zlib inflate + per-scanline unfilter for all five filter types + chunk
CRC verification — q111's payloads are genuinely COMPRESSED synthetic
PNGs whose filter types cycle by row, decoded back to the same pixels
the closed-form oracle recomputes).  Formats needing an actual codec
(JPEG/WebP/compressed audio) still raise ``NotImplementedError``; swap
the seam for PIL/torchvision in a real deployment — the mapInPandas
plumbing is format-agnostic.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
    ]
)

# synthetic image geometry: width fixed, height keyed off n_chars so sizes
# vary; pixel (flattened index i) = (doc_id*31 + i) mod 256 — closed-form,
# so the DuckDB oracle can recompute the decoded features without a decoder
SYNTH_W = 8


def synth_ppm(doc_id: int, n_chars: int) -> bytes:
    """Deterministic synthetic P6 image for a document: 8 px wide,
    1+(n_chars mod 7) px tall, gradient raster seeded by doc_id."""
    h = 1 + (n_chars % 7)
    n = SYNTH_W * h * 3
    a = (doc_id * 31) % 256
    raster = bytes((a + i) % 256 for i in range(n))
    return b"P6\n# synth\n%d %d\n255\n" % (SYNTH_W, h) + raster


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def synth_png(doc_id: int, n_chars: int) -> bytes:
    """Deterministic synthetic PNG for a document: the SAME gradient
    raster as ``synth_ppm`` (so decoded pixels — and the closed-form
    DuckDB oracle — are identical), genuinely zlib-compressed, with the
    scanline filter type CYCLING 0..4 by row so every PNG filter
    (None/Sub/Up/Average/Paeth) is exercised by the decoder."""
    import struct
    import zlib

    w = SYNTH_W
    h = 1 + (n_chars % 7)
    stride = w * 3
    a = (doc_id * 31) % 256
    raster = bytes((a + i) % 256 for i in range(stride * h))

    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        row = raster[r * stride : (r + 1) * stride]
        ft = r % 5
        out.append(ft)
        if ft == 0:
            out += row
        elif ft == 1:  # Sub
            out += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) % 256
                for i in range(stride)
            )
        elif ft == 2:  # Up
            out += bytes((row[i] - prev[i]) % 256 for i in range(stride))
        elif ft == 3:  # Average
            out += bytes(
                (row[i] - ((row[i - 3] if i >= 3 else 0) + prev[i]) // 2) % 256
                for i in range(stride)
            )
        else:  # Paeth
            out += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - 3] if i >= 3 else 0,
                        prev[i],
                        prev[i - 3] if i >= 3 else 0,
                    )
                )
                % 256
                for i in range(stride)
            )
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _decode_png(content: bytes) -> "np.ndarray":
    """Pure-stdlib PNG decoder: chunk walk with CRC32 verification,
    concatenated-IDAT zlib inflate, per-scanline unfilter (all five
    filter types).  Supports 8-bit color types 0 (grayscale, replicated
    to RGB), 2 (RGB) and 6 (RGBA, alpha dropped); palette, 16-bit and
    interlaced images raise NotImplementedError (the refusal seam, now
    behind a working COMPRESSED-format decoder)."""
    import struct
    import zlib

    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG chunk truncated")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels  # bytes per pixel at 8-bit depth
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — vectorized
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — left-dependent scan
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    cur[i] = (line[i] + left) % 256
                elif ft == 3:
                    cur[i] = (line[i] + (left + prev[i]) // 2) % 256
                else:
                    ul = prev[i - bpp] if i >= bpp else 0
                    cur[i] = (line[i] + _paeth(int(left), int(prev[i]), int(ul))) % 256
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        img[r] = cur.astype(np.uint8)
        prev = cur
    px = img.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px


def decode_image(content: bytes) -> "np.ndarray":
    """Decode an image payload into an (h, w, 3) uint8 pixel array.

    REAL decoders for three formats: binary PPM (P6 — netpbm header
    tokenizer: whitespace-separated tokens, ``#`` comments to
    end-of-line, per the spec — followed by the raw RGB raster), PNG
    (stdlib zlib inflate + per-scanline unfilter + CRC verification, see
    ``_decode_png``), and baseline-sequential JPEG (Huffman entropy
    decode + dequant + IDCT + 4:2:0 upsampling, see ``ext.jpeg``; the
    non-baseline JPEG modes — progressive, arithmetic, 12-bit — raise
    NotImplementedError naming the mode).  Formats needing a codec
    library (WebP/AVIF/...) raise NotImplementedError — swap this seam
    for PIL/torchvision in a real deployment; the Spark plumbing around
    it is format-agnostic.
    """
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(content)
    if content[:2] == b"\xff\xd8":
        from postfix_log_parser_spark.ext.jpeg import decode_baseline_jpeg

        return decode_baseline_jpeg(content)
    if content[:2] == b"P6":
        pos = 2
        tokens: list[int] = []
        while len(tokens) < 3:
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":
                while pos < len(content) and content[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(content[start:pos]))
        pos += 1  # single whitespace after maxval, then the raster
        w, h, maxval = tokens
        if maxval > 255:
            raise NotImplementedError("16-bit PPM rasters not supported")
        raster = content[pos : pos + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError(f"P6 raster truncated: {len(raster)} != {w * h * 3}")
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        "only binary PPM (P6), PNG and baseline JPEG decode without an "
        "imaging library; see ext.multimodal docstring"
    )


def to_media_table(docs: DataFrame) -> DataFrame:
    """documents → media table: opaque binary ``content`` + metadata
    struct.  At scale this is the storage schema for image/audio shards:
    payload stays opaque to the optimizer, metadata columns stay
    filterable/prunable (predicate pushdown works on ``meta.*``)."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )  # a NULL payload has no bytes to decode — dropped at the source


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched per-item feature extraction over binary payloads.

    Two feature families per item, both computed inside one mapInPandas
    stage (no second pass, no join):
      * byte-level: payload size + md5 digest of the raw content column;
      * decoded-pixel: each doc's deterministic synthetic P6 payload goes
        through the REAL ``decode_image`` parser and the pixel array is
        reduced to exact integer features (px_sum, n_px) — integer sums
        are order-independent, so the downstream aggregate is
        bit-reproducible and DuckDB-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            px_sums, n_pxs = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                px = decode_image(synth_ppm(int(doc_id), int(n_chars)))
                px_sums.append(int(px.sum(dtype=np.int64)))
                n_pxs.append(px.size)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "n_bytes": content.map(len).astype("int64"),
                    "digest": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "px_sum": pd.array(px_sums, dtype="int64"),
                    "n_px": pd.array(n_pxs, dtype="int64"),
                }
            )

    return media.select(
        "doc_id",
        "source",
        "content",
        F.coalesce(F.col("meta.n_chars"), F.lit(0)).alias("n_chars"),
    ).mapInPandas(batches, FEATURE_SCHEMA)


def q31_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source multimodal feature rollup.  ``avg_pixel`` is computed
    from REAL image decodes (synthetic P6 payloads through the netpbm
    parser) as a ratio of exact integer sums — order-independent, so the
    oracle comparison is bit-stable."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(to_media_table(docs))
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct(F.col("digest")).alias("n_distinct_digests"),
        F.min("digest").alias("min_digest"),
        F.sum("px_sum").alias("total_px_sum"),
        F.round(F.sum("px_sum") / F.sum("n_px"), 4).alias("avg_pixel"),
    )


_Q31_SQL = f"""
WITH px AS (
  SELECT source, text,
         list_sum(list_transform(
             range(0, {3 * SYNTH_W} * (1 + coalesce(n_chars, 0) % 7)),
             i -> ((doc_id * 31) % 256 + i) % 256)) AS px_sum,
         {3 * SYNTH_W} * (1 + coalesce(n_chars, 0) % 7) AS n_px
  FROM documents WHERE text IS NOT NULL
)
SELECT source, count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS n_distinct_digests,
       min(md5(text)) AS min_digest,
       CAST(sum(px_sum) AS BIGINT) AS total_px_sum,
       round(CAST(sum(px_sum) AS BIGINT) / CAST(sum(n_px) AS BIGINT), 4)
         AS avg_pixel
FROM px GROUP BY source
"""


# ---------------------------------------------------------------------------
# resize: per-item payload transformation (decode → resize → re-encode)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("resized", T.BooleanType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_resize(b: bytes, target: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode (no imaging libs in
    this container): uniform byte subsample down to ``target`` bytes.  The
    plumbing (binary in, smaller binary out, metadata updated) is what a
    real PIL/libvips resize stage would do."""
    if len(b) <= target:
        return b
    step = len(b) / target
    return bytes(b[int(i * step)] for i in range(target))


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Arrow-batched payload resize: one mapInPandas stage, partition-
    preserving, output schema carries refreshed metadata.  At 100 TB this
    is the canonical shape for bulk media transcode — CPU work rides the
    scan partitions, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["content"].map(
                lambda b: _fake_resize(bytes(b), target_bytes)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "content": resized,
                    "meta": [
                        {
                            "mime": "application/octet-stream",
                            "n_bytes": len(b),
                            "resized": True,
                        }
                        for b in resized
                    ],
                }
            )

    return media.select("doc_id", "source", "content").mapInPandas(
        batches, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling: one input payload → many frame rows
# ---------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_EVERY = 4

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_EVERY,
) -> DataFrame:
    """Treat each payload as a fixed-size-frame stream and emit every
    ``every``-th frame as its own row — the mapInPandas fan-out shape a
    real video frame sampler uses (one input row → many output rows, no
    explode of a materialized array: frames are cut inside the Arrow
    batch, so peak memory is one batch, not one decoded video)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, srcs, idxs, frames = [], [], [], []
            for doc_id, source, content in zip(
                pdf["doc_id"], pdf["source"], pdf["content"]
            ):
                b = bytes(content)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for j in range(0, n_frames, every):
                    ids.append(int(doc_id))
                    srcs.append(source)
                    idxs.append(j)
                    frames.append(b[j * frame_bytes : (j + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "source": srcs,
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return media.select("doc_id", "source", "content").mapInPandas(
        batches, FRAMES_SCHEMA
    )


def q34_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, oracle-checked by pure arithmetic: every
    4th 64-byte frame of each payload; per source, sampled frame count and
    total sampled bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = sample_frames(to_media_table(docs))
    return frames.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_frames"),
        F.sum(F.length("frame")).cast("long").alias("sampled_bytes"),
    )


_Q34_SQL = f"""
WITH d AS (
  SELECT doc_id, source, octet_length(encode(text)) AS n
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT source, n, unnest(range(0, CAST((n + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS BIGINT))) AS j
  FROM d
),
s AS (
  SELECT source, least({FRAME_BYTES}, n - {FRAME_BYTES} * j) AS fb
  FROM f WHERE j % {FRAME_EVERY} = 0
)
SELECT source, count(*) AS sampled_frames, CAST(sum(fb) AS BIGINT) AS sampled_bytes
FROM s GROUP BY source
"""


# ---------------------------------------------------------------------------
# q111 — perceptual-hash (average-hash) image dedup over DECODED pixels
# ---------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("phash", T.StringType(), False),
    ]
)


def phash_media(media: DataFrame) -> DataFrame:
    """Average-hash fingerprints from decoded pixels, one mapInPandas
    stage: decode → grayscale (integer (r+g+b)//3) → threshold against
    the image's mean luminance → bit-string fingerprint.  The classic
    aHash; bit-exact across engines because the gray values are integers
    and the mean is one double division of exact integer sums.

    The payloads here are synthetic PNGs (``synth_png``): genuinely
    zlib-COMPRESSED images through the full chunk-walk + inflate +
    unfilter decode path — q31 keeps the uncompressed PPM path, so both
    real decoders stay oracle-exercised."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                px = decode_image(synth_png(int(doc_id), int(n_chars)))
                gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1) // 3
                mean = gray.sum() / gray.size
                fps.append("".join("1" if g > mean else "0" for g in gray))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": fps,
                }
            )

    return media.select(
        "doc_id",
        F.coalesce(F.col("meta.n_chars"), F.lit(0)).alias("n_chars"),
    ).mapInPandas(batches, PHASH_SCHEMA)


def q111_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dedup cluster-size histogram: decode every payload, aHash
    it, group identical fingerprints (one hash shuffle on the 64-bit-ish
    fingerprint — the exact-dedup shape of q20 applied to DECODED media,
    not raw bytes), and histogram the cluster sizes.

    Scale: fingerprints are tiny and uniformly distributed, so the
    group-by partitions evenly; near-duplicate (small-hamming) clustering
    on top of these fingerprints would reuse q22's banded-signature
    equi-join shape.  Real media would swap ``synth_png`` for the stored
    payload; the decode seam (ext/multimodal.decode_image) is the same —
    and here it runs the FULL compressed-format path (zlib inflate +
    scanline unfilter + CRC verification).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = phash_media(to_media_table(docs))
    clusters = fps.groupBy("phash").agg(F.count(F.lit(1)).alias("cluster_size"))
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.min("phash").alias("min_phash"),
    )


_Q111_SQL = f"""
WITH img AS (
  SELECT doc_id,
         (doc_id * 31) % 256 AS a,
         {SYNTH_W} * (1 + coalesce(n_chars, 0) % 7) AS n_gray
  FROM documents WHERE text IS NOT NULL
),
gray AS (
  SELECT doc_id,
         list_transform(range(0, n_gray),
             j -> ((a + 3 * j) % 256 + (a + 3 * j + 1) % 256
                   + (a + 3 * j + 2) % 256) // 3) AS g
  FROM img
),
fp AS (
  SELECT doc_id,
         array_to_string(list_transform(g,
             v -> CASE WHEN v > list_sum(g) / CAST(len(g) AS DOUBLE)
                  THEN '1' ELSE '0' END), '') AS phash
  FROM gray
),
clusters AS (
  SELECT phash, count(*) AS cluster_size FROM fp GROUP BY phash
)
SELECT cluster_size, count(*) AS n_clusters, min(phash) AS min_phash
FROM clusters GROUP BY cluster_size
"""


# ---------------------------------------------------------------------------
# q116 — audio feature extraction over DECODED PCM (real WAV parser)
# ---------------------------------------------------------------------------

WAV_WINDOW = 16  # samples per analysis window
_WAV_SAMPLE_MOD = 2048  # synth sample = ((doc_id*7 + 13*i) % 2048) - 1024


def synth_wav(doc_id: int, n_chars: int) -> bytes:
    """Deterministic synthetic RIFF/WAVE file: PCM16 mono @8kHz,
    64+(n_chars mod 64) samples, sample i = ((doc_id*7 + 13*i) mod 2048)
    - 1024 — closed-form, so the DuckDB oracle recomputes the decoded
    features without a decoder."""
    import struct

    n = 64 + (n_chars % 64)
    samples = [((doc_id * 7 + 13 * i) % _WAV_SAMPLE_MOD) - 1024 for i in range(n)]
    pcm = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(content: bytes) -> "np.ndarray":
    """Decode an audio payload into an int16 sample array.

    REAL decoder for RIFF/WAVE PCM16 mono: chunk-walking parser (fmt
    then data, skipping unknown chunks per the RIFF spec), no audio
    library needed.  Compressed codecs (MP3/AAC/float WAV/multichannel)
    raise NotImplementedError — swap the seam for soundfile/torchaudio
    in a real deployment."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes without an audio library"
        )
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        payload = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_chunk = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            data = payload
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, _rate, _brate, _align, bits = fmt_chunk
    if audio_format == 1 and bits == 16 and channels == 1:
        return np.frombuffer(data, dtype="<i2")
    if audio_format == 17 and bits == 4 and channels == 1:
        return _decode_ima_adpcm(data)  # q167: real compressed codec
    raise NotImplementedError(
        f"only PCM16 / IMA-ADPCM mono supported (format={audio_format}, "
        f"bits={bits}, channels={channels})"
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_windows", T.LongType(), False),
        T.StructField("ssq_sum", T.LongType(), False),
        T.StructField("max_win_ssq", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: each item's synthetic WAV
    goes through the REAL ``decode_audio`` parser, then per-window
    (16-sample) energy and within-window zero-crossing counts — all
    integer arithmetic, so the aggregate is exact and oracle-checkable."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_w, ssq, mx, zc = [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                s = decode_audio(synth_wav(int(doc_id), int(n_chars)))
                s = s.astype(np.int64)
                k = len(s) // WAV_WINDOW
                win = s[: k * WAV_WINDOW].reshape(k, WAV_WINDOW)
                wssq = (win * win).sum(axis=1)
                sign = win >= 0
                wzc = (sign[:, 1:] != sign[:, :-1]).sum(axis=1)
                n_w.append(k)
                ssq.append(int(wssq.sum()))
                mx.append(int(wssq.max()) if k else 0)
                zc.append(int(wzc.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "n_windows": pd.array(n_w, dtype="int64"),
                    "ssq_sum": pd.array(ssq, dtype="int64"),
                    "max_win_ssq": pd.array(mx, dtype="int64"),
                    "zero_crossings": pd.array(zc, dtype="int64"),
                }
            )

    return media.select(
        "doc_id",
        "source",
        F.coalesce(F.col("meta.n_chars"), F.lit(0)).alias("n_chars"),
    ).mapInPandas(batches, AUDIO_SCHEMA)


def q116_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source audio rollup over genuinely DECODED PCM: window count,
    total and max window energy, zero-crossing count — the standard
    cheap audio-quality screens (silence/clipping/noisiness) a
    multimodal curation pipeline runs before expensive models."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = audio_features(to_media_table(docs))
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_windows").alias("n_windows"),
        F.sum("ssq_sum").alias("ssq_sum"),
        F.max("max_win_ssq").alias("max_win_ssq"),
        F.sum("zero_crossings").alias("zero_crossings"),
    )


_Q116_SQL = f"""
WITH a AS (
  SELECT doc_id, source,
         (64 + coalesce(n_chars, 0) % 64) // {WAV_WINDOW} AS k,
         doc_id * 7 AS seed
  FROM documents WHERE text IS NOT NULL
),
win AS (
  SELECT doc_id, source, k, seed, unnest(range(0, k)) AS w
  FROM a
),
feat AS (
  SELECT doc_id, source, k, w,
         list_transform(range(0, {WAV_WINDOW}),
             i -> (seed + 13 * ({WAV_WINDOW} * w + i)) % {_WAV_SAMPLE_MOD}
                  - 1024) AS s
  FROM win
),
wstats AS (
  SELECT doc_id, source, k,
         CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS wssq,
         CAST(list_sum(list_transform(range(1, {WAV_WINDOW}),
             i -> CASE WHEN (s[i] >= 0) <> (s[i + 1] >= 0)
                  THEN 1 ELSE 0 END)) AS BIGINT) AS wzc
  FROM feat
),
per_doc AS (
  SELECT doc_id, source, max(k) AS n_windows,
         sum(wssq) AS ssq_sum, max(wssq) AS max_win_ssq,
         sum(wzc) AS zero_crossings
  FROM wstats GROUP BY doc_id, source
)
SELECT source, count(*) AS n_items,
       CAST(sum(n_windows) AS BIGINT) AS n_windows,
       CAST(sum(ssq_sum) AS BIGINT) AS ssq_sum,
       CAST(max(max_win_ssq) AS BIGINT) AS max_win_ssq,
       CAST(sum(zero_crossings) AS BIGINT) AS zero_crossings
FROM per_doc GROUP BY source
"""


# ---------------------------------------------------------------------------
# q167 — IMA ADPCM: a real COMPRESSED audio codec decoded end-to-end
# ---------------------------------------------------------------------------
#
# IMA/DVI ADPCM (4 bits/sample, 4:1 vs PCM16) is the classic WAV
# compressed-audio format (wFormatTag 0x11): a per-block state machine —
# 89-entry step-size table, per-nibble index adjustment, clamped 16-bit
# predictor.  The decoder below is the REAL state machine, exercised by
# q167 against a DuckDB oracle that replays the same machine via a
# recursive CTE — an independent second implementation, the same
# differential discipline as the parse twins.  This shrinks the audio
# refusal seam to perceptual codecs (MP3/AAC), which genuinely need an
# audio library.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _decode_ima_adpcm(data: bytes) -> "np.ndarray":
    """Decode one IMA ADPCM block: 4-byte header (initial predictor
    int16 LE = sample 0, initial step index uint8, reserved), then one
    4-bit code per sample, two per byte, LOW nibble first."""
    import struct

    pred, idx = struct.unpack("<hB", data[:3])
    out = [pred]
    for b in data[4:]:
        for nib in (b & 0xF, b >> 4):
            step = _IMA_STEPS[idx]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 7]))
            out.append(pred)
    return np.asarray(out, dtype=np.int16)


def synth_adpcm_wav(doc_id: int, n_chars: int) -> bytes:
    """Deterministic IMA-ADPCM WAV: one block, initial predictor
    ((doc_id*7) mod 2048) - 1024, initial index doc_id mod 16, nibble i
    = (doc_id*3 + 5*i) mod 16, n_nib = 64 + 2*(n_chars mod 32) (even,
    so every data nibble is a real sample) — closed-form, so the DuckDB
    oracle replays the decode state machine without a decoder."""
    import struct

    n_nib = 64 + 2 * (n_chars % 32)
    pred0 = ((doc_id * 7) % 2048) - 1024
    idx0 = doc_id % 16
    block = bytearray(struct.pack("<hBB", pred0, idx0, 0))
    for i in range(0, n_nib, 2):
        lo = (doc_id * 3 + 5 * i) % 16
        hi = (doc_id * 3 + 5 * (i + 1)) % 16
        block.append(lo | (hi << 4))
    block_align = 4 + n_nib // 2
    n_samples = n_nib + 1
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, 8000, 8000 * block_align // n_samples,
        block_align, 4, 2, n_samples,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n_samples)
    body += b"data" + struct.pack("<I", len(block)) + bytes(block)
    return b"RIFF" + struct.pack("<I", len(body)) + body


ADPCM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sum_samples", T.LongType(), False),
        T.StructField("sum_ssq", T.LongType(), False),
        T.StructField("final_pred", T.LongType(), False),
    ]
)


def adpcm_features(media: DataFrame) -> DataFrame:
    """Arrow-batched: each item's synthetic ADPCM WAV goes through the
    REAL chunk-walking parser + IMA state machine (``decode_audio``
    dispatches on wFormatTag); features are integer functions of the
    DECODED samples only (never internal codec state), so the oracle
    check is an honest end-to-end decoder test."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, ss, sq, fp = [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                s = decode_audio(
                    synth_adpcm_wav(int(doc_id), int(n_chars))
                ).astype(np.int64)
                ns.append(len(s))
                ss.append(int(s.sum()))
                sq.append(int((s * s).sum()))
                fp.append(int(s[-1]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "n_samples": pd.array(ns, dtype="int64"),
                    "sum_samples": pd.array(ss, dtype="int64"),
                    "sum_ssq": pd.array(sq, dtype="int64"),
                    "final_pred": pd.array(fp, dtype="int64"),
                }
            )

    return media.select(
        "doc_id",
        "source",
        F.coalesce(F.col("meta.n_chars"), F.lit(0)).alias("n_chars"),
    ).mapInPandas(batches, ADPCM_SCHEMA)


def q167_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rollup over genuinely DECODED IMA-ADPCM audio — the
    second compressed AUDIO format decoded end-to-end in an oracle-green
    query (PCM16 WAV was q116; PNG/JPEG are the image twins q111/q163).

    Scale: the codec is an Arrow-batched per-partition stage (text
    never shuffles, ~127 samples/doc of integer state machine); the
    only exchange is the tiny per-source partial-agg rollup.  Real
    compressed audio swaps ``synth_adpcm_wav`` for the stored payload
    and the same seam decodes it — MP3/AAC refuse with a documented
    NotImplementedError until a real audio library backs the seam."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = adpcm_features(to_media_table(docs))
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_samples").alias("n_samples"),
        F.sum("sum_samples").alias("sum_samples"),
        F.sum("sum_ssq").alias("sum_ssq"),
        F.max("final_pred").alias("max_final_pred"),
    )


_Q167_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, source,
         CAST(((doc_id * 7) % 2048) - 1024 AS BIGINT) AS pred0,
         CAST(doc_id % 16 AS BIGINT) AS idx0,
         CAST(64 + 2 * (coalesce(n_chars, 0) % 32) AS BIGINT) AS n_nib
  FROM documents WHERE text IS NOT NULL
),
dec AS (
  SELECT doc_id, source, n_nib, CAST(0 AS BIGINT) AS i,
         pred0 AS pred, idx0 AS idx,
         pred0 AS acc_sum, pred0 * pred0 AS acc_ssq
  FROM docs
  UNION ALL
  SELECT doc_id, source, n_nib, i, np AS pred, ni AS idx,
         acc_sum + np AS acc_sum, acc_ssq + np * np AS acc_ssq
  FROM (
    SELECT doc_id, source, n_nib, i + 1 AS i, acc_sum, acc_ssq,
           greatest(-32768, least(32767,
             pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)) AS np,
           greatest(0, least(88, idx + CASE nib % 8
             WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
             ELSE -1 END)) AS ni
    FROM (
      SELECT *,
             step // 8
             + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
             + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
             + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END AS diff
      FROM (
        SELECT *, (doc_id * 3 + 5 * i) % 16 AS nib,
               list_value({", ".join(map(str, _IMA_STEPS))})
                 [CAST(idx AS INTEGER) + 1] AS step
        FROM dec WHERE i < n_nib
      )
    )
  )
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(n_nib + 1) AS BIGINT) AS n_samples,
       CAST(sum(acc_sum) AS BIGINT) AS sum_samples,
       CAST(sum(acc_ssq) AS BIGINT) AS sum_ssq,
       CAST(max(pred) AS BIGINT) AS max_final_pred
FROM dec WHERE i = n_nib
GROUP BY source
"""


# ---------------------------------------------------------------------------
# q140 — video scene-cut detection over decoded frame sequences
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("dist", T.LongType(), True),
    ]
)


def scene_cut_frames(media: DataFrame) -> DataFrame:
    """Per-frame aHash + Hamming distance to the previous frame, one
    Arrow stage: each doc's synthetic 'video' is 2 + (n_chars mod 4)
    frames, frame f decoding through the REAL P6 parser with seed
    doc_id + f² (so consecutive frames drift and occasionally jump).
    The frame loop stays inside the batch — consecutive frames of one
    doc are adjacent in the same pandas batch, so the inter-frame
    distance needs NO window/shuffle; only the tiny per-frame rows
    leave the stage.  Real video swaps the synth for stored frames and
    the same code shape holds (decode → hash → adjacent diff → emit)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, nbits, dists = [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nf = 2 + int(n_chars) % 4
                prev = None
                for f in range(nf):
                    px = decode_image(synth_ppm(int(doc_id) + f * f, int(n_chars)))
                    gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1) // 3
                    bits = gray > (gray.sum() / gray.size)
                    ids.append(int(doc_id))
                    idxs.append(f)
                    nbits.append(int(bits.size))
                    dists.append(int((bits != prev).sum()) if prev is not None else None)
                    prev = bits
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "n_bits": pd.array(nbits, dtype="int64"),
                    "dist": pd.array(dists, dtype="Int64"),
                }
            )

    return media.select(
        "doc_id",
        F.coalesce(F.col("meta.n_chars"), F.lit(0)).alias("n_chars"),
    ).mapInPandas(batches, VIDEO_SCHEMA)


def q140_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene segmentation per 'video': frame count, number of cuts
    (adjacent-frame Hamming distance > ¼ of the hash width — integer
    compare, no float threshold), and the largest jump.  The scene-cut
    list is what a video curation pipeline feeds into keyframe
    selection and frame-level dedup (q111's fingerprints on the cut
    frames).  Scale: decode+hash+diff is embarrassingly parallel per
    doc; the only exchange is the per-doc aggregate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = scene_cut_frames(to_media_table(docs))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(
            F.when(F.col("dist") * 4 > F.col("n_bits"), 1).otherwise(0)
        ).cast("long").alias("n_cuts"),
        F.max("dist").alias("max_dist"),
    )


_Q140_SQL = f"""
WITH d AS (
  SELECT doc_id, coalesce(n_chars, 0) AS nc
  FROM documents WHERE text IS NOT NULL
),
fr AS (
  SELECT doc_id, nc, unnest(range(0, CAST(2 + nc % 4 AS BIGINT))) AS f
  FROM d
),
g AS (
  SELECT doc_id, f,
         list_transform(range(0, {SYNTH_W} * (1 + nc % 7)),
           j -> ((31 * (doc_id + f * f) + 3 * j) % 256
               + (31 * (doc_id + f * f) + 3 * j + 1) % 256
               + (31 * (doc_id + f * f) + 3 * j + 2) % 256) // 3) AS gl
  FROM fr
),
b AS (
  SELECT doc_id, f, len(gl) AS n_bits,
         list_transform(gl, v -> CASE WHEN v > list_sum(gl) / CAST(len(gl) AS DOUBLE)
                                 THEN 1 ELSE 0 END) AS bits
  FROM g
),
lagged AS (
  SELECT doc_id, n_bits, bits,
         lag(bits) OVER (PARTITION BY doc_id ORDER BY f) AS pbits
  FROM b
),
dist AS (
  SELECT doc_id, n_bits,
         CASE WHEN pbits IS NULL THEN NULL
              ELSE list_sum(list_transform(range(1, len(bits) + 1),
                     i -> CASE WHEN bits[i] <> pbits[i] THEN 1 ELSE 0 END))
         END AS dd
  FROM lagged
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN dd * 4 > n_bits THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(max(dd) AS BIGINT) AS max_dist
FROM dist GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q163 — baseline JPEG roundtrip QA (real lossy codec, ext/jpeg.py)
# ---------------------------------------------------------------------------

JPEG_QA_SCHEMA = (
    "doc_id long, jpeg_w int, jpeg_h int, img_key string, "
    "jfif_ok boolean, dims_ok boolean, err_ok boolean, mean_ok boolean"
)
_JPEG_IDENT_QA_SCHEMA = (
    "a long, jh long, jpeg_w int, jpeg_h int, img_key string, "
    "jfif_ok boolean, dims_ok boolean, err_ok boolean, mean_ok boolean"
)
JPEG_ERR_TOL = 32  # measured worst 19 over all 768 image identities
JPEG_MEAN_TOL = 2.0  # measured worst drift 0.59


def jpeg_roundtrip_qa(docs: DataFrame) -> DataFrame:
    """Roundtrip every document's image through the REAL baseline JFIF
    codec — once per DISTINCT image identity, not per document.

    The raster is a pure function of ((doc_id*31) % 256, n_chars % 3)
    (256 × 3 = 768 identities), so the corpus is first reduced to the
    identity dimension (one tiny aggregate), the encode+decode+bounds
    codec stage runs Arrow-batched over those ≤768 rows, and the
    results broadcast-join back onto the doc list.  This is the
    decode-each-distinct-payload-once shape a 100 TB media pipeline
    uses (exact-dedup BEFORE the expensive decode — q20 in front of the
    codec): Python cost is O(identities), never O(corpus).  Measured
    locally: 12.2 s → ~1 s at sf0.1 for byte-identical output.

    JPEG is LOSSY, so the oracle contract is the q15 self-verifying
    style: closed-form columns (dims, image-identity key) plus
    within-bound BOOLEANS (JFIF framing, decoded shape, max-abs
    roundtrip error ≤ 32, mean-luminance drift ≤ 2) hashed against
    literal TRUE — a garbage decode (wrong coefficients, broken
    Huffman state, bad upsampling) blows the bounds immediately."""
    import numpy as np

    from postfix_log_parser_spark.ext.jpeg import (
        JPEG_W,
        decode_baseline_jpeg,  # noqa: F401 — dispatched via decode_image
        synth_jpeg,
        synth_raster,
    )

    iddocs = docs.select(
        "doc_id",
        ((F.col("doc_id") * 31) % 256).alias("a"),
        (16 + 8 * (F.col("n_chars") % 3)).alias("jh"),
        "n_chars",
    )
    # any member row reproduces its identity's raster: (rep_id*31)%256
    # == a for every rep in the group, and synth only uses n_chars % 3,
    # constant within a (a, jh) group
    idents = iddocs.groupBy("a", "jh").agg(
        F.min("doc_id").alias("rep_id"),
        F.min("n_chars").alias("rep_chars"),
    )
    # AQE coalesces the 768-row aggregate to one partition, which would
    # serialize the codec onto one core; a cheap round-robin spread buys
    # full parallelism for the expensive Arrow stage (the _augmented
    # pattern — at scale the identity table is already wide)
    idents = idents.repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "jpeg_w", "jpeg_h", "img_key", "jfif_ok", "dims_ok",
                "err_ok", "mean_ok",
            )}
            for rep_id, rep_chars in zip(pdf["rep_id"], pdf["rep_chars"]):
                rep_id, rep_chars = int(rep_id), int(rep_chars)
                orig = synth_raster(rep_id, rep_chars)
                payload = synth_jpeg(rep_id, rep_chars)
                decoded = decode_image(payload)
                err = np.abs(decoded.astype(np.int64) - orig.astype(np.int64))
                h, w = orig.shape[:2]
                rows["jpeg_w"].append(w)
                rows["jpeg_h"].append(h)
                rows["img_key"].append(f"{(rep_id * 31) % 256}:{h}")
                rows["jfif_ok"].append(
                    payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
                )
                rows["dims_ok"].append(decoded.shape == orig.shape)
                rows["err_ok"].append(int(err.max()) <= JPEG_ERR_TOL)
                rows["mean_ok"].append(
                    abs(float(decoded.mean()) - float(orig.mean()))
                    <= JPEG_MEAN_TOL
                )
            yield pd.DataFrame(
                {
                    "a": pdf["a"].astype("int64"),
                    "jh": pdf["jh"].astype("int64"),
                    **{k: pd.array(v) for k, v in rows.items()},
                }
            )

    qa_idents = idents.mapInPandas(batches, _JPEG_IDENT_QA_SCHEMA)
    return iddocs.join(F.broadcast(qa_idents), ["a", "jh"]).select(
        "doc_id", "jpeg_w", "jpeg_h", "img_key",
        "jfif_ok", "dims_ok", "err_ok", "mean_ok",
    )


def q163_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG roundtrip QA + identical-image cluster sizes: the
    second COMPRESSED image format decoded end-to-end in an oracle-green
    query (PNG was r8's).  The cluster count keys on the closed-form
    image identity ((doc_id*31) mod 256, height) — documents with the
    same identity share payload bytes and therefore decoded pixels, the
    exact-dedup property q111 checks via phash, provable here without
    expressing the lossy transform in SQL.

    Scale: the codec runs Arrow-batched per partition (no shuffle); the
    only exchange is the small img_key window for cluster sizes — at
    100 TB that is q20's exact-dedup hash shuffle on a 10-byte key."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars")
        )
    )
    qa = jpeg_roundtrip_qa(docs)
    win = Window.partitionBy("img_key")
    return qa.withColumn(
        "cluster_size", F.count(F.lit(1)).over(win).cast("long")
    )


_Q163_SQL = """
WITH img AS (
  SELECT doc_id,
         (doc_id * 31) % 256 AS a,
         16 + 8 * (coalesce(n_chars, 0) % 3) AS jh
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       24 AS jpeg_w,
       jh AS jpeg_h,
       CAST(a AS VARCHAR) || ':' || CAST(jh AS VARCHAR) AS img_key,
       TRUE AS jfif_ok,
       TRUE AS dims_ok,
       TRUE AS err_ok,
       TRUE AS mean_ok,
       CAST(count(*) OVER (PARTITION BY a, jh) AS BIGINT) AS cluster_size
FROM img
"""


MULTIMODAL_QUERIES = {
    "q31_multimodal_features": q31_multimodal_features,
    "q34_frame_sample": q34_frame_sample,
    "q111_phash_dedup": q111_phash_dedup,
    "q116_audio_features": q116_audio_features,
    "q140_video_scene_cuts": q140_video_scene_cuts,
    "q163_jpeg_roundtrip": q163_jpeg_roundtrip,
    "q167_adpcm_features": q167_adpcm_features,
}
MULTIMODAL_ORACLES = {
    "q31_multimodal_features": _Q31_SQL,
    "q34_frame_sample": _Q34_SQL,
    "q111_phash_dedup": _Q111_SQL,
    "q116_audio_features": _Q116_SQL,
    "q140_video_scene_cuts": _Q140_SQL,
    "q163_jpeg_roundtrip": _Q163_SQL,
    "q167_adpcm_features": _Q167_SQL,
}
