"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (BASELINE.json north star).

Decode is REAL for header-parseable container formats: ``decode_header``
parses BMP (BITMAPINFOHEADER), PCM-WAV (RIFF chunk walk), PNG (IHDR
chunk, big-endian), GIF (logical screen descriptor, little-endian),
JPEG (marker-segment walk to SOF), TIFF (IFD entry walk, both byte
orders) and FLAC (STREAMINFO bit-unpacking) with stdlib ``struct``
only — no codec library — and ``encode_bmp`` / ``encode_wav`` /
``encode_png`` / ``encode_gif`` / ``encode_jpeg_header`` /
``encode_tiff`` / ``encode_flac`` are its synthesis twins, so the
encode→decode round trip is oracle-checked in the driver gate
(``multimodal_decode``) across seven formats.
Pixel-level decode of compressed payloads (JPEG entropy data,
PNG IDAT inflate, MP3, H.264) genuinely requires codec libraries
this container lacks; that extension drops into ``decode_header``'s
dispatch, everything around it (schema, Arrow batch shapes,
``mapInPandas`` signatures, partitioning) is unchanged.  Feature
extraction uses a deterministic md5-derived stand-in (integer-exact,
hence gate-checkable).

This is the ONE module where pandas UDFs are correct: per-payload
decode is inherently Python/native-library work, and ``mapInPandas``
gives it Arrow-batched transfer + per-partition execution, the
pattern a real decoder (PIL / torchaudio / pyav) would drop into
unchanged.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthesize_assets(spark: SparkSession, n: int, modality: str = "image") -> DataFrame:
    """Deterministic fake corpus: payload bytes derived from md5 of the
    id — stable across runs, no RNG, no external data."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.lit(modality).alias("modality"),
            F.repeat(F.md5(F.col("id").cast("string").cast("binary")), 8)
            .cast("binary")
            .alias("payload"),
            F.struct(
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                F.lit(16000).alias("sample_rate"),
                F.lit(8).alias("n_frames"),
                F.lit("fake").alias("format"),
            ).alias("meta"),
        )
    )


def synthesize_media_assets(
    spark: SparkSession, n_images: int, n_audio: int,
    n_png: int = 0, n_gif: int = 0, n_jpeg: int = 0,
    n_tiff: int = 0, n_flac: int = 0,
) -> DataFrame:
    """Deterministic corpus of REAL container-format payloads (valid
    BMP, PCM-WAV, PNG, GIF and JPEG headers built with
    ``struct.pack``): every dimension is pure arithmetic over the
    asset id, so an oracle can re-derive the expected decode output
    term-for-term.

    Synthesis runs inside ``mapInPandas`` (Arrow-batched, partitioned
    with the ``range`` source) — the same distributed shape real
    ingestion would have; nothing materializes on the driver."""

    def make_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "image",
                    "payload": [
                        encode_bmp(16 + int(i) % 17, 8 + int(i) % 11) for i in ids
                    ],
                }
            )

    def make_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "audio",
                    "payload": [
                        encode_wav(
                            8000 + 1000 * (int(i) % 5),
                            1 + int(i) % 2,
                            8 * (1 + int(i) % 2),
                            100 + int(i) * 7,
                        )
                        for i in ids
                    ],
                }
            )

    schema = "asset_id long, modality string, payload binary"
    # partition count scales with the corpus instead of defaulting to
    # the session parallelism: a fixture-sized range would otherwise
    # fan 64 rows across 32 partitions and pay ~1 Python-worker spinup
    # per 2 rows in each mapInPandas stage; at real corpus sizes this
    # converges to the session default
    par = spark.sparkContext.defaultParallelism

    def parts(n: int) -> int:
        return max(1, min(par, n // 16))

    def make_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "image",
                    "payload": [
                        encode_png(32 + int(i) % 13, 16 + int(i) % 7) for i in ids
                    ],
                }
            )

    def make_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "image",
                    "payload": [
                        encode_gif(10 + int(i) % 21, 5 + int(i) % 9) for i in ids
                    ],
                }
            )

    def make_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "image",
                    "payload": [
                        encode_jpeg_header(100 + int(i) % 31, 50 + int(i) % 17)
                        for i in ids
                    ],
                }
            )

    images = spark.range(n_images, numPartitions=parts(n_images)).mapInPandas(
        make_image, schema
    )
    audio = spark.range(n_audio, numPartitions=parts(n_audio)).mapInPandas(
        make_audio, schema
    )
    out = images.unionByName(audio)
    if n_png:
        # offset ids keep asset_id unique across format arms
        pngs = (
            spark.range(n_png, numPartitions=parts(n_png))
            .mapInPandas(make_png, schema)
            .withColumn("asset_id", F.col("asset_id") + F.lit(1_000_000))
        )
        out = out.unionByName(pngs)
    if n_gif:
        gifs = (
            spark.range(n_gif, numPartitions=parts(n_gif))
            .mapInPandas(make_gif, schema)
            .withColumn("asset_id", F.col("asset_id") + F.lit(2_000_000))
        )
        out = out.unionByName(gifs)
    if n_jpeg:
        jpegs = (
            spark.range(n_jpeg, numPartitions=parts(n_jpeg))
            .mapInPandas(make_jpeg, schema)
            .withColumn("asset_id", F.col("asset_id") + F.lit(3_000_000))
        )
        out = out.unionByName(jpegs)

    def make_tiff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "image",
                    # alternate byte order by parity: both IFD walks are
                    # exercised, the decoded dimensions are identical
                    "payload": [
                        encode_tiff(
                            20 + int(i) % 29,
                            12 + int(i) % 15,
                            big_endian=bool(int(i) % 2),
                        )
                        for i in ids
                    ],
                }
            )

    def make_flac(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": "audio",
                    "payload": [
                        encode_flac(
                            8000 + 441 * (int(i) % 9),
                            1 + int(i) % 2,
                            8 + 4 * (int(i) % 3),
                            50 + 3 * int(i),
                        )
                        for i in ids
                    ],
                }
            )

    if n_tiff:
        tiffs = (
            spark.range(n_tiff, numPartitions=parts(n_tiff))
            .mapInPandas(make_tiff, schema)
            .withColumn("asset_id", F.col("asset_id") + F.lit(4_000_000))
        )
        out = out.unionByName(tiffs)
    if n_flac:
        flacs = (
            spark.range(n_flac, numPartitions=parts(n_flac))
            .mapInPandas(make_flac, schema)
            .withColumn("asset_id", F.col("asset_id") + F.lit(5_000_000))
        )
        out = out.unionByName(flacs)
    return out


def decode_header(payload: bytes | None) -> dict:
    """REAL header-only decode for header-parseable container formats,
    stdlib ``struct`` only — no codec library needed.

    Parses BMP (``BITMAPINFOHEADER``: signature, pixel-data offset,
    width, height, bits-per-pixel), WAV (RIFF/WAVE ``fmt `` chunk:
    channels, sample rate, bits-per-sample, plus frame count from the
    ``data`` chunk), PNG (``IHDR``: big-endian width/height at fixed
    offsets 16/20, bit depth + color type → channels), GIF
    (logical screen descriptor: little-endian width/height at offsets
    6/8, color-resolution bits from the packed flags byte) and JPEG
    (marker-segment walk to the first SOF frame header: precision,
    height, width, component count).  Anything
    else — including truncated headers — returns
    ``{"format": "unknown"}`` rather than raising, so one bad asset
    never kills an Arrow batch.

    Pixel-level decode of compressed payloads (JPEG, PNG IDAT
    inflate, MP3, H.264) genuinely requires codec libraries that don't
    ship in this container; a production build extends this dispatch,
    the surrounding plumbing (batching, schema, partitioning) is
    unchanged.
    """
    out = {
        "format": "unknown",
        "width": None,
        "height": None,
        "sample_rate": None,
        "channels": None,
        "bits": None,
        "n_frames": None,
    }
    if not payload:
        return out
    buf = bytes(payload)
    if buf[:2] == b"BM" and len(buf) >= 30:
        # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: width at 18
        # (int32 LE), height at 22 (int32 LE, negative = top-down row
        # order), bpp at 28 (uint16 LE)
        width, height = struct.unpack_from("<ii", buf, 18)
        (bpp,) = struct.unpack_from("<H", buf, 28)
        # negative height is legal (top-down row order); a non-positive
        # WIDTH is not — treat the header as malformed, honoring the
        # "garbage in -> unknown" contract
        if width <= 0 or height == 0:
            return out
        out.update(format="bmp", width=width, height=abs(height), bits=bpp)
        return out
    if buf[:4] == b"RIFF" and len(buf) >= 12 and buf[8:12] == b"WAVE":
        # walk RIFF chunks: each is 4-byte id + uint32 LE size + body
        # (word-aligned); "fmt " carries the stream parameters, "data"
        # carries sample bytes -> frame count
        pos = 12
        fmt_seen = False
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (csize,) = struct.unpack_from("<I", buf, pos + 4)
            body = pos + 8
            if cid == b"fmt " and body + 16 <= len(buf):
                channels, rate = struct.unpack_from("<HI", buf, body + 2)
                (bits,) = struct.unpack_from("<H", buf, body + 14)
                out.update(
                    format="wav", sample_rate=rate, channels=channels, bits=bits
                )
                fmt_seen = True
            elif cid == b"data" and fmt_seen and out["bits"]:
                bytes_per_frame = max(1, out["channels"] * out["bits"] // 8)
                out["n_frames"] = csize // bytes_per_frame
            pos = body + csize + (csize & 1)
        return out if fmt_seen else {**out, "format": "unknown"}
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 26 and buf[12:16] == b"IHDR":
        # IHDR is mandated to be the first chunk: width/height are
        # big-endian uint32 at fixed offsets 16/20, then bit depth and
        # color type; channels follows from the color type per the
        # PNG spec (0=gray, 2=RGB, 3=palette, 4=gray+alpha, 6=RGBA)
        width, height = struct.unpack_from(">II", buf, 16)
        bit_depth, color_type = struct.unpack_from("BB", buf, 24)
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if width == 0 or height == 0 or channels is None:
            # zero dimensions or an illegal color type: malformed
            # header -> "unknown", same policy as the BMP branch
            return out
        out.update(
            format="png",
            width=width,
            height=height,
            bits=bit_depth,
            channels=channels,
        )
        return out
    if buf[:2] == b"\xff\xd8":
        # JPEG: walk the marker segments (0xFF marker + uint16 BE
        # length including itself) to the first start-of-frame
        # (SOF0..SOF15 except DHT/JPG/DAC), which carries bit
        # precision, height, width, and component count — dimensions
        # are header-parseable even though pixel decode needs a codec
        pos = 2
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                return out  # desynced marker stream -> malformed
            marker = buf[pos + 1]
            if marker == 0xD9:  # EOI before any SOF
                return out
            if marker == 0xFF:
                # legal fill byte before a marker: consume ONE 0xFF so
                # the walk stays aligned on the next (possibly final)
                # 0xFF of the run — skipping two would desync on an
                # odd-length fill run
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                pos += 2  # standalone markers carry no length
                continue
            (seglen,) = struct.unpack_from(">H", buf, pos + 2)
            if seglen < 2:
                return out
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 4 + 6 > len(buf):
                    return out
                bits, height, width, ncomp = struct.unpack_from(
                    ">BHHB", buf, pos + 4
                )
                if width == 0 or height == 0:
                    return out
                out.update(
                    format="jpeg",
                    width=width,
                    height=height,
                    bits=bits,
                    channels=ncomp,
                )
                return out
            pos += 2 + seglen
        return out
    if buf[:4] in (b"II*\x00", b"MM\x00*") and len(buf) >= 8:
        # TIFF: 2-byte byte-order mark ("II" little / "MM" big), magic
        # 42, then a uint32 offset to the first IFD — a table of
        # 12-byte entries (tag, type, count, value-or-offset).  Width/
        # height/bits live in tags 256/257/258; SHORT(3) values are
        # inline in the first 2 bytes of the value field, LONG(4) in
        # all 4 — both endianness-dependent
        e = "<" if buf[:2] == b"II" else ">"
        (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
        if ifd_off + 2 > len(buf):
            return out
        (n_entries,) = struct.unpack_from(e + "H", buf, ifd_off)
        tags: dict[int, int] = {}
        for k in range(n_entries):
            ep = ifd_off + 2 + 12 * k
            if ep + 12 > len(buf):
                return out
            tag, ttype, count = struct.unpack_from(e + "HHI", buf, ep)
            if count != 1:
                continue  # multi-valued (e.g. per-channel bits) — skip
            if ttype == 3:  # SHORT, inline
                (val,) = struct.unpack_from(e + "H", buf, ep + 8)
            elif ttype == 4:  # LONG, inline
                (val,) = struct.unpack_from(e + "I", buf, ep + 8)
            else:
                continue
            tags[tag] = val
        width, height = tags.get(256), tags.get(257)
        if not width or not height:
            return out
        out.update(format="tiff", width=width, height=height, bits=tags.get(258))
        return out
    if buf[:4] == b"fLaC" and len(buf) >= 8 + 34:
        # FLAC: "fLaC" magic, then metadata blocks (1-byte last+type,
        # uint24 BE length); the first block is mandated STREAMINFO
        # (type 0, 34 bytes) whose bit-packed tail carries sample rate
        # (20 bits), channels-1 (3), bits-per-sample-1 (5) and total
        # samples (36)
        btype = buf[4] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + buf[5:8])
        if btype != 0 or blen < 34:
            return out
        b = buf[8 + 10 : 8 + 18]  # the 8 bit-packed bytes after block sizes
        rate = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
        channels = ((b[2] >> 1) & 0x7) + 1
        bits = (((b[2] & 1) << 4) | (b[3] >> 4)) + 1
        total = ((b[3] & 0x0F) << 32) | (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]
        if rate == 0:
            return out  # spec: 0 is invalid for audio streams
        out.update(
            format="flac",
            sample_rate=rate,
            channels=channels,
            bits=bits,
            n_frames=total,
        )
        return out
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 11:
        # logical screen descriptor: width/height are little-endian
        # uint16 at offsets 6/8; the packed byte at 10 carries the
        # color resolution (bits per primary minus one) in bits 4-6
        width, height = struct.unpack_from("<HH", buf, 6)
        if width == 0 or height == 0:
            return out
        out.update(
            format="gif",
            width=width,
            height=height,
            bits=((buf[10] >> 4) & 0x7) + 1,
        )
        return out
    return out


def encode_bmp(width: int, height: int, pixels: bytes | None = None) -> bytes:
    """Minimal valid 8-bpp BMP (BITMAPINFOHEADER, no palette) — the
    synthesis twin of :func:`decode_header` for fixtures and the
    oracle-gated decode query."""
    row = (width + 3) & ~3  # rows pad to 4-byte boundaries
    body = pixels if pixels is not None else bytes(row * height)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(body), 2835, 2835, 0, 0)
    return head + info + body


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(width: int, height: int, bit_depth: int = 8, color_type: int = 2) -> bytes:
    """Minimal valid PNG (signature + IHDR + empty-scanline IDAT +
    IEND, real CRC32s) — synthesis twin of :func:`decode_header`.
    Default color type 2 is truecolor (3 channels)."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    idat = zlib.compress(b"\x00" * height)  # filter byte per row, no pixels needed
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_gif(width: int, height: int, color_bits: int = 8) -> bytes:
    """Minimal valid GIF89a (header + logical screen descriptor +
    trailer, no color table) — synthesis twin of :func:`decode_header`."""
    if not 1 <= color_bits <= 8:
        # the color-resolution field is 3 bits (values 1..8); anything
        # else would corrupt the packed flags byte (e.g. 9 sets the
        # global-color-table flag for a table that is never written)
        raise ValueError(f"encode_gif: color_bits must be 1..8, got {color_bits}")
    packed = (color_bits - 1) << 4  # color resolution; no GCT
    screen = struct.pack("<HHBBB", width, height, packed, 0, 0)
    return b"GIF89a" + screen + b"\x3b"


def encode_jpeg_header(width: int, height: int, channels: int = 3) -> bytes:
    """Structurally valid JPEG prefix (SOI + JFIF APP0 + SOF0 + EOI, no
    scan data) — synthesis twin of :func:`decode_header`'s marker walk.
    Real pixel payloads need a codec; the header path doesn't."""
    app0_body = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(app0_body)) + app0_body
    comps = b"".join(
        struct.pack("BBB", i + 1, 0x11, 0) for i in range(channels)
    )
    sof_body = struct.pack(">BHHB", 8, height, width, channels) + comps
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def encode_tiff(
    width: int, height: int, bits: int = 8, big_endian: bool = False
) -> bytes:
    """Minimal valid TIFF (header + one IFD with ImageWidth/
    ImageLength/BitsPerSample as inline SHORTs, no strips) in either
    byte order — synthesis twin of :func:`decode_header`'s IFD walk."""
    e = ">" if big_endian else "<"
    head = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(e + "I", 8)

    def entry(tag: int, val: int) -> bytes:
        # type 3 = SHORT, count 1 — the spec left-justifies the value
        # within the 4-byte field in BOTH byte orders
        return struct.pack(e + "HHI", tag, 3, 1) + struct.pack(e + "H", val) + b"\x00\x00"

    ifd = (
        struct.pack(e + "H", 3)
        + entry(256, width)
        + entry(257, height)
        + entry(258, bits)
        + struct.pack(e + "I", 0)  # no next IFD
    )
    return head + ifd


def encode_flac(
    sample_rate: int, channels: int, bits: int, total_samples: int
) -> bytes:
    """Minimal valid FLAC (magic + last-block STREAMINFO with the
    bit-packed stream parameters, zeroed MD5) — synthesis twin of
    :func:`decode_header`."""
    body = bytearray(34)
    struct.pack_into(">HH", body, 0, 4096, 4096)  # min/max blocksize
    # min/max framesize (u24) left 0 = unknown
    b = body
    b[10] = (sample_rate >> 12) & 0xFF
    b[11] = (sample_rate >> 4) & 0xFF
    b[12] = ((sample_rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) | (
        ((bits - 1) >> 4) & 1
    )
    b[13] = (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    struct.pack_into(">I", b, 14, total_samples & 0xFFFFFFFF)
    # bytes 18..33: MD5 of the unencoded audio — zeroed (unknown)
    header = bytes([0x80]) + struct.pack(">I", 34)[1:]  # last block, type 0
    return b"fLaC" + header + bytes(b)


def encode_wav(sample_rate: int, channels: int, bits: int, n_frames: int) -> bytes:
    """Minimal valid PCM WAV header + silent data chunk — synthesis
    twin of :func:`decode_header`."""
    bytes_per_frame = channels * bits // 8
    data = bytes(n_frames * bytes_per_frame)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * bytes_per_frame,
        bytes_per_frame, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def decode_assets(df: DataFrame) -> DataFrame:
    """Arrow-batched real header decode over payload binaries via
    ``mapInPandas``: per-partition batch iterator, no shuffle, output
    partitioning follows input — the same seam a full codec decoder
    drops into."""

    _I32 = 2**31 - 1

    def _i32(v):
        # a field that overflows int32 (e.g. a >2 GiB WAV data chunk's
        # frame count) degrades THAT value to NULL — pd.array would
        # otherwise raise on the unsafe int64->int32 cast and kill
        # every asset in the batch
        return v if v is None or -_I32 - 1 <= v <= _I32 else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "format": [m["format"] for m in metas],
                    "width": pd.array([_i32(m["width"]) for m in metas], dtype="Int32"),
                    "height": pd.array([_i32(m["height"]) for m in metas], dtype="Int32"),
                    "sample_rate": pd.array(
                        [_i32(m["sample_rate"]) for m in metas], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [_i32(m["channels"]) for m in metas], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [_i32(m["n_frames"]) for m in metas], dtype="Int32"
                    ),
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def _fake_feature_vector(payload: bytes) -> np.ndarray:
    """Deterministic stand-in features: md5(payload) expanded to
    FEATURE_DIM doubles in [0, 1)."""
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    digest = b""
    seed = payload or b""
    while len(digest) < FEATURE_DIM * 4:
        seed = hashlib.md5(seed).digest()
        digest += seed
    ints = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    out[:] = ints / 2**32
    return out


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload binaries via
    ``mapInPandas`` — per-partition batch iterator, the real-decoder
    seam.  Output partitioning follows the input (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(
                        lambda p: _fake_feature_vector(bytes(p) if p is not None else b"")
                    ),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling WITHOUT Python: slice the payload
    into ``n_frames`` equal byte ranges with built-in substring over
    binary + posexplode.  (A real sampler replaces byte slicing with
    keyframe offsets from ``meta``.)"""
    total = F.length("payload")
    frame_len = F.greatest((total / n_frames).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.expr("payload").substr(i * frame_len + 1, frame_len),
    )
    out = df.select(
        "asset_id",
        "modality",
        F.posexplode(frames).alias("frame_index", "frame_payload"),
    )
    return out.filter(F.length("frame_payload") > 0)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize seam via ``mapInPandas``.

    The real body is decode -> resample -> re-encode (PIL's
    ``Image.resize``); no codec ships in this container, so the
    deterministic stand-in emulates the *shape contract*: output
    payload length is exactly ``width*height`` bytes derived from the
    input payload (truncate/cycle), and the declared meta dimensions
    are rewritten.  Everything a production build keeps — batch
    iteration, binary in/out schema, no shuffle, output partitioning
    following input — is real and tested.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def body(p) -> bytes:
                src = bytes(p) if p is not None else b"\0"
                reps = -(-target // len(src))  # ceil-div: cycle payload
                return (src * reps)[:target]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload": pdf["payload"].map(body),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)
