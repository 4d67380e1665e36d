"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (BASELINE.json north star).

Decode is REAL for header-parseable container formats: ``decode_header``
parses BMP (BITMAPINFOHEADER), PCM-WAV (RIFF chunk walk), PNG (IHDR
chunk, big-endian), GIF (logical screen descriptor, little-endian)
and JPEG (marker-segment walk to SOF) with stdlib ``struct`` only —
no codec library — and ``encode_bmp`` / ``encode_wav`` /
``encode_png`` / ``encode_gif`` / ``encode_jpeg_header`` are its
synthesis twins, so the encode→decode round trip is oracle-checked in
the driver gate (``multimodal_decode``) across five formats.
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
