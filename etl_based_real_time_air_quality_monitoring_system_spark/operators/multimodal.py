"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (BASELINE.json north star).

The container has no image/audio codecs, so the *decode* step is
stubbed two ways — a clearly-marked ``NotImplementedError`` for the
real path and a deterministic fake (md5-derived features) that keeps
the Spark-side plumbing fully real and testable: schema, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning.

This is the ONE module where pandas UDFs are correct: per-payload
decode is inherently Python/native-library work, and ``mapInPandas``
gives it Arrow-batched transfer + per-partition execution, the
pattern a real decoder (PIL / torchaudio / pyav) would drop into
unchanged.
"""

from __future__ import annotations

import hashlib
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


def decode_real(payload: bytes, modality: str):  # pragma: no cover - stub
    """STUB: real decode requires PIL / libsndfile / pyav, none of
    which ship in this container.  A production build replaces this
    body; everything around it (batching, schema, partitioning) is
    already real."""
    raise NotImplementedError(
        f"real {modality} decode needs a codec library not present in this "
        "environment; use fake_features (deterministic) or vendor a decoder"
    )


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
