"""Multimodal plumbing: schema, Arrow batch shape, determinism — plus
the REAL header-only decode (BMP / PCM-WAV via struct.unpack; no codec
library needed, compressed formats are out of scope in this
container)."""

from __future__ import annotations

from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_assets,
    decode_header,
    encode_bmp,
    encode_gif,
    encode_jpeg_header,
    encode_png,
    encode_wav,
    extract_features,
    frame_sample,
    synthesize_assets,
    synthesize_media_assets,
)


def test_synthesize_schema(spark):
    df = synthesize_assets(spark, 10)
    assert [f.name for f in df.schema.fields] == ["asset_id", "modality", "payload", "meta"]
    row = df.head()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["width"] == 64


def test_extract_features_shape_and_determinism(spark):
    df = synthesize_assets(spark, 20)
    out1 = {r["asset_id"]: r for r in extract_features(df).collect()}
    out2 = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert len(out1) == 20
    for aid, row in out1.items():
        assert len(row["features"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in row["features"])
        assert row["payload_bytes"] == 256  # 8 x 32-char md5 hex
        # bitwise deterministic across runs
        assert row["features"] == out2[aid]["features"]


def test_frame_sample(spark):
    df = synthesize_assets(spark, 3, modality="video")
    frames = frame_sample(df, n_frames=4).collect()
    assert len(frames) == 12
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for rows in by_asset.values():
        assert sorted(r["frame_index"] for r in rows) == [0, 1, 2, 3]
        assert all(len(r["frame_payload"]) == 64 for r in rows)


def test_decode_header_bmp_round_trip():
    for w, h in [(1, 1), (16, 9), (640, 480), (33, 7)]:
        meta = decode_header(encode_bmp(w, h))
        assert (meta["format"], meta["width"], meta["height"]) == ("bmp", w, h)
        assert meta["bits"] == 8


def test_decode_header_bmp_top_down_height_is_abs():
    # negative biHeight means top-down row order; dimensions stay positive
    import struct

    buf = bytearray(encode_bmp(10, 4))
    buf[22:26] = struct.pack("<i", -4)
    meta = decode_header(bytes(buf))
    assert meta["height"] == 4


def test_decode_header_wav_round_trip():
    for rate, ch, bits, frames in [(8000, 1, 8, 100), (44100, 2, 16, 4410)]:
        meta = decode_header(encode_wav(rate, ch, bits, frames))
        assert meta["format"] == "wav"
        assert meta["sample_rate"] == rate
        assert meta["channels"] == ch
        assert meta["bits"] == bits
        assert meta["n_frames"] == frames


def test_decode_header_property_round_trip():
    # property check: ANY dimensions the encoder accepts must decode
    # back exactly (the encode/decode pair is the oracle seam for the
    # multimodal_decode gate query — drift here breaks the gate)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(1, 4096), h=st.integers(1, 4096))
    def bmp_case(w, h):
        m = decode_header(encode_bmp(w, h))
        assert (m["format"], m["width"], m["height"]) == ("bmp", w, h)

    @settings(max_examples=200, deadline=None)
    @given(
        rate=st.integers(1, 384_000),
        ch=st.integers(1, 8),
        bits=st.sampled_from([8, 16, 24, 32]),
        frames=st.integers(0, 10_000),
    )
    def wav_case(rate, ch, bits, frames):
        m = decode_header(encode_wav(rate, ch, bits, frames))
        assert (m["format"], m["sample_rate"], m["channels"], m["bits"], m["n_frames"]) == (
            "wav", rate, ch, bits, frames,
        )

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(1, 65_535), h=st.integers(1, 65_535))
    def png_gif_case(w, h):
        p = decode_header(encode_png(w, h))
        assert (p["format"], p["width"], p["height"], p["bits"], p["channels"]) == (
            "png", w, h, 8, 3,
        )
        g = decode_header(encode_gif(w, h))
        assert (g["format"], g["width"], g["height"], g["bits"]) == ("gif", w, h, 8)

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 65_535), h=st.integers(1, 65_535), c=st.integers(1, 4),
        fill=st.integers(0, 3),
    )
    def jpeg_case(w, h, c, fill):
        raw = encode_jpeg_header(w, h, c)
        # the spec allows 0xFF fill-byte runs (any length, odd or even)
        # before a marker — the walk must stay aligned
        sof = raw.index(b"\xff\xc0")
        raw = raw[:sof] + b"\xff" * fill + raw[sof:]
        j = decode_header(raw)
        assert (j["format"], j["width"], j["height"], j["channels"], j["bits"]) == (
            "jpeg", w, h, c, 8,
        )

    bmp_case()
    wav_case()
    png_gif_case()
    jpeg_case()


def test_decode_header_png_color_types():
    # channels follow the IHDR color type per the PNG spec
    for ctype, channels in ((0, 1), (2, 3), (3, 1), (4, 2), (6, 4)):
        m = decode_header(encode_png(10, 20, color_type=ctype))
        assert (m["format"], m["channels"]) == ("png", channels)


def test_decode_header_garbage_is_unknown_not_error():
    for junk in (
        None, b"", b"\x00" * 100, b"BM", b"RIFFxxxxJUNK", b"\x89PNG\r\n",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"JUNK" + b"\x00" * 20,  # not IHDR
        b"GIF89a",  # truncated screen descriptor
        b"GIF88a" + b"\x00" * 10,  # bad version
        b"\xff\xd8\xff\xd9",  # JPEG EOI before any SOF
        b"\xff\xd8\x00\x00" * 5,  # JPEG desynced marker stream
        b"\xff\xd8\xff\xc0\x00\x01",  # JPEG SOF with impossible length
    ):
        assert decode_header(junk)["format"] == "unknown"


def test_decode_header_zero_dims_are_unknown():
    assert decode_header(encode_png(0, 5))["format"] == "unknown"
    assert decode_header(encode_gif(5, 0))["format"] == "unknown"


def test_decode_assets_distributed_round_trip(spark):
    assets = synthesize_media_assets(spark, 12, 6, n_png=5, n_gif=5, n_jpeg=5)
    rows = {(r["modality"], r["asset_id"]): r for r in decode_assets(assets).collect()}
    assert len(rows) == 33
    for i in range(12):
        r = rows[("image", i)]
        assert (r["format"], r["width"], r["height"]) == ("bmp", 16 + i % 17, 8 + i % 11)
    for i in range(6):
        r = rows[("audio", i)]
        assert (r["format"], r["sample_rate"], r["channels"], r["n_frames"]) == (
            "wav",
            8000 + 1000 * (i % 5),
            1 + i % 2,
            100 + i * 7,
        )
    for i in range(5):
        r = rows[("image", 1_000_000 + i)]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "png", 32 + i % 13, 16 + i % 7, 3,
        )
        r = rows[("image", 2_000_000 + i)]
        assert (r["format"], r["width"], r["height"]) == ("gif", 10 + i % 21, 5 + i % 9)
        r = rows[("image", 3_000_000 + i)]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "jpeg", 100 + i % 31, 50 + i % 17, 3,
        )


def test_resize_images_shape_contract(spark):
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        resize_images,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, 6, "image")
    out = resize_images(assets, 8, 4)
    rows = out.collect()
    assert len(rows) == 6
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)
    # deterministic: same input -> byte-identical output
    again = {r["asset_id"]: bytes(r["payload"]) for r in resize_images(assets, 8, 4).collect()}
    assert {r["asset_id"]: bytes(r["payload"]) for r in rows} == again
    # no shuffle: the seam is a pure mapInPandas over the scan
    p = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in p


def test_decode_header_tiff_flac_round_trip():
    """TIFF (both byte orders, the left-justified inline-SHORT rule)
    and FLAC (STREAMINFO bit-unpacking incl. the 36-bit total-samples
    field) encode->decode round trips, plus malformed-header policy."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        encode_flac,
        encode_tiff,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 65_535), h=st.integers(1, 65_535),
        bits=st.sampled_from([1, 8, 16]), be=st.booleans(),
    )
    def tiff_case(w, h, bits, be):
        m = decode_header(encode_tiff(w, h, bits, big_endian=be))
        assert (m["format"], m["width"], m["height"], m["bits"]) == ("tiff", w, h, bits)

    @settings(max_examples=200, deadline=None)
    @given(
        rate=st.integers(1, 655_350), ch=st.integers(1, 8),
        bits=st.integers(4, 32), total=st.integers(0, 2**36 - 1),
    )
    def flac_case(rate, ch, bits, total):
        m = decode_header(encode_flac(rate, ch, bits, total))
        assert (
            m["format"], m["sample_rate"], m["channels"], m["bits"], m["n_frames"]
        ) == ("flac", rate, ch, bits, total)

    tiff_case()
    flac_case()
    # truncated IFD / missing STREAMINFO -> unknown, never an exception
    assert decode_header(b"II*\x00\x08\x00\x00\x00")["format"] == "unknown"
    assert decode_header(b"MM\x00*\x00\x00\x00\x08\x00")["format"] == "unknown"
    assert decode_header(b"fLaC" + bytes(38))["format"] == "unknown"  # rate 0
    # a FLAC whose first block is not STREAMINFO is malformed
    bad = bytearray(encode_flac(8000, 1, 8, 10))
    bad[4] = 0x81  # last-block flag + type 1 (PADDING)
    assert decode_header(bytes(bad))["format"] == "unknown"
