"""Multimodal plumbing: schema, Arrow batch shape, determinism —
decode itself is stubbed (no codecs in this container)."""

from __future__ import annotations

import pytest

from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_real,
    extract_features,
    frame_sample,
    synthesize_assets,
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


def test_decode_real_is_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"bytes", "image")


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
