"""Multimodal kernel tests: schema contract, Arrow batch shape,
1->N expansion, determinism of the fake decode (north-star surface;
no reference analog)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from polla_spark.operators.multimodal import (
    ASSET_SCHEMA,
    FRAME_SCHEMA,
    documents_as_assets,
    extract_features,
    fake_decode,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_SMOKE


def _assets(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return documents_as_assets(docs)


def test_asset_schema_and_modalities(spark):
    a = _assets(spark)
    # simpleString compares names+types, ignoring nullability flags
    assert a.schema.simpleString() == ASSET_SCHEMA.simpleString()
    mods = {r["modality"] for r in a.select("modality").distinct().collect()}
    assert mods <= {"image", "audio", "video"}
    # metadata is queryable without touching content (column pruning)
    row = a.select("meta.width", "meta.codec").first()
    assert row["width"] == 64 and row["codec"] == "fake/v1"


def test_extract_features_matches_local_decode(spark):
    a = _assets(spark)
    feats = extract_features(a)
    got = {r["asset_id"]: r for r in feats.collect()}
    src = {r["asset_id"]: bytes(r["content"]) for r in a.collect()}
    assert set(got) == set(src)
    for aid, blob in src.items():
        assert got[aid]["features"] == fake_decode(blob, got[aid]["modality"])
        assert got[aid]["n_bytes"] == len(blob)


def test_extract_features_runs_twice_identically(spark):
    # retry-safety: the kernel must be deterministic across runs
    a = _assets(spark)
    r1 = sorted(map(str, extract_features(a).collect()))
    r2 = sorted(map(str, extract_features(a).collect()))
    assert r1 == r2


def test_resize_images_only_touches_images(spark):
    a = _assets(spark)
    out = resize_images(a, 8, 8)
    assert out.schema == ASSET_SCHEMA
    rows = out.collect()
    n_images = a.filter(F.col("modality") == "image").count()
    assert len(rows) == n_images
    for r in rows:
        assert r["modality"] == "image"
        assert len(bytes(r["content"])) == 64  # 8*8 fake payload
        assert r["meta"]["width"] == 8 and r["meta"]["codec"] == "fake/resized"


def test_resize_payload_is_deterministic_fake(spark):
    a = _assets(spark).filter(F.col("modality") == "image").limit(1)
    src = bytes(a.first()["content"])
    seed = hashlib.sha256(src).digest()
    expected = (seed * (64 // len(seed) + 1))[:64]
    got = bytes(resize_images(a, 8, 8).first()["content"])
    assert got == expected


def test_resize_with_injected_codec(spark):
    """Any (content, w, h) -> (bytes, codec) callable slots in — the
    wiring a real Pillow/ffmpeg deployment uses."""
    a = _assets(spark).filter(F.col("modality") == "image").limit(3)

    def shouty_codec(content: bytes, width: int, height: int):
        return content[: width * height].upper(), "test/upper"

    rows = resize_images(a, 4, 4, resize=shouty_codec).collect()
    assert rows
    for r in rows:
        assert r["meta"]["codec"] == "test/upper"
        assert len(bytes(r["content"])) <= 16


def test_resize_real_pil_roundtrip(spark):
    """Real-codec path: only runs where Pillow exists (the production
    container); asserts decode -> resize -> re-encode end-to-end."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")

    from polla_spark.operators.multimodal import pil_resize

    buf = io.BytesIO()
    PIL_Image.new("RGB", (32, 32), color=(250, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    a = spark.createDataFrame(
        [(1, "image", png, {"width": 32, "height": 32, "duration_ms": None, "codec": "image/png"})],
        ASSET_SCHEMA,
    )
    out = resize_images(a, 8, 8, resize=pil_resize).first()
    resized = PIL_Image.open(io.BytesIO(bytes(out["content"])))
    assert resized.size == (8, 8)
    assert out["meta"]["codec"] == "image/png"


def test_sample_frames_expands_rows(spark):
    a = _assets(spark)
    frames = sample_frames(a, every_bytes=100)
    assert frames.schema == FRAME_SCHEMA
    vids = {
        r["asset_id"]: len(bytes(r["content"]))
        for r in a.filter(F.col("modality") == "video").collect()
    }
    per_asset = {
        r["asset_id"]: r["n"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_asset) == set(vids)
    for aid, n_bytes in vids.items():
        expected = max((n_bytes + 99) // 100, 1)
        assert per_asset[aid] == expected
    # frame bytes reassemble the original payload
    one = min(vids)
    got = b"".join(
        bytes(r["frame"])
        for r in frames.filter(F.col("asset_id") == one).orderBy("frame_idx").collect()
    )
    src = bytes(a.filter(F.col("asset_id") == one).first()["content"])
    assert got == src
