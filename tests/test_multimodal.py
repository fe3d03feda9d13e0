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


def test_real_codec_matches_fake_kernel_contract(spark):
    """Real-codec parity with the fake-kernel contract (the oracle
    surface): swap PIL in for both the resize= and decode= hooks on a
    REAL in-test PNG and pin that output schema, row counts, and
    per-row shapes/types are identical to the fake path — the plumbing
    (Arrow batch shape, struct metadata, feature arity) must not
    depend on which codec runs. Skips cleanly where Pillow is absent
    (this image); runs in a production container."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")

    from polla_spark.operators.multimodal import (
        extract_features,
        fake_decode,
        fake_resize,
        pil_resize,
    )

    def pil_decode(content: bytes, modality: str) -> list[int]:
        # a real decoder with fake_decode's signature/arity contract:
        # 4 ints derived from decoded PIXELS (not the container bytes)
        img = PIL_Image.open(io.BytesIO(content)).convert("RGB")
        px = list(img.getdata())
        n = len(px)
        return [
            n,
            sum(p[0] for p in px) // n,
            sum(p[1] for p in px) // n,
            sum(p[2] for p in px) // n,
        ]

    buf = io.BytesIO()
    PIL_Image.new("RGB", (16, 16), color=(10, 200, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    a = spark.createDataFrame(
        [(7, "image", png, {"width": 16, "height": 16, "duration_ms": None, "codec": "image/png"})],
        ASSET_SCHEMA,
    )
    for rz in (fake_resize, pil_resize):
        out = resize_images(a, 8, 8, resize=rz)
        assert out.schema == ASSET_SCHEMA
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["meta"]["width"] == 8
        assert isinstance(bytes(rows[0]["content"]), bytes)
    feats = {}
    for name, dec in (("fake", fake_decode), ("real", pil_decode)):
        out = extract_features(a, decode=dec)
        assert [f.name for f in out.schema.fields] == [
            "asset_id", "modality", "n_bytes", "features",
        ]
        row = out.first()
        assert row["n_bytes"] == len(png)
        assert len(row["features"]) == 4  # same feature arity either codec
        feats[name] = list(row["features"])
    # the real decoder read actual pixels: 16x16 of (10,200,30)
    assert feats["real"] == [256, 10, 200, 30]


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


def test_segment_audio_overlap_and_coverage(spark):
    """Audio segmentation contract: only audio rows cross the kernel;
    stride < window produces genuine OVERLAP (summed window time per
    asset exceeds its duration whenever it has >=2 segments); the
    byte ranges are the exact integer mapping b = (n*t) // dur; and —
    independently of that formula — stitching each segment's
    non-overlapping prefix reconstructs the full payload byte-for-
    byte (no byte lost or shifted at segment boundaries)."""
    from polla_spark.operators.multimodal import segment_audio

    a = _assets(spark)
    segs = segment_audio(a, window_ms=640, stride_ms=320)
    rows = segs.collect()
    assert rows and all(r["asset_id"] % 3 == 1 for r in rows)
    # overlap: an asset with >=2 segments has sum(t1-t0) > duration
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    multi = {k: v for k, v in by_asset.items() if len(v) >= 2}
    assert multi, "fixture too small: no asset got >=2 segments"
    audio_rows = a.filter(F.col("modality") == "audio").collect()
    durs = {r["asset_id"]: r["meta"]["duration_ms"] for r in audio_rows}
    contents = {r["asset_id"]: bytes(r["content"]) for r in audio_rows}
    for aid, ss in multi.items():
        assert sum(s["t1_ms"] - s["t0_ms"] for s in ss) > durs[aid]
        # exact byte mapping per segment
        blob, dur, n = contents[aid], durs[aid], len(contents[aid])
        for s in ss:
            want = blob[(n * s["t0_ms"]) // dur : (n * s["t1_ms"]) // dur]
            assert bytes(s["segment"]) == want
        # INDEPENDENT no-byte-lost reconstruction: stitch each
        # segment's non-overlapping prefix (up to the next segment's
        # start byte) plus the last segment whole — must equal the
        # original payload byte-for-byte (a spec-level boundary shift
        # in the kernel fails this even if it matches its own formula)
        ss_sorted = sorted(ss, key=lambda s: s["seg_idx"])
        starts = [(n * s["t0_ms"]) // dur for s in ss_sorted]
        rebuilt = b"".join(
            bytes(s["segment"])[: starts[i + 1] - starts[i]]
            for i, s in enumerate(ss_sorted[:-1])
        ) + bytes(ss_sorted[-1]["segment"])
        assert rebuilt == blob
    # determinism: second run bit-identical
    again = {
        (r["asset_id"], r["seg_idx"]): bytes(r["segment"])
        for r in segment_audio(a, window_ms=640, stride_ms=320).collect()
    }
    assert {(r["asset_id"], r["seg_idx"]): bytes(r["segment"]) for r in rows} == again


def test_segment_audio_skips_zero_duration(spark):
    """Zero-duration and NULL-content assets yield NO segments
    (kernel guards) — matching the oracle's encode(NULL) -> NULL,
    WHERE dur > 0 filtering instead of crashing the task."""
    from pyspark.sql import Row

    from polla_spark.operators.multimodal import ASSET_SCHEMA, segment_audio

    rows = [
        Row(asset_id=1, modality="audio", content=b"", meta=Row(
            width=64, height=64, duration_ms=0, codec="fake/v1")),
        Row(asset_id=2, modality="audio", content=None, meta=Row(
            width=64, height=64, duration_ms=50, codec="fake/v1")),
        Row(asset_id=4, modality="audio", content=b"0123456789", meta=Row(
            width=64, height=64, duration_ms=100, codec="fake/v1")),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = segment_audio(df).collect()
    assert {r["asset_id"] for r in got} == {4}


def test_ahash_bands_kernel(spark):
    """aHash bands are a pure function of content bytes: identical
    content -> identical bands regardless of batching; empty content
    -> all-zero bands; a changed byte flips some band."""
    from pyspark.sql import functions as F

    from polla_spark.operators.multimodal import ahash_bands

    rows = [
        (1, "image", bytearray(b"a" * 100)),
        (2, "image", bytearray(b"a" * 100)),          # identical twin
        (3, "image", bytearray(b"a" * 50 + b"z" * 50)),
        (4, "audio", bytearray(b"a" * 100)),          # filtered out
        (5, "image", bytearray(b"")),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary"
    )
    got = {r["asset_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in ahash_bands(assets).collect()}
    assert set(got) == {1, 2, 3, 5}  # audio never enters the kernel
    assert got[1] == got[2]          # content-addressed
    assert got[1] != got[3]          # a different byte pattern diverges
    assert got[5] == (0, 0, 0, 0)    # zero-byte asset -> documented zeros
    for bands in got.values():       # bands are 16-bit
        assert all(0 <= b < 65536 for b in bands)


def test_ahash_uniform_content_is_all_ones(spark):
    # every pixel equals the mean -> every bit is 1 (64*p >= sum)
    from polla_spark.operators.multimodal import ahash_bands

    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"\x07" * 64))],
        "asset_id long, modality string, content binary",
    )
    r = ahash_bands(assets).collect()[0]
    assert (r["b0"], r["b1"], r["b2"], r["b3"]) == (65535,) * 4


def test_phash_bands_kernel_vs_independent_python_dct(spark):
    """pHash bands pinned against an INDEPENDENT pure-Python DCT
    (explicit quadruple loop + sorted()-median — no numpy, no shared
    code path with the kernel's matmul), from the same committed
    PHASH_T table. Also the invariance properties: content-addressed,
    modality-filtered, zero-byte sentinel."""
    from polla_spark.operators.multimodal import PHASH_T, phash_bands

    def reference(content: bytes):
        if not content:
            return (0, 0, 0, 0)
        n = len(content)
        px = [[content[((8 * x + y) * n) // 64] for y in range(8)]
              for x in range(8)]
        coef = []
        for u in range(8):
            for v in range(8):
                s = 0
                for x in range(8):
                    for y in range(8):
                        s += px[x][y] * PHASH_T[u][x] * PHASH_T[v][y]
                coef.append(s)
        med = sorted(coef[1:])[31]
        bits = [1 if c > med else 0 for c in coef]
        out = []
        for b in range(4):
            v = 0
            for bit in bits[16 * b: 16 * b + 16]:
                v = (v << 1) | bit
            out.append(v)
        return tuple(out)

    payloads = {
        1: bytes(b"a" * 100),
        2: bytes(b"a" * 100),
        3: bytes(b"The quick brown fox jumps over the lazy dog" * 5),
        5: bytes(b""),
        6: bytes(range(256)),
    }
    rows = [(k, "image", bytearray(v)) for k, v in payloads.items()]
    rows.append((4, "video", bytearray(b"a" * 100)))  # filtered out
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary"
    )
    got = {r["asset_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in phash_bands(assets).collect()}
    assert set(got) == set(payloads)          # video never enters
    for aid, content in payloads.items():
        assert got[aid] == reference(content), aid
    assert got[1] == got[2]                   # content-addressed
    assert got[1] != got[3]
    for bands in got.values():
        assert all(0 <= b < 65536 for b in bands)
