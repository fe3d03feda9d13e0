"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` kernels.

Design for 100 TB (BASELINE.json north star):

- media is an opaque ``binary`` column next to a typed metadata
  struct — never decoded by Catalyst, so pruning a query down to
  metadata-only never touches the bytes (parquet column pruning);
- the expensive per-asset work runs in ``mapInPandas`` kernels that
  see Arrow record batches (zero-copy into pandas), one Python worker
  per task — the batch shape, schema contract, and partitioning are
  the real scale machinery;
- kernels NEVER shuffle payload bytes: task balance comes from the
  scan's own input splits (``spark.sql.files.maxPartitionBytes``) —
  at 100 TB of media the splits are plentiful and byte-sized, while a
  ``repartition`` before the kernel would make the binary content the
  single most expensive data movement in the system. If a caller must
  rebalance, repartition an (asset_id -> pointer) projection and let
  the kernel fetch bytes itself — never the inline payload;
- modality-specific kernels filter first so image work never scans
  video rows;
- the codec step itself is STUBBED: the container has no image/audio
  libs, so ``decode=`` defaults to a deterministic sha256-derived
  fake. Pass a real decoder with the same signature when PIL/ffmpeg
  exist. Every other part (schemas, batching, expansion) is real and
  tested.

The reference has no media handling (this is pure north-star
surface); the binary+struct modeling follows SURVEY.md §2.6.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

ASSET_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", ASSET_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.LongType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Model the ``documents`` table as a multimodal asset table.

    Text bytes stand in for media payloads (the container ships no
    codecs); modality is a deterministic function of ``doc_id`` so
    the oracle can recompute it. The shape — binary content + typed
    metadata struct — is the real production schema.
    """
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        content.alias("content"),
        meta.alias("meta"),
    )


def fake_decode(content: bytes, modality: str, n_features: int = 4) -> list[int]:
    """Deterministic stand-in for a codec: n 32-bit ints sliced from
    sha256(content). Replace with a real decoder (same signature)
    where image/audio libs exist; sha256 keeps it oracle-checkable
    (DuckDB recomputes the identical value)."""
    hx = hashlib.sha256(content).hexdigest()
    return [int(hx[8 * k : 8 * k + 8], 16) for k in range(n_features)]


def extract_features(
    assets: DataFrame,
    decode: Callable[[bytes, str], list[int]] | None = None,
) -> DataFrame:
    """Per-asset feature extraction as a ``mapInPandas`` kernel.

    Arrow moves each partition into pandas in record batches; the
    kernel loops rows *within* a batch (the decode itself is
    per-asset work) but amortizes interpreter/serialization overhead
    across the batch. The kernel runs on the scan's own partitioning —
    no Exchange ever carries ``content`` (pinned by
    tests/test_plan_shapes.py): input-split sizing, not a payload
    shuffle, is what balances decode cost at scale.
    """
    dec = decode or fake_decode

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                dec(bytes(c), m) if c is not None else None
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(c)) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    return assets.mapInPandas(kernel, FEATURE_SCHEMA)


def fake_resize(content: bytes, width: int, height: int) -> tuple[bytes, str]:
    """Deterministic codec stand-in: ``width*height`` bytes cycled from
    sha256(content). Same signature as :func:`pil_resize`."""
    seed = hashlib.sha256(content).digest()
    need = width * height
    return (seed * (need // len(seed) + 1))[:need], "fake/resized"


def pil_resize(content: bytes, width: int, height: int) -> tuple[bytes, str]:
    """The real-codec wiring example: Pillow decode -> resize -> PNG
    re-encode. Import-gated — pass it (or any same-signature callable)
    as ``resize=`` where Pillow exists; the import happens inside so
    the kernel closure ships cleanly to executors."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content))
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format="PNG")
    return buf.getvalue(), "image/png"


def default_resize() -> Callable[[bytes, int, int], tuple[bytes, str]]:
    """Pillow-backed resize when the lib exists, fake codec otherwise —
    a user with Pillow installed gets the real path with no wiring."""
    try:
        import PIL.Image  # noqa: F401

        return pil_resize
    except ImportError:
        return fake_resize


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    *,
    resize: Callable[[bytes, int, int], tuple[bytes, str]] | None = None,
) -> DataFrame:
    """Resize kernel for ``modality = image`` rows only (filter is
    pushed before the Python boundary, so audio/video bytes never
    cross Arrow). ``resize`` is any ``(content, w, h) -> (bytes,
    codec)`` callable; default = Pillow when importable, else the
    deterministic fake — schema and metadata update are identical
    either way."""
    rz = resize or default_resize()

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: F401

        for pdf in batches:
            out_content, out_codec = [], []
            for c in pdf["content"]:
                payload, codec = rz(bytes(c), width, height)
                out_content.append(payload)
                out_codec.append(codec)
            res = pdf.copy()
            res["content"] = out_content
            res["meta"] = [
                {"width": width, "height": height, "duration_ms": None, "codec": codec}
                for codec in out_codec
            ]
            yield res

    return assets.filter(F.col("modality") == "image").mapInPandas(kernel, ASSET_SCHEMA)


def sample_frames(assets: DataFrame, every_bytes: int = 4096) -> DataFrame:
    """Frame sampling for ``modality = video``: a 1→N row expansion
    inside the kernel (one output row per sampled frame). The
    demuxer is stubbed — frames are byte slices — but the expansion
    batch shape (output batches larger than input batches) is the
    real contract a video pipeline needs."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, c in zip(pdf["asset_id"], pdf["content"]):
                blob = bytes(c)
                for k, off in enumerate(range(0, max(len(blob), 1), every_bytes)):
                    ids.append(aid)
                    idxs.append(k)
                    frames.append(blob[off : off + every_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.filter(F.col("modality") == "video").mapInPandas(kernel, FRAME_SCHEMA)


SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("t0_ms", T.LongType(), False),
        T.StructField("t1_ms", T.LongType(), False),
        T.StructField("segment", T.BinaryType()),
    ]
)


def segment_audio(assets: DataFrame, window_ms: int = 640,
                  stride_ms: int = 320) -> DataFrame:
    """OVERLAPPING-window segmentation for ``modality = audio`` rows —
    the ASR/diarization pre-processing contract, and deliberately a
    different expansion shape than :func:`sample_frames`: video
    frames tile the payload disjointly, audio windows OVERLAP
    (stride < window), so one byte lands in multiple output rows and
    total output bytes EXCEED input bytes — the batch-amplification
    case a pipeline must budget for.

    Segment k covers [k·stride, min(k·stride + window, dur)) in
    media time (k·stride < dur, so every asset with positive
    duration gets ≥1 segment, the trailing one clipped); the byte
    range maps through EXACT integer arithmetic
    b = (n_bytes · t) // dur_ms — reproducible across retries and
    recomputable by the SQL oracle (q195). Zero/negative-duration
    assets yield no segments (the oracle filters identically). The
    modality filter runs before the Python boundary, so image/video
    bytes never cross it."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, t0s, t1s, segs = [], [], [], [], []
            for aid, c, meta in zip(pdf["asset_id"], pdf["content"], pdf["meta"]):
                # crash-vs-filter symmetry with the oracle: NULL
                # content / NULL metadata rows are FILTERED like the
                # oracle's encode(NULL) -> NULL, WHERE dur > 0 path
                # (review-pass finding; extract_features' guard)
                if c is None or meta is None or meta["duration_ms"] is None:
                    continue
                blob = bytes(c)
                n = len(blob)
                dur = int(meta["duration_ms"])
                if dur <= 0:
                    continue
                k = 0
                while k * stride_ms < dur:
                    t0 = k * stride_ms
                    t1 = min(t0 + window_ms, dur)
                    ids.append(aid)
                    idxs.append(k)
                    t0s.append(t0)
                    t1s.append(t1)
                    segs.append(blob[(n * t0) // dur : (n * t1) // dur])
                    k += 1
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "seg_idx": idxs,
                    "t0_ms": t0s,
                    "t1_ms": t1s,
                    "segment": segs,
                }
            )

    return assets.filter(F.col("modality") == "audio").mapInPandas(
        kernel, SEGMENT_SCHEMA
    )


AHASH_SCHEMA = "asset_id long, b0 int, b1 int, b2 int, b3 int"


def ahash_bands(assets: DataFrame) -> DataFrame:
    """Perceptual AVERAGE-HASH (aHash) of image assets as 4×16-bit
    bands — the classic near-duplicate-image fingerprint (resize to
    an 8×8 grid, threshold each pixel against the mean, read the 64
    bits), with the decode step the container's deterministic fake:
    the k-th grid pixel is the content byte at ``(k·n) div 64``
    (reference polla has no media path; the Spark-side plumbing —
    binary column in, typed bands out, Arrow batching, no ``content``
    ever crossing an Exchange — is the real production shape, same
    contract as :func:`extract_features`).

    Bands instead of one 64-bit word: banding is what the LSH join
    needs anyway (q62's SimHash discipline — near-dups at Hamming
    distance ≤ d collide on ≥ one of 4 bands whenever d ≤ 3 per the
    pigeonhole bound), and 16-bit ints dodge the signed-64 edge in
    cross-engine comparisons. The mean threshold is computed in
    integers (``64·p ≥ Σp``) so the bit pattern is bit-reproducible
    by the DuckDB oracle (q205).
    """

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        def bands_of(content: bytes) -> tuple[int, int, int, int]:
            n = len(content)
            if n == 0:
                return (0, 0, 0, 0)
            px = [content[(k * n) // 64] for k in range(64)]
            s = sum(px)
            bits = [1 if 64 * p >= s else 0 for p in px]
            out = []
            for b in range(4):
                v = 0
                for bit in bits[16 * b : 16 * b + 16]:
                    v = (v << 1) | bit
                out.append(v)
            return tuple(out)

        for pdf in batches:
            rows = [
                (aid, *bands_of(bytes(c) if c is not None else b""))
                for aid, c in zip(pdf["asset_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows, columns=["asset_id", "b0", "b1", "b2", "b3"]
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        kernel, AHASH_SCHEMA
    )


#: 8-point DCT-II basis, fixed-point: round(16384 · c(u) ·
#: cos((2x+1)uπ/16)) with orthonormal c(u) — PRECOMPUTED ONCE and
#: committed as integers so the Arrow kernel and the DuckDB oracle
#: share the exact same table (no runtime float recompute anywhere;
#: the q186 lesson — transcendental functions are not bit-portable,
#: constants are).
PHASH_T = (
    (5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793),
    (8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035),
    (7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568),
    (6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811),
    (5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793),
    (4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551),
    (3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135),
    (1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598),
)


def phash_bands(assets: DataFrame) -> DataFrame:
    """Perceptual DCT-HASH (pHash) of image assets as 4×16-bit bands —
    the production-grade upgrade of :func:`ahash_bands` (the r7
    verdict's ask): same 8×8 grid sample of the content bytes, then a
    2-D integer DCT (``C = T·P·Tᵀ`` with the fixed-point
    :data:`PHASH_T` table — all int64, max |C| ≈ 1.05e12), bit k set
    when coefficient k exceeds the MEDIAN of the 63 AC coefficients
    (the 32nd-smallest — exact order statistic, no float mean).
    pHash keys on the image's coarse spectral shape, so it survives
    brightness/contrast shifts that flip aHash bits; banding and the
    downstream join discipline are identical to aHash (q62's
    pigeonhole bound: Hamming ≤ 3 near-dups always collide on ≥1 of
    4 bands).

    Everything is exact integer arithmetic, so the DuckDB oracle
    (q209) recomputes identical coefficients from the same committed
    table and the hash is bit-reproducible. Same Arrow contract as
    the other kernels: content crosses into Python once, the output
    is a 16-byte/asset table, no Exchange ever carries bytes.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        t8 = np.array(PHASH_T, dtype=np.int64)

        def bands_of(content: bytes) -> tuple[int, int, int, int]:
            n = len(content)
            if n == 0:
                return (0, 0, 0, 0)
            px = np.array(
                [content[(k * n) // 64] for k in range(64)], dtype=np.int64
            ).reshape(8, 8)
            coef = (t8 @ px @ t8.T).reshape(64)
            med = int(np.partition(coef[1:], 31)[31])  # 32nd-smallest AC
            bits = [1 if int(c) > med else 0 for c in coef]
            out = []
            for b in range(4):
                v = 0
                for bit in bits[16 * b : 16 * b + 16]:
                    v = (v << 1) | bit
                out.append(v)
            return tuple(out)

        for pdf in batches:
            rows = [
                (aid, *bands_of(bytes(c) if c is not None else b""))
                for aid, c in zip(pdf["asset_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows, columns=["asset_id", "b0", "b1", "b2", "b3"]
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        kernel, AHASH_SCHEMA
    )
