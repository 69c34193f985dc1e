"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Maps to the reference's blob handling (SURVEY §1.3 ``blob`` → BinaryType;
large-blob pruning exercised by ``EndToEndTests.java:1978
testLargeBlobExclude``). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, ``mapInPandas`` UDF signatures — is real and tested.

Feature extraction is **codec-free but real**: no image library exists in
this container (SURVEY-sanctioned), so instead of decoding pixels we
compute genuine functions of the raw bytes —

* container format via magic-number sniffing (PNG/JPEG/GIF/BMP/WEBP),
* image dimensions parsed from the container header (PNG IHDR, GIF
  logical screen descriptor, BMP BITMAPINFOHEADER, JPEG SOFn segment
  walk, WEBP VP8X) in pure Python,
* byte-level statistics (mean byte value, Shannon entropy of the byte
  histogram) vectorized with numpy inside the Arrow batch.

Pixel-array decode (``decode_image``) has a REAL path behind an
optional dependency (round 15): with ``pillow`` importable it decodes
to an RGB array and reports pixel-level stats (skip-gated test); in
this codec-less container it raises the documented
``NotImplementedError`` — the sanctioned no-dep fallback.

Design for 100 TB: blobs ride in their own column so column pruning keeps
them out of metadata-only scans (parquet column chunks are skipped
entirely); inspection runs in ``mapInPandas`` over Arrow batches — one
Python worker round-trip per batch, not per row; ``batch_size_hint`` rows
per batch bounds worker memory for large blobs.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("w", T.IntegerType(), True),
                    T.StructField("h", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("entropy", T.DoubleType(), True),
    ]
)


def sniff_format(content: bytes) -> str | None:
    """Container format from magic numbers — no codec needed."""
    if content.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if content.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if content.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if content.startswith(b"BM"):
        return "bmp"
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        return "webp"
    return None


def parse_dimensions(content: bytes, fmt: str | None) -> tuple[int, int] | None:
    """(width, height) parsed from the container header, pure Python.

    Covers the dimension encodings of the common raster containers:
    PNG IHDR (big-endian u32 at offset 16/20), GIF logical screen
    descriptor (little-endian u16 at 6/8), BMP BITMAPINFOHEADER
    (little-endian i32 at 18/22; height may be negative = top-down),
    JPEG SOFn marker walk (big-endian u16 height/width), WEBP VP8X
    extended header (24-bit little-endian width-1/height-1).
    """
    try:
        if fmt == "png" and len(content) >= 24 and content[12:16] == b"IHDR":
            w, h = struct.unpack(">II", content[16:24])
            return int(w), int(h)
        if fmt == "gif" and len(content) >= 10:
            w, h = struct.unpack("<HH", content[6:10])
            return int(w), int(h)
        if fmt == "bmp" and len(content) >= 26:
            w, h = struct.unpack("<ii", content[18:26])
            return int(w), abs(int(h))
        if fmt == "jpeg":
            return _jpeg_dimensions(content)
        if fmt == "webp" and len(content) >= 30 and content[12:16] == b"VP8X":
            w = int.from_bytes(content[24:27], "little") + 1
            h = int.from_bytes(content[27:30], "little") + 1
            return w, h
    except struct.error:
        return None
    return None


def _jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOFn frame header.

    SOF markers are 0xFFC0–0xFFCF excluding C4 (DHT), C8 (JPG) and CC
    (DAC); the frame header carries height then width as big-endian u16
    at offsets 5 and 7 past the marker.
    """
    i, n = 2, len(content)
    while i + 9 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", content[i + 5 : i + 9])
            return int(w), int(h)
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def inspect_image_bytes(content: bytes) -> dict:
    """Codec-free byte inspection: format, header dimensions, byte stats."""
    n = len(content)
    fmt = sniff_format(content)
    dims = parse_dimensions(content, fmt)
    if n == 0:
        return {
            "format": fmt,
            "n_bytes": 0,
            "w": None,
            "h": None,
            "mean_byte": 0.0,
            "entropy": 0.0,
        }
    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    return {
        "format": fmt,
        "n_bytes": n,
        "w": dims[0] if dims else None,
        "h": dims[1] if dims else None,
        "mean_byte": float(arr.mean()),
        "entropy": float(-(p * np.log2(p)).sum()),
    }


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode one image blob to pixel statistics.

    Real path (round 15): when ``pillow`` is importable the blob is
    decoded to an RGB pixel array and the stats are PIXEL-level —
    ``{n_bytes, w, h, n_channels, mean_pixel, pixel_entropy}`` (mean
    over all channels; Shannon entropy of the 256-bin channel-value
    histogram). The dependency is OPTIONAL: this container carries no
    codec library (SURVEY-sanctioned), so without it the call raises
    the documented ``NotImplementedError`` — callers that only need
    byte-level features use ``inspect_image_bytes`` (codec-free,
    always available). ``fake=True`` returns the deterministic
    byte-stat fake regardless (the plumbing-test path — schema
    ``{n_bytes, mean_byte, entropy}``)."""
    if not fake:
        try:
            import PIL.Image
        except ImportError:
            raise NotImplementedError(
                "pixel decoding requires a codec library (PIL/opencv); "
                "byte-level features come from inspect_image_bytes "
                "instead (pip install pillow enables the real path)"
            ) from None
        import io

        import numpy as np

        with PIL.Image.open(io.BytesIO(content)) as img:
            rgb = img.convert("RGB")
            w, h = rgb.size
            px = np.asarray(rgb, dtype=np.uint8)
        counts = np.bincount(px.reshape(-1), minlength=256)
        tot = counts.sum()
        p = counts[counts > 0] / tot
        return {
            "n_bytes": len(content),
            "w": int(w),
            "h": int(h),
            "n_channels": int(px.shape[2]) if px.ndim == 3 else 1,
            "mean_pixel": float(px.mean()),
            "pixel_entropy": float(-(p * np.log2(p)).sum()),
        }
    n = len(content)
    if n == 0:
        return {"n_bytes": 0, "mean_byte": 0.0, "entropy": 0.0}
    counts: dict[int, int] = {}
    for b in content:
        counts[b] = counts.get(b, 0) + 1
    mean = sum(content) / n
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values()) + 0.0
    return {"n_bytes": n, "mean_byte": mean, "entropy": entropy}


def extract_image_features(
    df: DataFrame,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    One pandas DataFrame per Arrow batch in, one out — the canonical shape
    for any decode / feature-extract / resize stage. Features are real
    functions of the bytes (``inspect_image_bytes``); the blob column is
    pruned from the output so downstream stages never reshuffle gigabytes
    of pixels.

    ``batch_size_hint`` sets ``spark.sql.execution.arrow.maxRecordsPerBatch``
    — a SESSION-WIDE conf Spark reads at EXECUTION time, not a per-plan
    property: it affects every Arrow exchange in the session and the last
    value set before an action wins, even for plans built earlier. It is
    therefore opt-in (default: leave the session conf untouched); bound
    it explicitly when blobs are large enough that the session default
    (10k rows/batch) would blow worker memory."""
    missing = [c for c in ("id", "content") if c not in df.columns]
    if missing:
        # fail at plan time with the column names — a missing column used
        # to surface as a KeyError inside a retried Python worker task
        # (round-8 probe pass)
        raise ValueError(
            f"extract_image_features: input is missing column(s) {missing}; "
            f"have {df.columns}"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                inspect_image_bytes(bytes(c) if c is not None else b"")
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "format": [f["format"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "w": pd.array([f["w"] for f in feats], dtype="Int32"),
                    "h": pd.array([f["h"] for f in feats], dtype="Int32"),
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "entropy": [f["entropy"] for f in feats],
                }
            )

    if batch_size_hint is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint)
        )
    return df.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 1024,
    every_nth: int = 10,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """"Video" frame sampling plumbing: treat the blob as fixed-size frames,
    keep every n-th — a pure expression tree (no Python): sequence over
    frame offsets + transform(substring). Real codecs slot into the same
    shape via mapInPandas."""
    # validate eagerly: frame_bytes=0 used to throw ANSI DIVIDE_BY_ZERO
    # and every_nth=0 an invalid-sequence-step error, both DEEP inside a
    # running job with no hint which argument was wrong (round-8 probes)
    if int(frame_bytes) < 1:
        raise ValueError(f"frame_sample: frame_bytes must be >= 1, got {frame_bytes}")
    if int(every_nth) < 1:
        raise ValueError(f"frame_sample: every_nth must be >= 1, got {every_nth}")
    c = F.col(content_col)
    n_frames = F.floor(F.octet_length(c) / F.lit(frame_bytes)).cast("int")
    # a blob smaller than one frame has NO frames: sequence(0, -1) is
    # invalid, so it's clamped to 0 and the resulting phantom offset is
    # filtered out below (an unfiltered greatest(..., 0) emitted a
    # truncated partial 'frame' while total_frames said 0)
    offsets = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth))
    frames = F.transform(
        offsets,
        lambda i: F.substring(c, i * frame_bytes + 1, frame_bytes),
    )
    return (
        df.select(
            F.col(id_col),
            n_frames.alias("total_frames"),
            F.posexplode(frames).alias("sample_idx", "frame"),
        )
        .filter(F.col("total_frames") > 0)
        .withColumn("frame_offset", F.col("sample_idx") * every_nth)
    )


def multimodal_stats(df: DataFrame) -> DataFrame:
    """Metadata-only scan: blob sizes per mime type WITHOUT reading pixel
    data into Python — column pruning keeps the plan JVM-side (the
    testLargeBlobExclude posture)."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("content")).alias("total_bytes"),
        F.avg(F.octet_length("content")).alias("avg_bytes"),
        F.avg("meta.w").alias("avg_width"),
        F.avg("meta.h").alias("avg_height"),
    )
