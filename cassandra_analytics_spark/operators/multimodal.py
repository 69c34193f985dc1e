"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Maps to the reference's blob handling (SURVEY §1.3 ``blob`` → BinaryType;
large-blob pruning exercised by ``EndToEndTests.java:1978
testLargeBlobExclude``). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, ``mapInPandas`` UDF signatures — is real and tested;
the actual image/audio decode is STUBBED because codec libraries are not
available in this container:

* with a decoder lib present, ``decode_image`` would hand bytes to it;
* here it raises ``NotImplementedError`` unless ``fake=True``, in which
  case a **deterministic fake decode** (byte-statistics standing in for
  pixel statistics) exercises the full pipeline.

Design for 100 TB: blobs ride in their own column so column pruning keeps
them out of metadata-only scans (parquet column chunks are skipped
entirely); decode runs in ``mapInPandas`` over Arrow batches — one Python
worker round-trip per batch, not per row; ``batch_size_hint`` rows per
batch bounds worker memory for large blobs.
"""

from __future__ import annotations

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
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("entropy", T.DoubleType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode one image blob. STUB: real decode needs an image codec
    (PIL/opencv), not present in this container."""
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil and not fake:  # pragma: no cover - no PIL in container
        raise NotImplementedError("real decode path not wired yet")
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL/opencv); "
            "pass fake=True for the deterministic byte-stats fake"
        )
    import math

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
    batch_size_hint: int = 256,
    fake_decode: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    One pandas DataFrame per Arrow batch in, one out — the canonical shape
    for any decode / feature-extract / resize stage. The blob column is
    pruned from the output so downstream stages never reshuffle gigabytes
    of pixels."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(bytes(c) if c is not None else b"", fake=fake_decode)
                for c in pdf["content"]
            ]
            out = pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "entropy": [f["entropy"] for f in feats],
                    "w": [m["w"] if m is not None else None for m in pdf["meta"]],
                    "h": [m["h"] if m is not None else None for m in pdf["meta"]],
                }
            )
            yield out

    spark = df.sparkSession
    with_conf = df
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint)
    )
    return with_conf.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


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
    c = F.col(content_col)
    n_frames = F.floor(F.octet_length(c) / F.lit(frame_bytes)).cast("int")
    offsets = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth))
    frames = F.transform(
        offsets,
        lambda i: F.substring(c, i * frame_bytes + 1, frame_bytes),
    )
    return df.select(
        F.col(id_col),
        n_frames.alias("total_frames"),
        F.posexplode(frames).alias("sample_idx", "frame"),
    ).withColumn("frame_offset", F.col("sample_idx") * every_nth)


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
