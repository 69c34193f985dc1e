"""Multimodal column plumbing: binary + metadata, mapInPandas features,
frame sampling, metadata-only scans."""

from __future__ import annotations

import math

import pytest

from cassandra_analytics_spark.operators.multimodal import (
    MULTIMODAL_SCHEMA,
    decode_image,
    extract_image_features,
    frame_sample,
    multimodal_stats,
)


@pytest.fixture(scope="module")
def mm_df(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for i in range(200):
        blob = bytes(rng.integers(0, 256, size=500 + i).astype("uint8"))
        rows.append(
            (i, blob, f"caption {i}", (64 + i % 8, 48 + i % 8, "image/png"))
        )
    return spark.createDataFrame(rows, MULTIMODAL_SCHEMA)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")
    stats = decode_image(bytes(range(256)), fake=True)
    assert stats["n_bytes"] == 256
    assert stats["mean_byte"] == 127.5
    assert math.isclose(stats["entropy"], 8.0)


def test_extract_image_features(mm_df):
    out = extract_image_features(mm_df).collect()
    assert len(out) == 200
    by_id = {r.id: r for r in out}
    assert by_id[0].n_bytes == 500
    assert by_id[199].n_bytes == 699
    assert all(0 <= r.mean_byte <= 255 for r in out)
    assert all(0 <= r.entropy <= 8.0 for r in out)
    assert by_id[0].w == 64 and by_id[0].h == 48


def test_frame_sample(mm_df):
    frames = frame_sample(mm_df, frame_bytes=100, every_nth=2)
    rows = frames.filter("id = 0").collect()  # 500 bytes → 5 frames → idx 0,2,4
    offsets = sorted(r.frame_offset for r in rows)
    assert offsets == [0, 2, 4]
    assert all(len(r.frame) == 100 for r in rows)


def test_multimodal_stats_metadata_only(mm_df):
    stats = multimodal_stats(mm_df).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.mime == "image/png"
    assert s.n_items == 200
    assert s.total_bytes == sum(500 + i for i in range(200))
