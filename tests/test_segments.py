"""Fixed-width word-segment dedup (the C4-style line-dedup analog):
segmentation shape, planted-boilerplate detection, oracle parity, and
the no-shuffle segment-pass plan property."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cassandra_analytics_spark.operators.dedup import (
    duplicate_segment_stats,
    segment_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segment_stream_shape(spark):
    d = _docs(
        spark,
        [
            (1, " ".join(f"w{i}" for i in range(25))),  # 10 + 10 + 5
            (2, "only three words"),                    # one short segment
            (3, ""),                                    # one empty segment
        ],
    )
    segs = segment_stream(d, seg_words=10).collect()
    by_id: dict[int, list[str]] = {}
    for r in segs:
        by_id.setdefault(r.id, []).append(r.seg)
    assert len(by_id[1]) == 3
    assert by_id[1][0].split() == [f"w{i}" for i in range(10)]
    assert len(by_id[1][2].split()) == 5  # trailing partial segment kept
    assert by_id[2] == ["only three words"]
    assert by_id[3] == [""]


def test_duplicate_segment_stats_flags_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(10))  # exact 10-word segment
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))  # noqa: E731
    d = _docs(
        spark,
        [
            # boilerplate segment leads docs 1 and 2 (aligned at segment 0)
            (1, f"{boiler} {uniq('x')}"),
            (2, f"{boiler} {uniq('y')}"),
            (3, uniq("z")),
        ],
    )
    stats = {r.doc_id: r for r in duplicate_segment_stats(d, seg_words=10).collect()}
    assert stats[1].n_segments == 2 and stats[1].n_dup_segments == 1
    assert stats[1].dup_segment_frac == 0.5
    assert stats[2].dup_segment_frac == 0.5
    assert stats[3].n_dup_segments == 0 and stats[3].dup_segment_frac == 0.0


def test_segment_stream_is_shuffle_free(spark, sf_dir):
    from cassandra_analytics_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        segment_stream(d).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_boilerplate_segments_matches_oracle(spark, sf_dir):
    from cassandra_analytics_spark.testing import compare_query

    res = compare_query("dedup_boilerplate_segments", spark, sf_dir)
    assert res.ok, str(res)


def test_within_doc_repetition_counts_as_duplicate(spark):
    seg = " ".join(f"r{i}" for i in range(10))
    d = _docs(spark, [(1, f"{seg} {seg}")])  # same segment twice in one doc
    row = duplicate_segment_stats(d, seg_words=10).collect()[0]
    assert row.n_segments == 2 and row.n_dup_segments == 2
    assert row.dup_segment_frac == 1.0
