"""Structured Streaming surface.

The reference is batch-only (SURVEY §1.1: no streams; CDC is a separate
project), so this module is *additive*: the streaming expression of the
engine's aggregation semantics over the ``events`` fixture, built on
readStream → watermark → windowed agg → writeStream.
"""
