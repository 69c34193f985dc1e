"""Sink layer: bulk writer with the reference's write semantics."""
