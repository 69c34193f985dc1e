"""Scalar/column function helpers: token hashing, vector math."""
