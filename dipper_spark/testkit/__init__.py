"""Deterministic fixture generation + single-threaded reference replay.

Everything here is seeded and hash-of-index derived (FIXTURES.md):
no unseeded randomness, so any scale factor reproduces bit-for-bit.
"""
