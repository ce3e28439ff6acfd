"""Deduplication query inventory (filled by operators/dedup)."""

QUERIES: list = []
