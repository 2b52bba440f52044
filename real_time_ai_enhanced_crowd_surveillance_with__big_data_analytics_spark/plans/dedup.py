"""Deduplication plans (filled in task #4)."""

DEDUP_QUERIES: dict = {}
