"""Similarity-search plans (filled in task #3)."""

SIMILARITY_QUERIES: dict = {}
