"""Text-analysis plans (filled in task #5)."""

TEXT_QUERIES: dict = {}
