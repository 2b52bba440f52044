"""Surveillance-pipeline plans — NMS, validators, fall detection
(filled in tasks #2/#6)."""

SURVEILLANCE_QUERIES: dict = {}
