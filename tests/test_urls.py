"""URL canonicalization rules (functions/urls.py) + the frontier-dedup
plan (plans/crawl.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.urls import (
    canonical_url,
    url_host,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.crawl import (
    url_canonicalize,
)

CASES = [
    ("HTTP://WWW.Ex.COM:80/a//b/?b=2&a=1#frag", "http://www.ex.com/a/b?a=1&b=2"),
    ("https://ex.com:443/", "https://ex.com/"),
    ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default port kept
    ("http://ex.com", "http://ex.com/"),
    ("http://ex.com///", "http://ex.com/"),
    ("http://ex.com/a/?z=1", "http://ex.com/a?z=1"),
    ("http://ex.com/a?single=1", "http://ex.com/a?single=1"),
    ("HtTpS://A.B.C/Path", "https://a.b.c/Path"),  # path case preserved
]


def test_canonical_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["u"])
    got = [
        r.c
        for r in df.select(canonical_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_host_strips_port(spark):
    df = spark.createDataFrame(
        [("https://Ex.COM:8443/x",), ("http://a.b:80/",)], ["u"]
    )
    assert [r.h for r in df.select(url_host(F.col("u")).alias("h")).collect()] == [
        "ex.com",
        "a.b",
    ]


def test_frontier_collapse(spark, sf_dir):
    rows = url_canonicalize(spark, sf_dir).collect()
    assert rows
    # every synthetic doc family of 2 collapses to one canonical URL
    assert all(r.n_dups == 2 for r in rows)
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical_url, []).append(r.doc_id)
    for canon, ids in by_canon.items():
        assert len(ids) == 2 and ids[0] // 2 == ids[1] // 2, (canon, ids)
        assert "#" not in canon and "//" not in canon.split("://", 1)[1]


def test_robots_gate_semantics(spark, sf_dir):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.crawl import (
        robots_gate,
    )

    rows = robots_gate(spark, sf_dir).collect()
    assert rows
    import re

    seen_default = seen_block = seen_override = seen_disallow = False
    for r in rows:
        k = int(re.match(r"www\.s(\d+)\.example\.com", r.host).group(1))
        if r.path.startswith("/p/1"):
            # the allow override has the longest matching prefix on
            # every host, including block-all ones
            assert r.allowed and r.matched_rule == "/p/1", r
            seen_override = True
        elif k % 3 == 0:
            assert not r.allowed and r.matched_rule == "/p", r
            seen_disallow = True
        elif k % 7 == 0:
            assert not r.allowed and r.matched_rule == "/", r
            seen_block = True
        else:
            assert r.allowed and r.matched_rule == "", r
            seen_default = True
    assert seen_default and seen_block and seen_override and seen_disallow
