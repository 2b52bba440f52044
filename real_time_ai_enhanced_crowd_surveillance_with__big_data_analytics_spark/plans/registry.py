"""Registry merging every plan module into the driver contract shape.

``QUERIES[name] -> Callable[(SparkSession, sf_dir), DataFrame]``
``ORACLES[name] -> ANSI SQL str`` (absent for non-SQL-expressible ops —
driver then records a rows-only check; SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .dedup import DEDUP_QUERIES
from .indexing import INDEXING_QUERIES
from .multimodal import MULTIMODAL_QUERIES
from .pipeline_quality import PIPELINE_QUALITY_QUERIES
from .relational import RELATIONAL_QUERIES
from .similarity import SIMILARITY_QUERIES
from .stats import STATS_QUERIES
from .surveillance import SURVEILLANCE_QUERIES
from .text import TEXT_QUERIES
from .tpch_advanced import TPCH_ADVANCED_QUERIES
from .tpch_extra import TPCH_EXTRA_QUERIES
from .timeseries import TIMESERIES_QUERIES
from .tpch_final import TPCH_FINAL_QUERIES
from .training_data import TRAINING_DATA_QUERIES

_MODULES: list[dict[str, tuple[Callable, str | None]]] = [
    RELATIONAL_QUERIES,
    TPCH_ADVANCED_QUERIES,
    TPCH_EXTRA_QUERIES,
    TPCH_FINAL_QUERIES,
    TRAINING_DATA_QUERIES,
    SIMILARITY_QUERIES,
    DEDUP_QUERIES,
    INDEXING_QUERIES,
    PIPELINE_QUALITY_QUERIES,
    TIMESERIES_QUERIES,
    STATS_QUERIES,
    TEXT_QUERIES,
    SURVEILLANCE_QUERIES,
    MULTIMODAL_QUERIES,
]

# The driver's correctness harness records only the FIRST 50 registry
# entries per round. Order therefore decides verification visibility.
# Round-5 window (VERDICT r4 top-next #1 — PURE VERIFICATION round):
# every one of the 48 queries that has never had a driver verdict in
# rounds 1-4 (computed mechanically: registry names minus the union of
# CORRECTNESS_r01..r04 keys), plus the flagship canary and one
# long-green returning canary — 48 + 1 + 1 = 50 exactly. After this
# round every registry query has a driver verdict. Three of the 48
# (bigram_lift, key_skew_report, vocab_coverage) had their plans fixed
# this round (single-partition rank window → TakeOrderedAndProject
# partial top-k; oracle hashes verified unchanged locally before
# rotation). One query was added this round (dedup_containment_capped,
# the df-capped scale path ADVICE r4 asked for) — it sits at position
# 51+ and is the ENTIRE r6 never-checked queue, together with any
# plan-changed queries from this round (dataset_split /
# split_leakage_check changed spec — new split hash — and are in this
# window; corpus_build_pipeline changed spec — decorrelated selection
# hash — and is in this window; shard_assignment /
# source_mixture_report changed plan shape but not values, and
# cap_per_source / source_quota_sample / token_budget_sample changed
# spec to the decorrelated selection hash AFTER the window was frozen
# — all five should rotate into the r6 window).
_PRIORITY: list[str] = [
    # flagship canary (also smoke-checked every round via entry())
    "crowded_frames",
    # returning canary (green r1 + r4; cheapest broadcast-join probe)
    "revenue_by_nation",
    # -- the 48 never-driver-checked queries ---------------------------
    # round-3/4 relational + events additions
    "props_variant_extract", "funnel_conversion", "retention_cohorts",
    "user_event_paths", "markov_transitions",
    # text / corpus analysis family
    "corpus_build_pipeline", "length_bucket_batches", "text_normalize",
    "ccnet_ppl_buckets", "vocab_coverage", "bigram_lift",
    "cooccurrence_lift",
    # similarity / clustering family
    "kmeans_refine", "semantic_keep_canonical", "fuzzy_name_pairs",
    "embedding_covariance",
    # dedup family
    "duplicate_span_fraction", "neardup_triangles", "dedup_containment",
    "dedup_incremental_lsh", "dedup_cluster_sizes", "chunk_dedup",
    # indexing / retrieval family
    "bm25_topk", "hybrid_rrf", "hard_negatives", "search_snippets",
    "split_leakage_check", "doc_chunking", "inverted_index",
    "bpe_merge_step", "dataset_split",
    # pipeline-quality / stats family
    "column_profile", "expectation_report", "key_skew_report",
    "value_drift_psi", "source_overlap_matrix", "value_histogram",
    "winsorized_stats", "quantile_normalize", "robust_outliers",
    # timeseries family
    "scd2_tier_join", "hourly_autocorr", "seasonal_profile",
    "gap_fill_hourly", "rolling_active_users", "time_weighted_avg",
    # surveillance streaming-analog family
    "alarm_episodes", "alarm_concurrency_daily",
]

_ALL: dict[str, tuple[Callable, str | None]] = {}
for _mod in _MODULES:
    for _name, _pair in _mod.items():
        assert _name not in _ALL, f"duplicate query name {_name}"
        _ALL[_name] = _pair

assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate in _PRIORITY"
# the driver verifies exactly the first 50 — a 51st priority entry
# would silently push the 50th out of the verification window
assert len(_PRIORITY) == 50, f"priority window must be 50, is {len(_PRIORITY)}"
for _name in _PRIORITY:
    assert _name in _ALL, f"unknown priority query {_name}"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_pset = set(_PRIORITY)
for _name in [*_PRIORITY, *[n for n in _ALL if n not in _pset]]:
    _fn, _sql = _ALL[_name]
    QUERIES[_name] = _fn
    if _sql is not None:
        ORACLES[_name] = _sql
