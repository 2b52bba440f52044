"""Registry merging every plan module into the driver contract shape.

``QUERIES[name] -> Callable[(SparkSession, sf_dir), DataFrame]``
``ORACLES[name] -> ANSI SQL str`` (absent for non-SQL-expressible ops —
driver then records a rows-only check; SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .dedup import DEDUP_QUERIES
from .multimodal import MULTIMODAL_QUERIES
from .pipeline_quality import PIPELINE_QUALITY_QUERIES
from .relational import RELATIONAL_QUERIES
from .similarity import SIMILARITY_QUERIES
from .surveillance import SURVEILLANCE_QUERIES
from .text import TEXT_QUERIES
from .tpch_advanced import TPCH_ADVANCED_QUERIES
from .tpch_extra import TPCH_EXTRA_QUERIES
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
    PIPELINE_QUALITY_QUERIES,
    TEXT_QUERIES,
    SURVEILLANCE_QUERIES,
    MULTIMODAL_QUERIES,
]

# The driver's correctness harness records only the FIRST 50 registry
# entries per round. Order therefore decides verification visibility:
# the head of the dict is every query that has never had a driver
# verdict (the dedup/similarity/text/surveillance/multimodal/
# training-data families) plus the queries that failed in r1/r2, with
# two flagships as canaries. The long-green TPC-H battery (green in
# CORRECTNESS_r01 and r02) rotates past the cap; across rounds every
# query gets a driver verdict.
_PRIORITY: list[str] = [
    # flagship canaries (crowded_frames is additionally smoke-checked
    # every round via entry(); revenue_by_nation rotates to r4 to make
    # room for the round-3 additions)
    "crowded_frames",
    # red in r2 (HUGEINT oracle types / TIMESTAMP_NTZ) — re-verify first
    "sessionize", "clicks_near_purchases", "alarm_rising_edges",
    "conditional_counts", "event_pivot", "event_unpivot",
    "shipmode_priority", "sequence_packing", "source_mixture_report",
    # never driver-checked: training-data build
    "source_quota_sample", "shard_assignment", "embedding_quantization",
    "token_budget_sample",
    # never driver-checked: round-3 additions (lm filter, quality
    # resampling, frame sampling)
    "lm_cross_entropy", "quality_weighted_sample", "video_frame_sample",
    # never driver-checked: similarity / ANN (nearest_centroid and
    # knn_batch rotate to r4 — knn_bruteforce + label_centroids cover
    # the family this round)
    "knn_bruteforce", "fall_detection_softmax",
    "label_centroids", "embedding_neardup_exact",
    "embedding_neardup_lsh", "embedding_dedup_clusters", "ivf_knn",
    # never driver-checked: dedup
    "dedup_exact", "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_keep_canonical",
    # never driver-checked: pipeline hygiene
    "contamination_check", "doc_repetition", "policy_pattern_scan",
    "quality_funnel",
    # never driver-checked: text analysis
    "bpe_token_stats", "tfidf_top_terms", "token_stats", "doc_quality",
    "lang_id", "doc_fingerprint", "trigram_profile",
    # never driver-checked: surveillance (incl. NMS, the custom operator)
    "fire_alerts", "user_cohorts_setops", "detection_parse",
    "validate_registrations", "nms_detections", "crowd_alerts_pipeline",
    # never driver-checked: multimodal
    "multimodal_meta", "multimodal_features",
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
