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
from .pq import PQ_QUERIES_REG
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
    PQ_QUERIES_REG,
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
# Round-6 window (VERDICT r5 "Next round" #3 — the cleanup rotation):
# (a) the two r5 driver reds, now fixed (inverted_index array→string
#     serialization; embedding_covariance integer-exact co-moments);
# (b) dedup_containment_capped — the only never-driver-checked query;
# (c) the five queries whose spec/plan changed AFTER the r5 window
#     froze (cap_per_source / source_quota_sample / token_budget_sample
#     — decorrelated selection hash; shard_assignment /
#     source_mixture_report — TakeOrderedAndProject reshape);
# (d) stratified_sample / approx_aggregates — perpetual `no_oracle`
#     reds, this round given full oracles (portable affine-hash
#     sampler; exact columns + sketch-bounds flags);
# (e) the flagship + returning canaries;
# (f) fill to 50 with the queries whose latest driver verdict is
#     oldest (r2/r3-era battery), computed mechanically from
#     CORRECTNESS_r01..r05 key unions. After this round every registry
#     query's latest verdict is ≤3 rounds old.
_PRIORITY: list[str] = [
    # (e) canaries
    "crowded_frames",
    "revenue_by_nation",
    # (a) fixed r5 reds
    "inverted_index",
    "embedding_covariance",
    # (b) never checked (dedup_containment_capped from r5;
    # pii_redact / sketch_rollup added earlier in r6 — a never-checked
    # query outranks a 3-round-old green battery re-verdict, so these
    # displace token_stats / trigram_profile from (f), both r2-green)
    "dedup_containment_capped",
    "pii_redact",
    "sketch_rollup",
    # (c) spec/plan changed after the r5 freeze
    "cap_per_source",
    "source_quota_sample",
    "token_budget_sample",
    "shard_assignment",
    "source_mixture_report",
    # (d) newly oracle-backed
    "stratified_sample",
    "approx_aggregates",
    # (b') never-checked queries added later in r6 — same rule as (b):
    # a first verdict outranks a 3-round-old battery re-verdict, so
    # these displace the seven NEWEST-verdict fill entries
    # (alarm_rising_edges / conditional_counts / sessionize /
    # clicks_near_purchases / event_pivot / event_unpivot /
    # shipmode_priority, all r3-green — everything else in (f) is
    # r2-or-older)
    "weak_label_vote",
    "state_merge_rollup",
    "label_propagation",
    "doc_novelty",
    "fk_integrity_audit",
    "k_anonymity_audit",
    "k_anonymity_generalize",
    # (f) oldest-verdict battery (r2/r3-era)
    # never-checked (added late r6) — displaces value_outliers
    # (r2-green): a first verdict outranks any re-verdict
    "dp_noisy_counts",
    # never-checked (added late r6) — displaces sequence_packing
    # (r3-green), same first-verdict-outranks-re-verdict rule
    "dedup_jaccard_prefix",
    # never-checked (added late r6) — displaces embedding_quantization
    # (r2-green), same rule
    "release_readiness",
    # never-checked (added late r6, second wave) — displace the three
    # NEWEST-verdict fills remaining (knn_bruteforce /
    # fall_detection_softmax / label_centroids, all r3-green; computed
    # mechanically from CORRECTNESS_r01..r05 — everything else left in
    # (f) is r2-or-older, and (a)-(e) entries are not displaceable)
    "cdc_upsert_compaction",
    "pq_encode",
    "pq_adc_knn",
    # never-checked — displaces embedding_neardup_lsh (r3-green, the
    # newest remaining fill; and it is transitively exercised anyway:
    # neardup_pagerank / neardup_lsh_recall / label_propagation in
    # this window all build on its pair set)
    "seasonal_anomalies",
    # never-checked — displaces ivf_knn (r3-green, now the newest
    # remaining fill; its IVF machinery is also probe-tested and
    # partition-filter-asserted in T)
    "pq_incremental_encode",
    # never-checked — displaces dedup_ngram_jaccard (r3-green; its
    # capped twin, same candidate machinery, stays in the window)
    "pq_recall",
    # never-checked — displaces dedup_ngram_jaccard_capped (r3-green;
    # the shared df-capped candidate machinery keeps its coverage via
    # dedup_containment_capped, still in the window)
    "lexicon_sentiment",
    # never-checked — displaces dedup_minhash_lsh (r3-green; the MinHash
    # band machinery stays driver-covered via dedup_incremental_lsh's
    # r5 verdict and this window's chunk-level dedup entries)
    "cdc_deletions_audit",
    "dedup_simhash",
    "contamination_check",
    "doc_repetition",
    "policy_pattern_scan",
    "quality_funnel",
    "bpe_token_stats",
    "tfidf_top_terms",
    "doc_quality",
    "lang_id",
    "doc_fingerprint",
    "lm_cross_entropy",
    "fire_alerts",
    "user_cohorts_setops",
    "detection_parse",
    "validate_registrations",
    "nms_detections",
    # never-checked (added late r6) — displace multimodal_meta and
    # crowd_alerts_pipeline: the fill battery is uniformly r3-green,
    # so the registry-order tiebreak drops the last fill entries for
    # the first verdicts
    "neardup_pagerank",
    "neardup_lsh_recall",
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
