"""Registry merging every plan module into the driver contract shape.

``QUERIES[name] -> Callable[(SparkSession, sf_dir), DataFrame]``
``ORACLES[name] -> ANSI SQL str`` (absent for non-SQL-expressible ops —
driver then records a rows-only check; SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .codec_parity import CODEC_PARITY_QUERIES
from .crawl import CRAWL_QUERIES
from .data_selection import DATA_SELECTION_QUERIES
from .dedup import DEDUP_QUERIES
from .indexing import INDEXING_QUERIES
from .ml_eval import ML_EVAL_QUERIES
from .multimodal import MULTIMODAL_QUERIES
from .pipeline_quality import PIPELINE_QUALITY_QUERIES
from .pq import PQ_QUERIES_REG
from .relational import RELATIONAL_QUERIES
from .similarity import SIMILARITY_QUERIES
from .spatial import SPATIAL_QUERIES
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
    ML_EVAL_QUERIES,
    TEXT_QUERIES,
    SURVEILLANCE_QUERIES,
    MULTIMODAL_QUERIES,
    CODEC_PARITY_QUERIES,
    DATA_SELECTION_QUERIES,
    CRAWL_QUERIES,
    SPATIAL_QUERIES,
]

# The driver's correctness harness records only the FIRST 50 registry
# entries per round. Order therefore decides verification visibility.
# Round-7 window (VERDICT r6 "Next round" #1 — the freshness rotation,
# computed by tools/rotation_planner.py --diff, re-run after every
# late-r7 addition so all never-driver-checked queries ship with a
# verdict):
# (a) the two canaries, every round;
# (b) the 36 queries added across round 7's sessions (never
#     driver-checked) — new capability outranks re-attestation in the
#     planner's policy;
# (c) fill to 50 with the queries whose latest driver verdict is
#     OLDEST: value_outliers (r2) and the oldest r3 rows. The r3/r4
#     rows the late additions displaced (label_centroids,
#     token_stats, trigram_profile, the dedup battery, multimodal
#     pair, crowd_alerts_pipeline, pricing battery) are next round's
#     first fills — all green in this round's full-registry local
#     oracle run.
_PRIORITY: list[str] = [
    # (a) canaries
    "crowded_frames",
    "revenue_by_nation",
    # (b) never checked
    "auc_evaluation",
    "ks_score_separation",
    "tree_split_finder",
    "target_encode_oof",
    "ewma_forecast",
    "cusum_changepoints",
    "benford_audit",
    "kn_bigram_lm",
    "ab_test_report",
    "theil_sen_trend",
    "frequent_paths",
    "xml_pages_extract",
    "bom_subtree_rollup",
    "grid_exact_percentiles",
    "revenue_gini",
    "crawl_budget_allocation",
    "rfm_segments",
    "hour_value_gamma",
    "cohort_ltv_triangle",
    "interarrival_burstiness",
    "od_flow_matrix",
    "loiter_episodes",
    "independence_audit",
    "matryoshka_recall",
    "winnowing_fingerprints",
    "html_extract_quality",
    "image_dhash_neardup",
    "audio_pcm_features",
    "dsir_select",
    "c4_line_filter",
    "url_canonicalize",
    "robots_gate",
    "spatial_neighbor_pairs",
    "spatial_nearest_site",
    "crowd_density_hotspots",
    "spatial_triangle_census",
    "colocation_encounters",
    "spatial_two_hop_reach",
    # (c) oldest-verdict fill: r2, then the r3 battery
    "value_outliers",
    "alarm_rising_edges",
    "conditional_counts",
    "sessionize",
    "clicks_near_purchases",
    "event_pivot",
    "event_unpivot",
    "shipmode_priority",
    "sequence_packing",
    "embedding_quantization",
    # (c) ends here: the remaining r3/r4 battery was displaced by the
    # 36 never-checked round-7 additions and heads next round's fill
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
