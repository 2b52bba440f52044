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
# Round-9 window (VERDICT r8 "Next round" #1 — finish retiring the
# r4-era verdict cohort; computed by tools/rotation_planner.py --diff):
# (a) the two canaries, every round;
# (b) never driver-checked: the round-9 additions (the two lossless
#     prune twins, nDCG@k, calibration ECE, the django_session mirror,
#     and the sketch reach twin — the last is oracle-less, rows-only);
# (c) no spec changes to previously-verdicted queries this round;
# (d) fill to 50 with the queries whose latest driver verdict is
#     OLDEST — ALL thirty remaining r4-era rows fit, then the r5
#     cohort in registry order. After this round no registry query's
#     latest driver verdict predates r5.
_PRIORITY: list[str] = [
    # (a) canaries
    "crowded_frames",
    "revenue_by_nation",
    # (b) never checked (r9 additions)
    "embedding_neardup_blocked",
    "dedup_containment_prefix",
    "ndcg_at_k",
    "calibration_ece",
    "conformal_threshold",
    "fairness_gaps",
    "knn_shapley",
    "session_expiry_scan",
    "spatial_two_hop_reach_approx",
    "neardup_neighborhood_function",
    # (d) oldest-verdict fill: the full r4 cohort
    "revenue_deciles",
    "event_cube",
    "event_grouping_sets",
    "small_quantity_revenue",
    "volume_shipping",
    "top_supplier",
    "high_balance_no_orders",
    "promo_revenue",
    "large_volume_orders",
    "customer_order_distribution",
    "order_priority_check",
    "min_cost_supplier",
    "important_stock",
    "late_sole_supplier",
    "forecast_revenue",
    "market_share",
    "product_profit",
    "supplier_part_counts",
    "disjunctive_revenue",
    "dominant_shippers",
    "zorder_key",
    "quality_weighted_sample",
    "knn_batch",
    "nearest_centroid",
    "embedding_neardup_exact",
    "embedding_dedup_clusters",
    "dedup_exact",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_keep_canonical",
    # (d) then the r5 cohort in registry order
    "props_variant_extract",
    "funnel_conversion",
    "retention_cohorts",
    "user_event_paths",
    "markov_transitions",
    "corpus_build_pipeline",
    "length_bucket_batches",
    "kmeans_refine",
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
