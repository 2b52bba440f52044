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
# Round-8 window (VERDICT r7 "Next round" #1 — retire the r3/r4-era
# verdict cohort; computed by tools/rotation_planner.py --diff):
# (a) the two canaries, every round;
# (b) never driver-checked: the round-8 scale-path twins;
# (c) spec changed after the r7 window froze (rotation class (c),
#     spliced by hand): benford_audit now builds a dense priority ×
#     digit spine, so its r7 verdict no longer attests current code;
# (d) fill to 50 with the queries whose latest driver verdict is
#     OLDEST — the entire r3 cohort, then r4 in registry order. The
#     seventeen r4 rows that no longer fit (late_sole_supplier,
#     forecast_revenue, market_share, product_profit,
#     customer_order_distribution, order_priority_check,
#     min_cost_supplier, important_stock, large_volume_orders,
#     promo_revenue, high_balance_no_orders, top_supplier,
#     small_quantity_revenue, volume_shipping, event_grouping_sets,
#     event_cube, revenue_deciles) head next round's fill.
_PRIORITY: list[str] = [
    # (a) canaries
    "crowded_frames",
    "revenue_by_nation",
    # (b) never checked
    "revenue_gini_grid",
    "interarrival_burstiness_sharded",
    "user_cohorts_onepass",
    "average_precision",
    "t_closeness_audit",
    "zipf_fit",
    "kcore_decomposition",
    "js_divergence_sources",
    "heaps_fit",
    "knn_label_mrr",
    "clustering_coefficient",
    "gopher_quality_rules",
    "epoch_upsample",
    "span_corruption",
    "cuped_adjustment",
    # (c) spec changed since its r7 verdict (dense Benford grid;
    #     array-intersect verify for the prefix join)
    "benford_audit",
    "dedup_jaccard_prefix",
    # (d) oldest-verdict fill: r3 cohort first
    "knn_bruteforce",
    "fall_detection_softmax",
    "label_centroids",
    "embedding_neardup_lsh",
    "ivf_knn",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "token_stats",
    "trigram_profile",
    "crowd_alerts_pipeline",
    "multimodal_meta",
    "multimodal_features",
    "video_frame_sample",
    # (d) then the r4 cohort in registry order
    "pricing_summary",
    "top_orders_per_customer",
    "argmax_event",
    "customers_without_events",
    "customers_with_errors",
    "event_trend_rollup",
    "shipping_priority",
    "returned_revenue",
    "props_extract",
    "session_window_stats",
    "asof_last_event",
    "asof_next_event",
    "value_percentiles",
    "distinct_stats",
    "value_rank_profile",
    "running_revenue",
    "moving_revenue",
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
