"""PySpark-native analytics engine with the query and data-processing
capabilities of gauravbangar/Real-Time-AI-Enhanced-Crowd-Surveillance-
with--Big-Data-Analytics (reference at /root/reference, read-only).

Architecture (SURVEY.md §7): typed schemas + parquet sources, a library
of DataFrame→DataFrame operators (batch/stream agnostic), composed
pipelines, and a streaming runner. Everything relational is expressed
declaratively (DataFrame/SQL) so Catalyst handles pushdown, pruning,
join selection, and AQE; per-pixel / model work lives in Arrow-batched
pandas UDFs; no RDDs.

Import as::

    import real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark as csa
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
