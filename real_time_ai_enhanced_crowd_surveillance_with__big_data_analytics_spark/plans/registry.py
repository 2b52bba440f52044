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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in _MODULES:
    for _name, _pair in _mod.items():
        _fn, _sql = _pair
        assert _name not in QUERIES, f"duplicate query name {_name}"
        QUERIES[_name] = _fn
        if _sql is not None:
            ORACLES[_name] = _sql
