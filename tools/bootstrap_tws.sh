#!/usr/bin/env bash
# One-command bootstrap for the transformWithStateInPandas (TWS) path.
#
# Spark 4's TWS python worker speaks a protobuf handshake with the JVM
# state server (pyspark.sql.streaming.stateful_processor), so the
# `protobuf` wheel must be importable on driver AND executors.
# Everything else in streaming/stateful_tws.py is pure PySpark.
#
# This container intentionally ships no protobuf and forbids package
# installs, so tests/test_streaming.py::test_tws_edge_trigger_matches_batch_lag
# SKIPS here (HAS_TWS gate); the applyInPandasWithState +
# RocksDB-backed twins in streaming/stateful.py carry the identical
# reconciled semantics and ARE exercised.
#
# On any environment that permits installs, this is the whole recipe:
set -euo pipefail
python -m pip install 'protobuf>=4.25'
python - <<'EOF'
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful_tws import HAS_TWS
assert HAS_TWS, "TWS still gated — check the pyspark version (needs >= 4.0)"
print("TWS un-gated; run: python -m pytest tests/test_streaming.py -k tws -q")
EOF
