"""RocksDB state-store parity for the late-r7 stateful monitors
(CUSUM drift, sequential A/B, ordered funnel): the same chunked replay
must produce identical output under the default (HDFS-backed) and
RocksDB providers — array-free but mixed-type state rows either
round-trip the provider encoding exactly or fail here, not in
production."""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.ab_monitor import (
    streaming_ab_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.cusum_monitor import (
    streaming_cusum_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.funnel_monitor import (
    streaming_funnel_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.loiter_alert import (
    streaming_loiter_alerts,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.od_tracker import (
    streaming_od_tracker,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_OPS = {
    "cusum": (
        streaming_cusum_monitor,
        lambda r: (r.event_type, r.hour_start_ms, r.cnt, r.s_pos, r.s_neg,
                   r.alarm_up, r.alarm_down),
    ),
    "ab": (
        streaming_ab_monitor,
        lambda r: (r.event_type, r.rows_seen, r.n_c, r.n_t, r.effect_e6,
                   r.significant),
    ),
    "funnel": (
        streaming_funnel_monitor,
        lambda r: (r.user_id, r.stage_ord, r.stage, r.ts_us),
    ),
    "loiter": (
        streaming_loiter_alerts,
        lambda r: (r.user_id, r.zone_x, r.zone_y, r.run_start_us,
                   r.alarm_ts_us),
    ),
    "od": (
        streaming_od_tracker,
        lambda r: (r.user_id, r.from_x, r.from_y, r.to_x, r.to_y, r.ts_us),
    ),
}


@pytest.mark.parametrize("name", sorted(_OPS))
def test_monitor_output_identical_under_rocksdb(spark, sf_dir, name):
    op, key = _OPS[name]

    def run(sink: str) -> set:
        q = run_to_memory(op(stream_events(spark, sf_dir)), sink)
        try:
            return {key(r) for r in spark.table(sink).collect()}
        finally:
            q.stop()

    default = run(f"{name}_default_out")
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        rocks = run(f"{name}_rocksdb_out")
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    assert rocks == default
    assert default, f"{name}: empty output proves nothing"
