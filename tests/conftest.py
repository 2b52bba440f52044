from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark import (  # noqa: E402
    get_spark,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# shared by the stateful-streaming tests (state TTL, RocksDB parity,
# checkpoint restart): one replay chunk = one parquet file = one
# micro-batch, with the 4-column events shape the operators consume
def events_chunk_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def write_events_chunk(spark, src: str, name: str, rows) -> None:
    import glob as _glob
    import os as _os
    import shutil as _shutil

    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, events_chunk_schema()).coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    _os.rename(
        _glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet"
    )
    _shutil.rmtree(tmp)
