"""CSV/JSONL source seams: schema enforcement, dead-letter capture,
round-trip fidelity against a parquet-derived frame."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.text_formats import (
    bad_rows,
    good_rows,
    read_csv,
    read_jsonl,
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)


def test_csv_roundtrip_and_dead_letter(spark, sf_dir):
    nation = load_table(spark, "nation", sf_dir)
    want = sorted(map(tuple, nation.collect()))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nation_csv")
        nation.coalesce(1).write.option("header", True).csv(path)
        # drop a malformed extra file into the directory (appending to a
        # Spark-written part file trips its .crc checksum sidecar)
        with open(os.path.join(path, "part-99999-extra.csv"), "w") as fh:
            fh.write("n_nationkey,n_name,n_regionkey\n")
            fh.write("not_an_int,BROKEN,also_not_int\n")
        df = read_csv(spark, path, NATION_SCHEMA)
        assert sorted(map(tuple, good_rows(df).collect())) == want
        bad = bad_rows(df).collect()
        assert len(bad) == 1 and "BROKEN" in bad[0]["_corrupt_record"]


def test_jsonl_roundtrip_and_dead_letter(spark, sf_dir):
    nation = load_table(spark, "nation", sf_dir)
    want = sorted(map(tuple, nation.collect()))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nation_json")
        nation.coalesce(1).write.json(path)
        with open(os.path.join(path, "part-99999-extra.json"), "w") as fh:
            fh.write('{"n_nationkey": "oops BROKEN json",\n')
        df = read_jsonl(spark, path, NATION_SCHEMA)
        assert sorted(map(tuple, good_rows(df).collect())) == want
        bad = bad_rows(df).collect()
        assert len(bad) == 1 and "BROKEN" in bad[0]["_corrupt_record"]
