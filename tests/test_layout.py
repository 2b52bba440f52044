"""Storage-layout operators (operators/layout.py): footer stats must
match pyarrow ground truth, a range-clustered write must prune
measurably better than a shuffled one (the zorder_key promise made
measurable), and compaction must hit the derived file count while
preserving rows exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.layout import (
    compact_small_files,
    pruning_fraction,
    rowgroup_stats,
)


def _write_layouts(spark, tmp_path):
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 997).cast("double").alias("v")
    )
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    df.repartitionByRange(8, "v").write.parquet(clustered)
    # hash-shuffle on id leaves v uniform across every file
    df.repartition(8, "id").write.parquet(scattered)
    return clustered, scattered


def test_rowgroup_stats_match_pyarrow(spark, tmp_path):
    clustered, _ = _write_layouts(spark, tmp_path)
    got = rowgroup_stats(spark, clustered, "v").collect()
    import glob

    import pyarrow.parquet as pq

    want = {}
    for f in glob.glob(f"{clustered}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        ci = next(
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "v"
        )
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            want[(f, g)] = (
                meta.row_group(g).num_rows,
                float(st.min),
                float(st.max),
            )
    assert len(got) == len(want)
    for r in got:
        local = r["file"][len("file:") :]
        assert want[(local, r["row_group"])] == (
            r["n_rows"],
            r["cmin"],
            r["cmax"],
        )


def test_clustered_layout_prunes_better(spark, tmp_path):
    clustered, scattered = _write_layouts(spark, tmp_path)
    lo, hi = 100.0, 200.0
    pc = pruning_fraction(rowgroup_stats(spark, clustered, "v"), lo, hi)
    ps = pruning_fraction(rowgroup_stats(spark, scattered, "v"), lo, hi)
    # range clustering confines [100, 200] to ~1 of 8 files; a hash
    # layout spreads v everywhere so nothing is skippable
    assert pc["frac_rows_skipped"] > 0.7
    assert ps["frac_rows_skipped"] == 0.0
    # pruned groups can never contain matching rows: re-reading only
    # unprunable files yields the same matching row count
    full = (
        spark.read.parquet(clustered).filter(F.col("v").between(lo, hi)).count()
    )
    keep_files = [
        r["file"]
        for r in rowgroup_stats(spark, clustered, "v").collect()
        if not (r["cmax"] < lo or r["cmin"] > hi)
    ]
    pruned_read = (
        spark.read.parquet(*keep_files)
        .filter(F.col("v").between(lo, hi))
        .count()
    )
    assert pruned_read == full


def test_degenerate_inputs(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    # empty stats relation → zero fractions, no crash
    empty = spark.createDataFrame(
        [], "file string, row_group int, n_rows long, cmin double, cmax double"
    )
    assert pruning_fraction(empty, 0.0, 1.0) == {
        "groups": 0,
        "skippable": 0,
        "frac_groups_skipped": 0.0,
        "frac_rows_skipped": 0.0,
    }
    # NULL bounds (writer omitted stats) are never skippable
    nostats = spark.createDataFrame(
        [Row(file="f", row_group=0, n_rows=10, cmin=None, cmax=None)],
        "file string, row_group int, n_rows long, cmin double, cmax double",
    )
    assert pruning_fraction(nostats, 0.0, 1.0)["skippable"] == 0
    # a schema-only part file (empty write) doesn't break the audit
    d = str(tmp_path / "with_empty")
    spark.range(0).selectExpr("CAST(id AS DOUBLE) v").write.parquet(d)
    spark.range(5).selectExpr("CAST(id AS DOUBLE) v").write.mode(
        "append"
    ).parquet(d)
    stats = rowgroup_stats(spark, d, "v").collect()
    assert sum(r["n_rows"] for r in stats) == 5
    # compaction of a parquet-free dir raises a clear error
    src = str(tmp_path / "nothing")
    import os

    os.makedirs(src)
    with pytest.raises(ValueError, match="no parquet files"):
        compact_small_files(spark, src, str(tmp_path / "dst"))


def test_compaction_hits_target_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 50_000).select("id", F.rand(7).alias("x"))
    df.repartition(64).write.parquet(src)  # 64 tiny files
    total = sum(
        r["length"]
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src)
        .collect()
    )
    target = max(total // 5, 1)
    n_out = compact_small_files(spark, src, dst, target_bytes=target)
    expect = -(-total // target)
    assert n_out == expect
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_rowgroup_stats_missing_column_is_descriptive(spark, sf_dir):
    import pyspark

    with pytest.raises(pyspark.errors.PySparkException) as ei:
        rowgroup_stats(spark, sf_dir, "no_such_column").collect()
    assert "no_such_column" in str(ei.value)
    assert "footer columns" in str(ei.value)
