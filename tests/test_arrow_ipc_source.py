"""Arrow IPC source/sink (sources/arrow_ipc.py): schema inference,
partition-per-batch parallel reads, pyarrow/feather interop, column
pruning, write round-trip, and the rename-as-publish contract."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.feather as feather
import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.arrow_ipc import (
    register_arrow_ipc_source,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_arrow_ipc_source(spark)
    return spark


def _table(n0: int, n: int) -> pa.Table:
    return pa.table(
        {
            "id": pa.array(range(n0, n0 + n), pa.int64()),
            "score": pa.array([i / 7 for i in range(n0, n0 + n)], pa.float64()),
            "tag": pa.array([f"t{i % 5}" for i in range(n0, n0 + n)], pa.string()),
            "vec": pa.array(
                [[float(i), float(i + 1)] for i in range(n0, n0 + n)],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_read_multibatch_file_partitions_per_batch(registered, tmp_path):
    path = str(tmp_path / "multi.arrow")
    t = _table(0, 100)
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as w:
            for lo in range(0, 100, 25):  # 4 record batches
                w.write_table(t.slice(lo, 25))
    df = registered.read.format("arrowipc").load(path)
    assert df.rdd.getNumPartitions() == 4  # one task per IPC batch
    assert df.count() == 100
    got = {r["id"]: r for r in df.collect()}
    assert got[42]["tag"] == "t2"
    assert got[42]["vec"] == [42.0, 43.0]


def test_feather_interop_and_directory_scan(registered, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    feather.write_feather(
        _table(0, 30), str(d / "a.feather"), compression="uncompressed"
    )
    feather.write_feather(
        _table(30, 20), str(d / "b.feather"), compression="uncompressed"
    )
    df = registered.read.format("arrowipc").load(str(d))
    assert df.count() == 50
    assert set(df.schema.fieldNames()) == {"id", "score", "tag", "vec"}


def test_projection_over_the_scan(registered, tmp_path):
    """The Python DataSource API does NOT push column pruning into the
    reader (the scan carries the full schema; Spark projects above it)
    — this pins the documented limitation AND that the projection is
    still correct."""
    path = str(tmp_path / "prune.arrow")
    feather.write_feather(_table(0, 10), path, compression="uncompressed")
    pruned = (
        registered.read.format("arrowipc").load(path).select("id", "tag")
    )
    assert set(pruned.columns) == {"id", "tag"}
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "score" in plan  # full-schema scan: the documented limitation


def test_write_round_trip_and_publish_discipline(registered, tmp_path):
    out = str(tmp_path / "out")
    src = registered.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.col("id") % 3).cast("long").alias("bucket"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    src.write.format("arrowipc").option("path", out).mode("append").save()
    files = sorted(glob.glob(os.path.join(out, "*.arrow")))
    assert len(files) == 8  # one published file per task
    assert not glob.glob(os.path.join(out, "_tmp-*"))  # no leftover temps
    back = registered.read.format("arrowipc").load(out)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500
    assert {r["name"] for r in back.filter(F.col("id") < 3).collect()} == {
        "n0",
        "n1",
        "n2",
    }
    # pyarrow can read what the writer published (interop both ways)
    t = feather.read_table(files[0])
    assert set(t.schema.names) == {"id", "bucket", "name"}


def test_temp_and_hidden_files_invisible_to_readers(registered, tmp_path):
    """Rename-as-publish is only atomic if readers skip unpublished
    names: a crashed job's orphaned ``_tmp-*.arrow`` (abort never ran)
    and dotfiles must not be listed, even though they end in .arrow."""
    d = tmp_path / "dir"
    d.mkdir()
    feather.write_feather(
        _table(0, 30), str(d / "good.arrow"), compression="uncompressed"
    )
    # orphaned task temp from a crashed concurrent write — same schema,
    # would silently double-count rows if listed
    feather.write_feather(
        _table(100, 30), str(d / "_tmp-deadbeef.arrow"), compression="uncompressed"
    )
    feather.write_feather(
        _table(200, 10), str(d / ".hidden.arrow"), compression="uncompressed"
    )
    # a truncated temp (mid-write crash) must not even be opened
    (d / "_tmp-torn.arrow").write_bytes(b"ARROW1\x00\x00partial")
    df = registered.read.format("arrowipc").load(str(d))
    assert df.count() == 30
    assert {r["id"] for r in df.collect()} == set(range(30))


def test_append_accumulates_across_writes(registered, tmp_path):
    """mode('append') must UNION with prior writes: partition ids
    repeat across jobs, so published names carry a per-write token —
    without it a second append clobbers same-numbered parts."""
    out = str(tmp_path / "out")
    registered.range(0, 100, 1, 4).write.format("arrowipc").option(
        "path", out
    ).mode("append").save()
    registered.range(100, 150, 1, 4).write.format("arrowipc").option(
        "path", out
    ).mode("append").save()
    files = glob.glob(os.path.join(out, "*.arrow"))
    assert len(files) == 8  # 4 parts per write, both generations kept
    back = registered.read.format("arrowipc").load(out)
    assert back.count() == 150
    assert {r["id"] for r in back.collect()} == set(range(150))


def test_glob_matching_only_temps_raises(registered, tmp_path):
    """A glob that matches ONLY hidden/temp names must raise like the
    directory branch — never resurrect and ingest partial files."""
    d = tmp_path / "dir"
    d.mkdir()
    feather.write_feather(
        _table(0, 5), str(d / "_tmp-only.arrow"), compression="uncompressed"
    )
    import pytest

    with pytest.raises(Exception, match="no IPC files"):
        registered.read.format("arrowipc").load(str(d / "*.arrow")).count()


def test_overwrite_removes_stale_parts(registered, tmp_path):
    """mode('overwrite') must replace the directory contents: a prior
    write with MORE partitions leaves part files the new write does not
    touch, and a later read must not merge old and new data."""
    out = str(tmp_path / "out")
    registered.range(0, 100, 1, 8).write.format("arrowipc").option(
        "path", out
    ).mode("append").save()
    assert len(glob.glob(os.path.join(out, "*.arrow"))) == 8
    registered.range(1000, 1010, 1, 2).write.format("arrowipc").option(
        "path", out
    ).mode("overwrite").save()
    files = sorted(glob.glob(os.path.join(out, "*.arrow")))
    assert len(files) == 2  # stale part-00002..07 gone
    back = registered.read.format("arrowipc").load(out)
    assert back.count() == 10
    assert {r["id"] for r in back.collect()} == set(range(1000, 1010))
