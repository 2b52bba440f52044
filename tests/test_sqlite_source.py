"""SQLite Python DataSource (SURVEY.md S4): schema inference,
rowid-range partitioning, and predicate pushdown into the source SQL.
"""

from __future__ import annotations

import sqlite3

import pytest

from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, Not

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.sqlite_source import (
    SQLiteReader,
    filter_to_sql,
    register_sqlite_source,
)

USERS = [
    (1, "alice", "alice@example.com", 172.5, 1),
    (2, "bob", "bob@example.com", 180.0, 1),
    (3, "carol", None, 165.2, 0),
    (4, "dave", "dave@example.com", None, 1),
    (5, "erin", "erin@example.com", 158.9, 0),
]


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sqlite") / "auth.sqlite3")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE auth_user (id INTEGER, username TEXT, email TEXT,"
        " height REAL, is_active INTEGER)"
    )
    con.executemany("INSERT INTO auth_user VALUES (?,?,?,?,?)", USERS)
    con.commit()
    con.close()
    return path


@pytest.fixture(scope="module")
def registered(spark):
    register_sqlite_source(spark)
    return spark


def _read(spark, path, **opts):
    r = spark.read.format("sqlite").option("path", path).option(
        "table", "auth_user"
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_inference_and_full_read(registered, db):
    df = _read(registered, db)
    assert [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields] == [
        "id:bigint", "username:string", "email:string",
        "height:double", "is_active:bigint",
    ]
    assert sorted(tuple(r) for r in df.collect()) == sorted(USERS)


def test_rowid_partitioning_covers_all_rows(registered, db):
    df = _read(registered, db, numPartitions=3)
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4, 5]
    # more partitions than rows degrades gracefully
    df1 = _read(registered, db, numPartitions=99)
    assert sorted(r.id for r in df1.collect()) == [1, 2, 3, 4, 5]


def test_filter_results_match_plain_filtering(registered, db):
    df = _read(registered, db).filter("is_active = 1 AND height > 160.0")
    assert sorted(r.id for r in df.collect()) == [1, 2]
    # a filter the source can't evaluate stays correct (Spark residual)
    df2 = _read(registered, db).filter("username LIKE '%o%'")
    assert sorted(r.id for r in df2.collect()) == [2, 3]


def test_filter_translation_unit():
    assert filter_to_sql(EqualTo(("is_active",), 1)) == ('"is_active" = ?', [1])
    assert filter_to_sql(GreaterThan(("height",), 160.0)) == (
        '"height" > ?', [160.0],
    )
    assert filter_to_sql(IsNotNull(("email",))) == ('"email" IS NOT NULL', [])
    assert filter_to_sql(Not(EqualTo(("is_active",), 1))) is None  # residual
    # nested attributes can't index a flat sqlite column
    assert filter_to_sql(EqualTo(("a", "b"), 1)) is None


def test_write_roundtrip_overwrite_and_append(registered, db, tmp_path):
    out = str(tmp_path / "out.sqlite3")
    df = _read(registered, db).repartition(3)

    def write(mode):
        (
            df.write.format("sqlite")
            .option("path", out)
            .option("table", "users_mirror")
            .option("stageDir", str(tmp_path / "stage"))
            .mode(mode)
            .save()
        )

    write("overwrite")
    got = sqlite3.connect(out).execute(
        "SELECT * FROM users_mirror ORDER BY id"
    ).fetchall()
    assert got == sorted(USERS)
    write("append")
    n = sqlite3.connect(out).execute(
        "SELECT count(*) FROM users_mirror"
    ).fetchone()[0]
    assert n == 2 * len(USERS)
    write("overwrite")  # overwrite resets, not appends
    n = sqlite3.connect(out).execute(
        "SELECT count(*) FROM users_mirror"
    ).fetchone()[0]
    assert n == len(USERS)
    assert not list((tmp_path / "stage").glob("*.sqlite3")), "spills leaked"


def test_stream_write_exactly_once(registered, tmp_path):
    """writeStream into SQLite: rows land once; a replayed micro-batch
    (same batchId re-committed, as after a crash between sink commit
    and checkpoint write) is skipped via the _stream_commits ledger."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.framefeed import (
        register_framefeed_source,
    )

    register_framefeed_source(registered)
    out = str(tmp_path / "sink.sqlite3")
    q = (
        registered.readStream.format("framefeed")
        .option("maxFrames", 40)
        .option("framesPerBatch", 16)
        .load()
        .selectExpr("camera_id", "frame_id", "score")
        .writeStream.format("sqlite")
        .option("path", out)
        .option("table", "frames")
        .option("stageDir", str(tmp_path / "stage"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    con = sqlite3.connect(out)
    ids = [r[0] for r in con.execute("SELECT frame_id FROM frames ORDER BY 1")]
    assert ids == list(range(40))
    ledger = con.execute(
        "SELECT count(*), sum(n_rows) FROM _stream_commits"
    ).fetchone()
    assert ledger[1] == 40

    # simulate the crash-replay: re-commit an already-ledgered batchId
    from pyspark.sql.types import StructType

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.sqlite_source import (
        SQLiteStreamWriter,
        _SpillMessage,
    )

    schema = StructType.fromDDL("camera_id long, frame_id long, score double")
    w = SQLiteStreamWriter(
        schema,
        {"path": out, "table": "frames", "stagedir": str(tmp_path / "stage2")},
        False,
    )
    spill = str(tmp_path / "replay.sqlite3")
    scon = sqlite3.connect(spill)
    scon.execute(w._create_sql())
    scon.execute('INSERT INTO "frames" VALUES (9, 999, 0.5)')
    scon.commit()
    scon.close()
    w.commit([_SpillMessage(spill, 1)], batchId=0)  # batch 0 already landed
    n = sqlite3.connect(out).execute("SELECT count(*) FROM frames").fetchone()
    assert n[0] == 40, "replayed batch must be skipped, not re-applied"


def test_pushed_filters_reach_source_sql(db):
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        "id bigint, username string, email string, height double,"
        " is_active bigint"
    )
    rdr = SQLiteReader(schema, {"path": db, "table": "auth_user"})
    residual = list(
        rdr.pushFilters([EqualTo(("is_active",), 1), Not(IsNotNull(("email",)))])
    )
    assert rdr.where == ['"is_active" = ?'] and rdr.params == [1]
    assert len(residual) == 1  # the Not(...) stays with Spark
    ids = [
        i
        for p in rdr.partitions()
        for b in rdr.read(p)
        for i in b.column(0).to_pylist()
    ]
    assert sorted(ids) == [1, 2, 4]  # active only
