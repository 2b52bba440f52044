"""SQLite batch source as a Spark 4 Python DataSource (SURVEY.md S4).

The reference reads its user/auth relations from Django's SQLite file
(reference settings.py:78-83, db.sqlite3); this makes that a real
Spark SOURCE instead of an export step: ``spark.read.format("sqlite")
.option("path", db).option("table", t)``.

Scale posture: SQLite is a single-file store, so the useful
parallelism is rowid-range partitioning — each task opens the file
read-only and scans one rowid slice (SQLite allows unlimited
concurrent readers), giving N independent scans instead of one choked
reader. Supported predicates are pushed into the per-slice SQL (the
planner calls ``pushFilters`` once; unsupported ones stay in Spark) —
at 100 TB the analog is a JDBC-partitioned dimension ingest where
pushdown prunes at the remote store.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPE_MAP = {
    "INTEGER": LongType(),
    "INT": LongType(),
    "BIGINT": LongType(),
    "REAL": DoubleType(),
    "DOUBLE": DoubleType(),
    "FLOAT": DoubleType(),
    "BLOB": BinaryType(),
}

DEFAULT_PARTITIONS = 4


def _qi(name: str) -> str:
    """Quote a SQLite identifier — embedded double quotes double, so a
    hostile table/column option can't splice SQL into the auth db."""
    return '"' + name.replace('"', '""') + '"'


def _sqlite_schema(path: str, table: str) -> StructType:
    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as con:
        cols = con.execute(f"PRAGMA table_info({_qi(table)})").fetchall()
    if not cols:
        raise ValueError(f"sqlite table {table!r} not found in {path}")
    fields = []
    for _cid, name, decl, _notnull, _default, _pk in cols:
        decl = (decl or "").upper().split("(")[0].strip()
        fields.append(StructField(name, _TYPE_MAP.get(decl, StringType()), True))
    return StructType(fields)


_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def filter_to_sql(f: Filter) -> tuple[str, list] | None:
    """One pushed filter → (parameterized WHERE fragment, params), or
    None when the source can't evaluate it (it stays in Spark)."""
    op = _OPS.get(type(f))
    if op is not None and len(f.attribute) == 1:
        return f"{_qi(f.attribute[0])} {op} ?", [f.value]
    if isinstance(f, IsNull) and len(f.attribute) == 1:
        return f"{_qi(f.attribute[0])} IS NULL", []
    if isinstance(f, IsNotNull) and len(f.attribute) == 1:
        return f"{_qi(f.attribute[0])} IS NOT NULL", []
    return None


class _RowidSlice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SQLiteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.table = options["table"]
        self.n_parts = int(options.get("numpartitions", DEFAULT_PARTITIONS))
        self.columns = [f.name for f in schema.fields]
        self._schema_fields = list(schema.fields)
        self.where: list[str] = []
        self.params: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        for f in filters:
            frag = filter_to_sql(f)
            if frag is None:
                yield f  # unsupported — Spark keeps evaluating it
            else:
                self.where.append(frag[0])
                self.params.extend(frag[1])

    def partitions(self) -> Sequence[InputPartition]:
        with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as con:
            row = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {_qi(self.table)}"
            ).fetchone()
        lo, hi = row if row and row[0] is not None else (0, -1)
        if hi < lo:
            return [_RowidSlice(0, -1)]
        n = min(self.n_parts, hi - lo + 1)
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidSlice(lo + i * step, min(hi, lo + (i + 1) * step - 1))
            for i in range(n)
        ]

    ARROW_BATCH_ROWS = 8192

    def read(self, partition: _RowidSlice):
        """Yields Arrow RecordBatches (the DataSource API's fast path:
        one columnar hand-off per 8k rows instead of per-row pickling),
        with explicit Arrow types derived from the declared schema so
        all-NULL slices can't be type-inferred into a mismatch."""
        import pyarrow as pa

        pa_types = {
            "bigint": pa.int64(),
            "double": pa.float64(),
            "binary": pa.binary(),
        }
        arrow_schema = [
            (f.name, pa_types.get(f.dataType.simpleString(), pa.string()))
            for f in self._schema_fields
        ]
        cols = ", ".join(_qi(c) for c in self.columns)
        clauses = ["rowid BETWEEN ? AND ?", *self.where]
        sql = (
            f"SELECT {cols} FROM {_qi(self.table)} "
            f"WHERE {' AND '.join(clauses)} ORDER BY rowid"
        )
        with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as con:
            cur = con.execute(sql, [partition.lo, partition.hi, *self.params])
            while True:
                rows = cur.fetchmany(self.ARROW_BATCH_ROWS)
                if not rows:
                    break
                columns = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(columns[i], type=t)
                        for i, (_n, t) in enumerate(arrow_schema)
                    ],
                    names=[n for n, _t in arrow_schema],
                )


_DDL_MAP = {
    LongType(): "INTEGER",
    DoubleType(): "REAL",
    BinaryType(): "BLOB",
}


class _SpillMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class SQLiteWriter(DataSourceWriter):
    """Two-phase SQLite sink: SQLite allows ONE writer per file, so
    tasks never touch the target — each task spills its partition to a
    private staging db and the driver's ``commit`` merges the staged
    files into the target under a single transaction (``abort`` just
    deletes them). Atomic from the reader's perspective: either every
    partition lands or none. On a real cluster the staging dir must be
    shared storage (or the auth-dim-sized frame collected first); the
    pattern is the standard two-phase JDBC-dim export.
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import os
        import tempfile

        self.path = options["path"]
        self.table = options["table"]
        self.overwrite = overwrite
        self.columns = [f.name for f in schema.fields]
        self.ddl = ", ".join(
            f'{_qi(f.name)} {_DDL_MAP.get(f.dataType, "TEXT")}'
            for f in schema.fields
        )
        self.stage_dir = options.get(
            "stagedir", os.path.join(tempfile.gettempdir(), "sqlite_stage")
        )

    def _create_sql(self) -> str:
        return f"CREATE TABLE IF NOT EXISTS {_qi(self.table)} ({self.ddl})"

    def write(self, iterator) -> _SpillMessage:
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.stage_dir, exist_ok=True)
        part = TaskContext.get().partitionId()
        spill = os.path.join(
            self.stage_dir, f"part-{part}-{uuid.uuid4().hex}.sqlite3"
        )
        ph = ", ".join("?" for _ in self.columns)
        n = 0
        with sqlite3.connect(spill) as con:
            con.execute(self._create_sql())
            for row in iterator:
                con.execute(
                    f"INSERT INTO {_qi(self.table)} VALUES ({ph})", tuple(row)
                )
                n += 1
            con.commit()
        return _SpillMessage(spill, n)

    def commit(self, messages) -> None:
        import os

        # two phases: (1) accumulate every spill into a staging table in
        # autocommit mode (ATTACH is illegal inside a transaction), then
        # (2) one atomic transaction publishes staging into the target —
        # a reader sees the old table or the complete new data, never a
        # partial merge
        tmp = f"_incoming_{self.table}"
        con = sqlite3.connect(self.path)
        con.isolation_level = None  # explicit transaction control
        try:
            con.execute(f"DROP TABLE IF EXISTS {_qi(tmp)}")
            con.execute(f"CREATE TABLE {_qi(tmp)} ({self.ddl})")
            for m in messages:
                if m is None:
                    continue
                con.execute("ATTACH DATABASE ? AS stage", (m.path,))
                con.execute(
                    f"INSERT INTO {_qi(tmp)} SELECT * FROM stage.{_qi(self.table)}"
                )
                con.execute("DETACH DATABASE stage")
            con.execute("BEGIN IMMEDIATE")
            if self.overwrite:
                con.execute(f"DROP TABLE IF EXISTS {_qi(self.table)}")
                con.execute(f"ALTER TABLE {_qi(tmp)} RENAME TO {_qi(self.table)}")
            else:
                con.execute(self._create_sql())
                con.execute(
                    f"INSERT INTO {_qi(self.table)} SELECT * FROM {_qi(tmp)}"
                )
                con.execute(f"DROP TABLE {_qi(tmp)}")
            con.execute("COMMIT")
        except Exception:
            try:
                con.execute("ROLLBACK")
            except sqlite3.OperationalError:
                pass  # failure before BEGIN — autocommit, nothing open
            raise
        finally:
            con.close()
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SQLiteStreamWriter(SQLiteWriter, DataSourceStreamWriter):
    """Streaming SQLite sink, exactly-once: every micro-batch appends
    through the same stage-then-publish transaction, and the publish
    also records (table, batch_id) in a ``_stream_commits`` ledger
    INSIDE that transaction — a replayed batch (restart after a crash
    between sink commit and checkpoint write) finds its ledger row and
    skips, so rows are never duplicated. This is the idempotent-sink
    half of Structured Streaming's exactly-once contract, done with
    SQLite's own atomicity instead of a transactional table format."""

    _LEDGER = "_stream_commits"

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        tmp = f"_incoming_{self.table}"
        con = sqlite3.connect(self.path)
        con.isolation_level = None
        try:
            con.execute(f"DROP TABLE IF EXISTS {_qi(tmp)}")
            con.execute(f"CREATE TABLE {_qi(tmp)} ({self.ddl})")
            for m in messages:
                if m is None:
                    continue
                con.execute("ATTACH DATABASE ? AS stage", (m.path,))
                con.execute(
                    f"INSERT INTO {_qi(tmp)} SELECT * FROM stage.{_qi(self.table)}"
                )
                con.execute("DETACH DATABASE stage")
            con.execute("BEGIN IMMEDIATE")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {_qi(self._LEDGER)} "
                "(tbl TEXT, batch_id INTEGER, n_rows INTEGER, "
                "PRIMARY KEY (tbl, batch_id))"
            )
            seen = con.execute(
                f"SELECT 1 FROM {_qi(self._LEDGER)} WHERE tbl = ? AND batch_id = ?",
                (self.table, batchId),
            ).fetchone()
            if seen:
                # replayed micro-batch: the ledger proves it already
                # landed — drop the staged copy and change nothing
                con.execute(f"DROP TABLE {_qi(tmp)}")
                con.execute("COMMIT")
            else:
                con.execute(self._create_sql())
                con.execute(
                    f"INSERT INTO {_qi(self.table)} SELECT * FROM {_qi(tmp)}"
                )
                n = sum(m.n_rows for m in messages if m is not None)
                con.execute(
                    f"INSERT INTO {_qi(self._LEDGER)} VALUES (?, ?, ?)",
                    (self.table, batchId, n),
                )
                con.execute(f"DROP TABLE {_qi(tmp)}")
                con.execute("COMMIT")
        except Exception:
            try:
                con.execute("ROLLBACK")
            except sqlite3.OperationalError:
                pass
            raise
        finally:
            con.close()
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        SQLiteWriter.abort(self, messages)


class SQLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self) -> StructType:
        return _sqlite_schema(self.options["path"], self.options["table"])

    def reader(self, schema: StructType) -> SQLiteReader:
        return SQLiteReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> SQLiteWriter:
        return SQLiteWriter(schema, dict(self.options), overwrite)

    def streamWriter(  # noqa: N802 — Spark API name
        self, schema: StructType, overwrite: bool
    ) -> SQLiteStreamWriter:
        # streaming appends; "overwrite" has no meaning per micro-batch
        return SQLiteStreamWriter(schema, dict(self.options), False)


def register_sqlite_source(spark) -> None:
    """Register the source and enable Python-source filter pushdown
    (off by default in Spark 4)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SQLiteDataSource)
