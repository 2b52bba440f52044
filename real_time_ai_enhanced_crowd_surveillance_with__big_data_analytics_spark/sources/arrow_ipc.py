"""Arrow IPC (Feather v2) batch source/sink as a Spark 4 Python
DataSource: ``spark.read.format("arrowipc").load(path)`` /
``df.write.format("arrowipc").save(dir)``.

Arrow IPC is the interchange format of the Python data stack (feather
files, Arrow Flight payloads, pandas/polars/duckdb exports) and the
wire format Spark itself uses for Pandas UDFs — but Spark ships no
file-level reader for it. This source closes that gap with the same
zero-extra-dependency posture as the repo's other sources: pyarrow is
already a Spark dependency.

Scale posture: the IPC FILE format has a footer with per-batch
offsets, so a record batch is O(1)-addressable without scanning its
predecessors — the natural partition is therefore (file, batch_index),
giving min(Σ batches, cores) independent tasks instead of one choked
reader per file. ``read`` yields pyarrow RecordBatches directly, the
Python DataSource API's Arrow fast path — rows never materialize in
Python. Column pruning is NOT pushed through this API (the planner
hands the reader the full schema and projects above the scan — a
current Python-DataSource limitation, unlike the parquet scans
elsewhere in this repo); the cost is bounded because IPC batches are
columnar and memory-mapped, so unprojected columns are touched only
at the Arrow→Spark handoff.

The writer emits one IPC file per task under a task-temp name and
renames on driver commit (rename-as-publish — readers never see
partial files; abort unlinks the temps), mirroring the two-phase
discipline of sqlite_source's writer.
"""

from __future__ import annotations

import glob
import os
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _hidden(p: str) -> bool:
    """Hadoop convention: _-/.-prefixed basenames are unpublished.

    The writer's task temps are ``_tmp-<uuid>.arrow``; excluding them
    here is what makes rename-as-publish actually atomic for readers —
    a read concurrent with a write (or after a crashed job whose
    abort() never ran) must not ingest partial files.
    """
    return os.path.basename(p).startswith(("_", "."))


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = [
            p
            for p in sorted(glob.glob(os.path.join(path, "*")))
            if p.endswith((".arrow", ".feather", ".ipc")) and not _hidden(p)
        ]
    elif any(c in path for c in "*?["):
        # glob: hidden/temp names are never resurrected — a pattern
        # matching ONLY temps (mid-write dir, crashed job) must raise
        # like the directory branch, not ingest partial files
        out = [p for p in sorted(glob.glob(path)) if not _hidden(p)]
    else:
        out = [path]  # an explicit single path wins, hidden or not
    if not out:
        raise ValueError(f"arrowipc: no IPC files under {path!r}")
    return out


@dataclass
class _BatchSlice(InputPartition):
    file: str
    batch_index: int


class ArrowIPCReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        # column pruning: Spark hands the reader the PRUNED schema; the
        # reader selects just those columns from each batch
        self._columns = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        import pyarrow as pa

        parts: list[_BatchSlice] = []
        for f in _files(self._path):
            with pa.memory_map(f, "r") as mm:
                n = pa.ipc.open_file(mm).num_record_batches
            parts.extend(_BatchSlice(f, i) for i in range(n))
        return parts

    def read(self, partition: _BatchSlice):
        import pyarrow as pa

        with pa.memory_map(partition.file, "r") as mm:
            reader = pa.ipc.open_file(mm)
            batch = reader.get_batch(partition.batch_index)
            yield batch.select(self._columns)


@dataclass
class _Published(WriterCommitMessage):
    temp: str
    final: str


class ArrowIPCWriter(DataSourceWriter):
    def __init__(
        self, schema: StructType, options: dict, overwrite: bool = False
    ) -> None:
        self._schema = schema
        self._dir = options["path"]
        self._overwrite = overwrite
        # per-WRITE token baked into published names: partition ids
        # repeat across writes, so pid-only names would make a second
        # mode("append") os.replace() the first write's same-numbered
        # parts — silently neither union nor replacement
        self._job = uuid.uuid4().hex[:12]

    def write(self, rows: Iterator) -> _Published:
        import pyarrow as pa
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self._dir, exist_ok=True)
        final = os.path.join(
            self._dir, f"part-{self._job}-{pid:05d}.arrow"
        )
        temp = os.path.join(self._dir, f"_tmp-{uuid.uuid4().hex}.arrow")
        arrow_schema = to_arrow_schema(self._schema)
        data = [tuple(r) for r in rows]
        columns = (
            [list(col) for col in zip(*data)]
            if data
            else [[] for _ in arrow_schema]
        )
        table = pa.table(
            {f.name: pa.array(c, f.type) for f, c in zip(arrow_schema, columns)},
            schema=arrow_schema,
        )
        with pa.OSFile(temp, "wb") as sink:
            with pa.ipc.new_file(sink, arrow_schema) as writer:
                writer.write_table(table)
        return _Published(temp=temp, final=final)

    def commit(self, messages) -> None:
        # rename-as-publish: readers list only non-hidden *.arrow, temps
        # are _tmp-*.  mode("overwrite") replaces the whole directory
        # contents: stale part files from a previous write with MORE
        # partitions must not survive and silently merge with new data,
        # so clean every published (non-hidden) IPC file first — the
        # about-to-publish temps are _-prefixed and survive the sweep.
        if self._overwrite:
            for p in glob.glob(os.path.join(self._dir, "*")):
                if p.endswith((".arrow", ".feather", ".ipc")) and not _hidden(p):
                    os.unlink(p)
        for m in messages:
            if m is not None:
                os.replace(m.temp, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp):
                os.unlink(m.temp)


class ArrowIPCDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self) -> StructType:
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        first = _files(self.options["path"])[0]
        with pa.memory_map(first, "r") as mm:
            arrow_schema = pa.ipc.open_file(mm).schema
        return from_arrow_schema(arrow_schema)

    def reader(self, schema: StructType) -> ArrowIPCReader:
        return ArrowIPCReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ArrowIPCWriter:
        return ArrowIPCWriter(schema, self.options, overwrite)


def register_arrow_ipc_source(spark) -> None:
    """Idempotent registration of format('arrowipc')."""
    spark.dataSource.register(ArrowIPCDataSource)
