"""HTTP form source (SURVEY.md S8; reference
crowd_surveillance/app/views.py:24-25,41-45).

The reference ingests user registrations/logins as Django ``request.
POST`` fields — rows that exist only inside one web-request stack
frame. This re-expresses the form endpoint as a replayable Spark
STREAMING source with the same two-piece shape every durable ingest
has:

1. **Spool server** (:func:`start_form_server`): a stdlib
   ``ThreadingHTTPServer`` accepting ``application/x-www-form-
   urlencoded`` POSTs (the exact wire format a Django form submits).
   Each accepted submission is assigned a dense monotone sequence
   number under a lock and written to the spool directory as
   ``{seq:08d}.json`` via write-temp + atomic-rename — once visible,
   a spool file is immutable, which is what makes offset replay exact.

2. **DataSource** (``format("httpform")``): offsets are ``{"seq": N}``
   (N = highest visible sequence number). ``latestOffset`` advances by
   at most ``maxPerBatch`` (backpressure, same contract as
   maxFilesPerTrigger); ``partitions`` slices the (start, end] range
   into rowid ranges; ``read`` re-parses the immutable files, so any
   range re-reads identically after a checkpoint restart — the
   exactly-once property the reference's request handler fundamentally
   cannot have. A batch reader reads the whole spool for backfills.

Spool files are retained after commit (they are the source of truth;
retention/compaction is the operator's policy, exactly like a Kafka
topic). At scale the spool directory is object storage written by many
stateless form frontends — the dense per-frontend sequence becomes
(frontend_id, seq) and the offset a vector, the standard multi-log
generalization; the single-writer case here keeps the offset scalar.

Fields carried: the reference's registration form (fname, lname,
username, password, password1) plus contact — absent fields are null.
The engine's F1-F5 validators (functions/validators.py) consume these
rows directly; test_httpform_source.py closes the loop POST →
stream → validation_error, the reference's register() flow end-to-end.
"""

from __future__ import annotations

import json
import os
import threading
from collections.abc import Iterator, Sequence
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORM_FIELDS = ("fname", "lname", "username", "password", "password1", "contact")

FORM_SCHEMA = StructType(
    [StructField("seq", LongType(), False),
     StructField("ts", TimestampType(), False)]
    + [StructField(f, StringType(), True) for f in FORM_FIELDS]
)


def _spool_path(spool_dir: str, seq: int) -> str:
    return os.path.join(spool_dir, f"{seq:08d}.json")


def _max_seq(spool_dir: str) -> int:
    mx = 0
    for e in os.listdir(spool_dir):
        if e.endswith(".json") and e[:-5].isdigit():
            mx = max(mx, int(e[:-5]))
    return mx


class _FormHandler(BaseHTTPRequestHandler):
    # the server instance carries spool_dir / lock / counter (set in
    # start_form_server); handlers are per-request and stateless

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        n = int(self.headers.get("Content-Length", 0))
        if n > 1 << 20:  # refuse megabyte form posts loudly
            self.send_error(413, "form too large")
            return
        body = self.rfile.read(n).decode("utf-8", errors="replace")
        fields = dict(parse_qsl(body, keep_blank_values=True))
        import datetime as dt

        srv = self.server
        with srv.spool_lock:  # type: ignore[attr-defined]
            srv.spool_seq += 1  # type: ignore[attr-defined]
            seq = srv.spool_seq  # type: ignore[attr-defined]
            rec = {
                "seq": seq,
                "ts": dt.datetime.now(dt.timezone.utc).timestamp(),
                **{f: fields.get(f) for f in FORM_FIELDS},
            }
            final = _spool_path(srv.spool_dir, seq)  # type: ignore[attr-defined]
            tmp = final + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(rec, fh)
            os.rename(tmp, final)  # atomic: visible = complete
        out = json.dumps({"seq": seq}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *args) -> None:  # silence per-request stderr
        pass


def start_form_server(
    spool_dir: str, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread, int]:
    """Start the spool server; returns (server, thread, bound_port).
    Resumes the sequence from the existing spool (crash-safe: the
    counter is derived from the durable files, not memory)."""
    os.makedirs(spool_dir, exist_ok=True)
    srv = ThreadingHTTPServer((host, port), _FormHandler)
    srv.spool_dir = spool_dir  # type: ignore[attr-defined]
    srv.spool_lock = threading.Lock()  # type: ignore[attr-defined]
    srv.spool_seq = _max_seq(spool_dir)  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t, srv.server_address[1]


class _SeqRange(InputPartition):
    def __init__(self, spool_dir: str, start: int, end: int):
        self.spool_dir, self.start, self.end = spool_dir, start, end


def _read_range(spool_dir: str, start: int, end: int) -> Iterator[tuple]:
    import datetime as dt

    for seq in range(start + 1, end + 1):
        with open(_spool_path(spool_dir, seq)) as fh:
            rec = json.load(fh)
        yield (
            rec["seq"],
            dt.datetime.fromtimestamp(rec["ts"], dt.timezone.utc).replace(
                tzinfo=None
            ),
            *(rec.get(f) for f in FORM_FIELDS),
        )


def _slice(spool_dir: str, lo: int, hi: int, n_parts: int) -> Sequence[InputPartition]:
    n = max(1, min(n_parts, hi - lo))
    step = (hi - lo + n - 1) // n if hi > lo else 1
    parts = [
        _SeqRange(spool_dir, lo + i * step, min(hi, lo + (i + 1) * step))
        for i in range(n)
        if lo + i * step < hi
    ]
    return parts or [_SeqRange(spool_dir, lo, lo)]


def _trace(msg: str) -> None:  # debug aid: the reader runs in a separate
    # python runner process, so print() is invisible — set HF_TRACE to a
    # file path to see the engine's callback sequence
    path = os.environ.get("HF_TRACE")
    if path:
        with open(path, "a") as fh:
            fh.write(f"pid={os.getpid()} {msg}\n")


class HttpFormStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.spool_dir = options["spooldir"]
        self.max_per_batch = int(options.get("maxperbatch", 1000))
        self.n_parts = int(options.get("numpartitions", 4))
        self._floor = 0

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        # dense sequence: everything up to max visible seq is complete
        # (rename-under-lock); cap the advance per trigger for
        # backpressure, monotone on this reader's own last answer
        latest = _max_seq(self.spool_dir)
        ret = min(latest, self._floor + self.max_per_batch)
        self._floor = max(self._floor, ret)
        _trace(f"latestOffset -> {ret} (spool={latest})")
        return {"seq": self._floor}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # after checkpoint restart the engine plans from its committed
        # offset, which this fresh reader has never seen — adopt it so
        # the cap never holds latestOffset below the checkpoint
        self._floor = max(self._floor, start["seq"], end["seq"])
        _trace(f"partitions {start} {end}")
        return _slice(self.spool_dir, start["seq"], end["seq"], self.n_parts)

    def read(self, partition: _SeqRange) -> Iterator[tuple]:
        return _read_range(partition.spool_dir, partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # spool files are the durable log; retention is external policy
        self._floor = max(self._floor, end["seq"])
        _trace(f"commit {end}")

    def stop(self) -> None:
        pass


class HttpFormBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.spool_dir = options["spooldir"]
        self.n_parts = int(options.get("numpartitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return _slice(self.spool_dir, 0, _max_seq(self.spool_dir), self.n_parts)

    def read(self, partition: _SeqRange) -> Iterator[tuple]:
        return _read_range(partition.spool_dir, partition.start, partition.end)


class HttpFormDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "httpform"

    def schema(self) -> StructType:
        return FORM_SCHEMA

    def reader(self, schema: StructType) -> HttpFormBatchReader:
        return HttpFormBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> HttpFormStreamReader:
        return HttpFormStreamReader(dict(self.options))


def register_httpform_source(spark) -> None:
    spark.dataSource.register(HttpFormDataSource)
