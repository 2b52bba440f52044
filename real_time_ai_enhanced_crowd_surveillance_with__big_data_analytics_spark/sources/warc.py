"""WARC web-crawl ingestion — the container format LLM pretraining
corpora actually arrive in (Common-Crawl-style WARC/1.0), parsed with
zero dependencies and split into records Spark-side.

Reference scope note: the reference app ingests only camera frames and
form POSTs (main.py webcam loop; views.py form handlers); this source
extends the same ingestion surface to the web-crawl container a
training-data pipeline reads, the way read_image_dir extends it to
object-store image directories.

Design for 100 TB:

- File-level parallelism comes free from the ``binaryFile`` listing
  (one task per WARC file; crawl dumps ship as ~1 GB files). The
  extension filter is pushed into the listing via ``pathGlobFilter``.
- ``.warc.gz`` files are parsed MEMBER-BY-MEMBER (one gzip member per
  record, the Common Crawl convention) with ``zlib.decompressobj`` +
  ``unused_data`` — the member boundary is exactly the record
  boundary, which is what makes record-level splitting (a CDX offset
  index pointing mid-file) possible at scale; this parser is the
  member-walk that such an index would seek into.
- Parsing is total: a malformed record (or a trailing truncation)
  becomes a row with ``corrupt_reason`` set instead of a task failure
  — the text_formats dead-letter convention, so one bad crawl file
  cannot kill a 100 TB ingest job.
- Everything downstream is ordinary columns: response records carry
  HTTP status / content-type / body, so the next stages are the
  existing corpus operators (html text extraction, quality, dedup).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string,"
    " warc_date string, http_status int, content_type string,"
    " body binary, corrupt_reason string"
)

_GZ_MAGIC = b"\x1f\x8b"


def iter_gzip_members(buf: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, decompressed_payload) of each gzip
    member in ``buf``, walking member boundaries via ``unused_data``
    (the warc.gz record seam). The (offset, length) pair is exactly
    what a CDX index stores: ``buf[offset : offset + length]`` is a
    self-contained gzip stream for one record."""
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(buf[pos:])
            out += d.flush()
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at {pos}: {exc}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at {pos}")
        consumed = (len(buf) - pos) - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - zlib guarantees progress
            raise ValueError(f"gzip member made no progress at {pos}")
        yield pos, consumed, out
        pos += consumed


def split_gzip_members(buf: bytes) -> Iterator[bytes]:
    """Decompressed payloads only (see :func:`iter_gzip_members`)."""
    for _off, _n, out in iter_gzip_members(buf):
        yield out


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """(header-fields, payload) per WARC record in a plain (already
    decompressed) buffer. Raises ValueError on malformed content; the
    Spark wrapper catches per file and dead-letters."""
    pos = 0
    while pos < len(buf):
        while buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(buf):
            break
        end = buf.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError(f"truncated record header at {pos}")
        lines = buf[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad record magic at {pos}: {lines[0][:20]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            n = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"missing/bad Content-Length at {pos}") from exc
        start = end + 4
        payload = buf[start : start + n]
        if len(payload) < n:
            raise ValueError(f"truncated payload at {pos}")
        yield fields, payload
        pos = start + n


def split_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of an HTTP response payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("no HTTP header/body separator")
    lines = payload[:sep].decode("latin-1").split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line: {lines[0][:40]!r}")
    status = int(parts[1])
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4 :]


def parse_warc_bytes(path: str, content: bytes) -> Iterator[dict]:
    """Total parse of one WARC file (plain or per-record-gzip) into
    RECORD_SCHEMA dicts; malformed tails become corrupt rows."""

    def row(**kw):
        base = dict(
            path=path,
            record_id=None,
            warc_type=None,
            target_uri=None,
            warc_date=None,
            http_status=None,
            content_type=None,
            body=None,
            corrupt_reason=None,
        )
        base.update(kw)
        return base

    def records():
        if content[:2] == _GZ_MAGIC:
            for member in split_gzip_members(content):
                yield from iter_warc_records(member)
        else:
            yield from iter_warc_records(content)

    it = records()
    while True:
        try:
            fields, payload = next(it)
        except StopIteration:
            return
        except ValueError as exc:
            yield row(corrupt_reason=str(exc))
            return  # position is lost after a framing error
        rec = row(
            record_id=fields.get("warc-record-id"),
            warc_type=fields.get("warc-type"),
            target_uri=fields.get("warc-target-uri"),
            warc_date=fields.get("warc-date"),
            body=payload,
        )
        if fields.get("warc-type") == "response":
            try:
                status, headers, body = split_http_response(payload)
                rec.update(
                    http_status=status,
                    content_type=headers.get("content-type"),
                    body=body,
                )
            except ValueError as exc:
                rec.update(body=payload, corrupt_reason=str(exc))
        yield rec


def parse_warc_files(files: DataFrame) -> DataFrame:
    """(path, content) binary-file rows -> one row per WARC record."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(path, bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "body",
                    "corrupt_reason",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=RECORD_SCHEMA
    )


CDX_SCHEMA = (
    "path string, member_offset long, member_length long,"
    " record_id string, warc_type string, target_uri string,"
    " corrupt_reason string"
)


def build_cdx(files: DataFrame) -> DataFrame:
    """CDX-style offset index over ``.warc.gz`` files: one row per
    gzip member with its (offset, compressed length) plus the record
    header fields — the structure that makes record-LEVEL parallelism
    possible at 100 TB (a task seeks to ``offset``, reads ``length``
    bytes, and has a self-contained record; no file-level scan). The
    index build itself is one pass per file (file-level parallel);
    after that, every downstream read is member-granular. Non-gzip
    or malformed tails dead-letter as corrupt rows, never task
    failures."""
    import pandas as pd

    def index(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                base = dict(
                    path=path,
                    member_offset=None,
                    member_length=None,
                    record_id=None,
                    warc_type=None,
                    target_uri=None,
                    corrupt_reason=None,
                )
                if content[:2] != _GZ_MAGIC:
                    rows.append(
                        dict(base, corrupt_reason="not a gzip warc file")
                    )
                    continue
                try:
                    for off, n, member in iter_gzip_members(content):
                        rec = dict(base, member_offset=off, member_length=n)
                        try:
                            fields, _payload = next(
                                iter_warc_records(member)
                            )
                            rec.update(
                                record_id=fields.get("warc-record-id"),
                                warc_type=fields.get("warc-type"),
                                target_uri=fields.get("warc-target-uri"),
                            )
                        except (StopIteration, ValueError) as exc:
                            rec["corrupt_reason"] = f"bad member record: {exc}"
                        rows.append(rec)
                except ValueError as exc:
                    rows.append(dict(base, corrupt_reason=str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "member_offset",
                    "member_length",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "corrupt_reason",
                ],
            )

    return files.select("path", "content").mapInPandas(
        index, schema=CDX_SCHEMA
    )


def read_warc_via_cdx(cdx: DataFrame) -> DataFrame:
    """Record-granular WARC reads driven by a CDX index: each task
    seeks to its members' (offset, length) spans and decompresses just
    those records — the 100 TB read path (on an object store the seek
    is a ranged GET; locally it is a file seek). Parallelism is now
    per-RECORD: repartition the index however the workload needs,
    independent of file boundaries — the point of building the index.
    Corrupt index rows pass through as corrupt records."""
    import gzip
    import zlib as _zlib

    import pandas as pd

    def fetch(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if r["corrupt_reason"] is not None:
                    rows.append(
                        {
                            "path": r["path"],
                            "record_id": None,
                            "warc_type": None,
                            "target_uri": None,
                            "warc_date": None,
                            "http_status": None,
                            "content_type": None,
                            "body": None,
                            "corrupt_reason": r["corrupt_reason"],
                        }
                    )
                    continue
                local = r["path"].removeprefix("file:")
                with open(local, "rb") as f:
                    f.seek(int(r["member_offset"]))
                    member = f.read(int(r["member_length"]))
                try:
                    rows.extend(
                        parse_warc_bytes(r["path"], gzip.decompress(member))
                    )
                # gzip.decompress raises OSError (BadGzipFile) for a bad
                # header, zlib.error for corrupt member bytes, and
                # EOFError for a truncated span — none of the latter two
                # subclass OSError, and a stale CDX span must dead-letter,
                # never fail the task (module contract).
                except (OSError, EOFError, _zlib.error) as exc:
                    rows.append(
                        {
                            "path": r["path"],
                            "record_id": None,
                            "warc_type": None,
                            "target_uri": None,
                            "warc_date": None,
                            "http_status": None,
                            "content_type": None,
                            "body": None,
                            "corrupt_reason": f"bad member span: {exc}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "body",
                    "corrupt_reason",
                ],
            )

    return cdx.mapInPandas(fetch, schema=RECORD_SCHEMA)


def warc_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """WARC directory -> documents-shaped text corpus: HTTP-200
    text/html responses, boilerplate-stripped to visible text with
    title and link-density columns — ready for the existing corpus
    operators (quality scoring, dedup, tokenization). One pass: the
    record parse and the codegen'd extraction fuse into the same scan
    stage, so the crawl is read exactly once."""
    from pyspark.sql import functions as F

    from ..functions.html import html_title, html_to_text, link_density

    recs = read_warc(spark, path)
    html = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("corrupt_reason").isNull()
        & (F.col("http_status") == 200)
        & F.col("content_type").contains("text/html")
    ).withColumn("html", F.col("body").cast("string"))
    return html.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        F.col("target_uri").alias("url"),
        html_title(F.col("html")).alias("title"),
        html_to_text(F.col("html")).alias("text"),
        link_density(F.col("html")).alias("link_density"),
    )


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.warc*",
    max_bytes: int = 2 << 30,
) -> DataFrame:
    """Read a directory of WARC files into records. The glob is pushed
    into the file listing; the size cap drops pathological files
    before bytes move (binaryFile hard-caps at 2 GB regardless)."""
    from pyspark.sql import functions as F

    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    files = r.load(path).filter(F.col("length") <= max_bytes)
    return parse_warc_files(files)
