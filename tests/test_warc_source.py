"""WARC source: crafted WARC/1.0 files (plain and per-record-gzip,
the Common Crawl convention) round-tripped through the Spark reader;
framing/HTTP corruption dead-letters instead of failing the task.
"""

from __future__ import annotations

import gzip

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.warc import (
    iter_warc_records,
    parse_warc_bytes,
    read_warc,
    split_gzip_members,
    split_http_response,
)


def _record(warc_type: str, uri: str | None, payload: bytes, rid: str) -> bytes:
    hdr = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        "WARC-Date: 2024-01-05T00:00:00Z",
    ]
    if uri:
        hdr.append(f"WARC-Target-URI: {uri}")
    hdr.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(hdr).encode() + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _http(status: int, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


BODY_A = b"<html><body>hello crawl</body></html>"
BODY_B = b"plain text payload"
WARCINFO = _record("warcinfo", None, b"software: testgen\r\n", "info1")
RESP_A = _record(
    "response", "http://a.example/x", _http(200, "text/html", BODY_A), "a1"
)
RESP_B = _record(
    "response", "http://b.example/y", _http(404, "text/plain", BODY_B), "b1"
)
REQ = _record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n\r\n", "q1")
PLAIN_FILE = WARCINFO + RESP_A + REQ + RESP_B


def test_iter_records_and_http_split():
    recs = list(iter_warc_records(PLAIN_FILE))
    assert [f["warc-type"] for f, _ in recs] == [
        "warcinfo",
        "response",
        "request",
        "response",
    ]
    status, headers, body = split_http_response(recs[1][1])
    assert (status, headers["content-type"], body) == (
        200,
        "text/html",
        BODY_A,
    )


def test_gzip_member_walk():
    gz = b"".join(
        gzip.compress(r) for r in (WARCINFO, RESP_A, REQ, RESP_B)
    )
    members = list(split_gzip_members(gz))
    assert members == [WARCINFO, RESP_A, REQ, RESP_B]


def test_parse_total_on_corruption():
    # truncated tail -> parsed records survive, one corrupt row appended
    rows = list(parse_warc_bytes("f", PLAIN_FILE + b"WARC/1.0\r\nbroken"))
    assert [r["warc_type"] for r in rows[:4]] == [
        "warcinfo",
        "response",
        "request",
        "response",
    ]
    assert rows[4]["corrupt_reason"] and rows[4]["warc_type"] is None
    # bad HTTP payload inside a response -> row-level corrupt, not fatal
    bad = _record("response", "http://c/z", b"not-http-at-all", "c1")
    (row,) = parse_warc_bytes("f", bad)
    assert row["corrupt_reason"] and row["target_uri"] == "http://c/z"
    assert row["body"] == b"not-http-at-all"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    (d / "crawl-00.warc").write_bytes(PLAIN_FILE)
    (d / "crawl-01.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in (RESP_A, RESP_B))
    )
    (d / "ignore.txt").write_bytes(b"not a warc")
    return str(d)


def test_read_warc_spark(spark, warc_dir):
    rows = read_warc(spark, warc_dir).collect()
    # glob excluded ignore.txt; 4 plain + 2 gz records
    assert len(rows) == 6
    by_file = {}
    for r in rows:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["crawl-00.warc"]) == 4
    assert len(by_file["crawl-01.warc.gz"]) == 2
    responses = [
        r
        for r in rows
        if r["warc_type"] == "response" and r["corrupt_reason"] is None
    ]
    assert len(responses) == 4  # RESP_A + RESP_B in each file
    a = next(r for r in responses if r["target_uri"] == "http://a.example/x")
    assert a["http_status"] == 200
    assert a["content_type"] == "text/html"
    assert bytes(a["body"]) == BODY_A
    assert all(r["corrupt_reason"] is None for r in rows)


# --- totality fuzz: the parser must never raise, only dead-letter -----------

import zlib as _zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.one_of(
        st.binary(max_size=400),
        # valid-file mutations: slice, splice garbage, flip gzip magic
        st.tuples(st.integers(0, len(PLAIN_FILE)), st.binary(max_size=20)).map(
            lambda t: PLAIN_FILE[: t[0]] + t[1]
        ),
        st.integers(0, 200).map(
            lambda n: _zlib.compress(PLAIN_FILE)[:n] + b"\x1f\x8b"
        ),
    )
)
def test_parse_warc_bytes_is_total(buf):
    rows = list(parse_warc_bytes("fuzz", buf))
    for r in rows:
        assert set(r) == {
            "path",
            "record_id",
            "warc_type",
            "target_uri",
            "warc_date",
            "http_status",
            "content_type",
            "body",
            "corrupt_reason",
        }
    # corruption, if any, is confined to at most one trailing framing
    # row plus per-record HTTP rows — never an exception


def test_cdx_offsets_allow_record_level_seek(spark, warc_dir):
    """The CDX contract: for every indexed member,
    bytes[offset : offset+length] is a self-contained gzip stream
    whose record matches the index row — the seek a 100 TB reader
    performs instead of scanning the file."""
    import gzip as _gzip
    import os as _os

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.warc import (
        build_cdx,
        iter_warc_records,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
    )
    rows = build_cdx(files).collect()
    assert len(rows) == 2 and all(r["corrupt_reason"] is None for r in rows)
    raw = open(
        _os.path.join(warc_dir, "crawl-01.warc.gz"), "rb"
    ).read()
    for r in rows:
        member = raw[r["member_offset"] : r["member_offset"] + r["member_length"]]
        fields, _ = next(iter_warc_records(_gzip.decompress(member)))
        assert fields["warc-record-id"] == r["record_id"]
        assert fields["warc-target-uri"] == r["target_uri"]
    # offsets tile the file exactly: contiguous, fully covering
    spans = sorted((r["member_offset"], r["member_length"]) for r in rows)
    assert spans[0][0] == 0
    assert spans[0][0] + spans[0][1] == spans[1][0]
    assert spans[1][0] + spans[1][1] == len(raw)


def test_cdx_dead_letters_non_gzip(spark, tmp_path):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.warc import (
        build_cdx,
    )

    (tmp_path / "junk.warc.gz").write_bytes(b"plainly not gzip")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    (row,) = build_cdx(files).collect()
    assert row["corrupt_reason"] == "not a gzip warc file"
    assert row["member_offset"] is None


def test_read_via_cdx_equals_full_read(spark, warc_dir):
    """Seek-based reads through the index reproduce the full-file
    parse exactly (for the gz file the index covers), even after an
    arbitrary repartition of the index — record-level parallelism
    without file boundaries."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.warc import (
        build_cdx,
        read_warc_via_cdx,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
    )
    cdx = build_cdx(files).repartition(4)
    got = read_warc_via_cdx(cdx).collect()
    want = [
        r
        for r in read_warc(spark, warc_dir).collect()
        if r["path"].endswith(".warc.gz")
    ]

    def key(r):
        return (
            r["record_id"],
            r["warc_type"],
            r["target_uri"],
            r["http_status"],
            bytes(r["body"]) if r["body"] is not None else None,
        )

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 2


def test_read_via_cdx_dead_letters_stale_spans(spark, tmp_path):
    """A CDX that has gone stale (file rewritten/truncated under it)
    must dead-letter each bad span, never fail the task: corrupt
    member bytes raise zlib.error, truncated spans raise EOFError —
    neither subclasses OSError, so this pins the full catch set."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.warc import (
        CDX_SCHEMA,
        build_cdx,
        read_warc_via_cdx,
    )

    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in (RESP_A, RESP_B)))
    files = spark.read.format("binaryFile").load(str(tmp_path))
    stale = [r.asDict() for r in build_cdx(files).collect()]
    assert len(stale) == 2

    # rewrite the file under the index: member 1's deflate stream is
    # garbled past the 10-byte gzip header (zlib.error); the file is
    # then truncated mid-member-2 (EOFError).
    raw = bytearray(p.read_bytes())
    m1, m2 = sorted(stale, key=lambda r: r["member_offset"])
    for i in range(m1["member_offset"] + 10, m1["member_offset"] + 30):
        raw[i] ^= 0xFF
    p.write_bytes(bytes(raw[: m2["member_offset"] + 12]))

    got = read_warc_via_cdx(
        spark.createDataFrame(stale, schema=CDX_SCHEMA)
    ).collect()
    assert len(got) == 2
    assert all(
        r["corrupt_reason"] is not None
        and r["corrupt_reason"].startswith("bad member span")
        and r["record_id"] is None
        for r in got
    )
