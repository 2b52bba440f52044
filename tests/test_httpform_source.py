"""HTTP form source (SURVEY.md S8): POSTed form fields become rows in
a replayable streaming source — the reference's Django ``request.POST``
ingest (views.py:24-25,41-45) with real offset semantics.

Covers: wire-format POST → spool → batch read; streaming drain;
checkpoint-restart without loss/duplication (spool files are immutable,
so any offset range re-reads identically); server crash-restart
resuming the sequence from the durable spool; and the reference's full
register() flow — POST → stream → F1-F5 validation_error."""

from __future__ import annotations

import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.validators import (
    validation_error,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.httpform import (
    register_httpform_source,
    start_form_server,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_httpform_source(spark)
    return spark


def _post(port: int, **fields) -> int:
    body = urllib.parse.urlencode(fields).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/register",
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        import json

        return json.load(resp)["seq"]


REGS = [
    dict(fname="Alice", lname="Smith", username="alice",
         password="Str0ng!pw", password1="Str0ng!pw", contact="9876543210"),
    dict(fname="B0b", lname="Jones", username="bob",  # digit in fname
         password="Str0ng!pw", password1="Str0ng!pw", contact="9876543210"),
    dict(fname="Carol", lname="King", username="carol",
         password="weak", password1="weak", contact="9876543210"),
    dict(fname="Dave", lname="Hall", username="dave",
         password="Str0ng!pw", password1="Str0ng!pw", contact="12345"),
]


def test_post_spool_batch_read(registered, tmp_path):
    spool = str(tmp_path / "spool")
    srv, _t, port = start_form_server(spool)
    try:
        seqs = [_post(port, **r) for r in REGS]
        assert seqs == [1, 2, 3, 4]  # dense, arrival-ordered
        df = registered.read.format("httpform").option("spoolDir", spool).load()
        rows = {r.seq: r for r in df.collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert rows[1].fname == "Alice" and rows[1].password == "Str0ng!pw"
        assert rows[2].fname == "B0b"
        assert df.schema["ts"].dataType.typeName() == "timestamp"
    finally:
        srv.shutdown()


def test_streaming_drain_and_validation(registered, tmp_path):
    """The reference register() flow end-to-end: POST → stream →
    verify.py rule dispatcher. One valid row, three distinct first
    failures."""
    spool = str(tmp_path / "spool")
    srv, _t, port = start_form_server(spool)
    try:
        for r in REGS:
            _post(port, **r)
        q = (
            registered.readStream.format("httpform")
            .option("spoolDir", spool)
            .load()
            .select(
                "seq",
                "username",
                validation_error(
                    F.col("fname"), F.col("lname"),
                    F.col("password"), F.col("contact"),
                ).alias("error"),
            )
            .writeStream.format("memory")
            .queryName("form_reg")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {r.seq: r.error for r in registered.sql(
                "SELECT * FROM form_reg").collect()}
        finally:
            q.stop()
        assert got == {
            1: None,
            2: "invalid_first_name",
            3: "invalid_password",
            4: "invalid_contact",
        }
    finally:
        srv.shutdown()


def test_checkpoint_restart_no_loss_no_dup(registered, tmp_path):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    srv, _t, port = start_form_server(spool)
    got: list[int] = []

    def sink(df, _bid):
        got.extend(r.seq for r in df.collect())

    def run_once():
        q = (
            registered.readStream.format("httpform")
            .option("spoolDir", spool)
            .option("maxPerBatch", 2)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        for r in REGS[:3]:
            _post(port, **r)
        run_once()
        first = sorted(got)
        # more arrivals while the query is down; restart resumes from
        # the committed offset — earlier seqs must NOT re-emit
        _post(port, **REGS[3])
        run_once()
        assert first == [1, 2, 3]
        assert sorted(got) == [1, 2, 3, 4]
    finally:
        srv.shutdown()


def test_server_restart_resumes_sequence(registered, tmp_path):
    """Crash-safety of the spool counter: a new server over an existing
    spool continues the dense sequence (derived from durable files,
    not process memory)."""
    spool = str(tmp_path / "spool")
    srv, _t, port = start_form_server(spool)
    try:
        assert _post(port, **REGS[0]) == 1
        assert _post(port, **REGS[1]) == 2
    finally:
        srv.shutdown()
    srv2, _t2, port2 = start_form_server(spool)
    try:
        assert _post(port2, **REGS[2]) == 3
        df = registered.read.format("httpform").option("spoolDir", spool).load()
        assert sorted(r.seq for r in df.collect()) == [1, 2, 3]
    finally:
        srv2.shutdown()
