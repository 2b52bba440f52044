"""XML ingestion (plans/codec_parity.py::xml_pages_extract + the
file-level format("xml") source): Spark 4's native XML parser against
direct expectations — rowTag record splitting, nested structs, numeric
coercion, entity decoding, and malformed-record behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.codec_parity import (
    _XML_SCHEMA,
    xml_pages_extract,
)

SF = "/root/testdata/sf0.001"


def test_from_xml_extract_matches_generators(spark):
    rows = xml_pages_extract(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["title"] == f"doc_{r['doc_id']}"
        assert r["ns"] == r["doc_id"] % 4
        assert r["id_ok"] is True
        assert r["rev_id"] == (r["doc_id"] * 7 + 13) % 1000
        # entity decoding: the generated body embeds &amp; / &lt; / &gt;
        assert r["body"].endswith(f" & <end_{r['doc_id']}>")
        assert r["body_chars"] == len(r["body"])


def test_file_xml_source_rowtag_split(spark, tmp_path):
    """A wiki-dump-shaped file: one XML document, many <page> records —
    format('xml') must split on rowTag and apply the same schema the
    registry query uses with from_xml."""
    pages = "\n".join(
        f"<page><title>doc_{i}</title><ns>{i % 4}</ns><id>{i}</id>"
        f"<revision><id>{(i * 7 + 13) % 1000}</id>"
        f"<text>body &amp; {i}</text></revision></page>"
        for i in range(25)
    )
    path = tmp_path / "dump.xml"
    path.write_text(f"<mediawiki>\n{pages}\n</mediawiki>")
    df = (
        spark.read.format("xml")
        .option("rowTag", "page")
        .schema(_XML_SCHEMA)
        .load(str(path))
    )
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 25
    for i in range(25):
        r = got[i]
        assert r["title"] == f"doc_{i}"
        assert r["ns"] == i % 4
        assert r["revision"]["id"] == (i * 7 + 13) % 1000
        assert r["revision"]["text"] == f"body & {i}"


def test_from_xml_malformed_is_null_not_error(spark):
    """PERMISSIVE default: a broken page yields NULL fields, it does
    not fail the job — the dead-letter posture every ingestion source
    in this repo follows."""
    df = spark.createDataFrame(
        [("<page><title>ok</title><ns>1</ns></page>",), ("<page><title>broken",)],
        "xml string",
    ).select(F.from_xml("xml", _XML_SCHEMA).alias("p"))
    rows = df.select("p.title", "p.ns").collect()
    assert ("ok", 1) in [(r["title"], r["ns"]) for r in rows]
    assert len(rows) == 2
