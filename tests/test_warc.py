"""WARC source: record framing, type filter, gzip decode, and the
end-to-end guarantee — a crawl archive feeds the extract pipeline and
produces byte-identical markdown to the same rows read from parquet.

Cross-engine value equality for the staged roundtrip is covered by the
parametrized oracle gate in test_driver_contract.py
(``source_warc_scan``); these pin the parser semantics directly.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pytest

from paper2llm_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_bytes,
    warc_record,
)

TS = datetime(2026, 3, 1, 12, 30, tzinfo=timezone.utc)


def test_roundtrip_framing_and_type_filter():
    blob = warc_bytes(
        [
            ("https://a.test/1", TS, b"<html>one</html>", "en"),
            ("https://a.test/2", TS, b"%PDF-1.4 fake", "de"),
        ]
    ) + warc_record("request", "https://a.test/1", TS, b"GET / HTTP/1.1")
    recs = list(iter_warc_records(blob))
    # warcinfo + 2 responses + request all FRAME correctly...
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "response", "response", "request",
    ]
    assert recs[1][1] == b"<html>one</html>"
    assert recs[2][1] == b"%PDF-1.4 fake"
    assert recs[1][0]["warc-target-uri"] == "https://a.test/1"
    assert recs[1][0]["warc-date"] == "2026-03-01T12:30:00Z"
    assert recs[2][0]["warc-identified-content-language"] == "de"


def test_payload_containing_warc_magic_does_not_split_record():
    # boundaries must come from Content-Length, never marker scanning
    evil = b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\n</html>"
    blob = warc_bytes([("https://a.test/e", TS, evil, "en")])
    recs = [(h, p) for h, p in iter_warc_records(blob)
            if h["warc-type"] == "response"]
    assert len(recs) == 1 and recs[0][1] == evil


def test_truncated_archive_raises():
    blob = warc_bytes([("https://a.test/1", TS, b"payload", "en")])
    with pytest.raises(ValueError):
        list(iter_warc_records(blob[:-12]))  # cut into the payload


def test_read_warc_plain_and_gzip(spark, tmp_path):
    recs = [
        ("https://a.test/1", TS, b"<html>one</html>", "en"),
        ("https://a.test/2", TS, b"<html>zwei</html>", "de"),
    ]
    (tmp_path / "a.warc").write_bytes(warc_bytes(recs[:1]))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(warc_bytes(recs[1:])))
    rows = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert set(rows) == {"https://a.test/1", "https://a.test/2"}
    assert bytes(rows["https://a.test/1"]["html"]) == b"<html>one</html>"
    assert rows["https://a.test/2"]["lang"] == "de"
    assert rows["https://a.test/1"]["warc_ts"] == datetime(2026, 3, 1, 12, 30)
    assert rows["https://a.test/1"]["text"] == ""


def test_read_warc_sniffs_gzip_magic_not_suffix(spark, tmp_path):
    """ADVICE r2: a gzip archive without .gz (and a .gz holding raw
    WARC) must parse by magic-byte detection instead of failing the
    partition."""
    recs1 = [("https://m.test/gzip-no-suffix", TS, b"<html>a</html>", "en")]
    recs2 = [("https://m.test/suffix-not-gzip", TS, b"<html>b</html>", "en")]
    (tmp_path / "misnamed.warc").write_bytes(gzip.compress(warc_bytes(recs1)))
    (tmp_path / "raw.warc.gz").write_bytes(warc_bytes(recs2))
    rows = {r["url"] for r in read_warc(spark, str(tmp_path)).collect()}
    assert rows == {
        "https://m.test/gzip-no-suffix",
        "https://m.test/suffix-not-gzip",
    }


def test_read_warc_flushes_bounded_chunks(spark, tmp_path, monkeypatch):
    """The mapInPandas output is a sequence of bounded frames, never one
    archive-sized copy: with a 3-row flush threshold, 10 records still
    arrive complete and correct."""
    from paper2llm_spark.sources import warc as warc_mod

    monkeypatch.setattr(warc_mod, "WARC_FLUSH_ROWS", 3)
    recs = [
        (f"https://c.test/{i}", TS, f"<html>{i}</html>".encode(), "en")
        for i in range(10)
    ]
    (tmp_path / "c.warc").write_bytes(warc_bytes(recs))
    rows = {r["url"]: bytes(r["html"])
            for r in warc_mod.read_warc(spark, str(tmp_path)).collect()}
    assert len(rows) == 10
    assert rows["https://c.test/7"] == b"<html>7</html>"


def test_read_warc_parse_error_names_the_file(spark, tmp_path):
    (tmp_path / "bad.warc").write_bytes(b"WARC/1.0\r\nWARC-Type: response")
    with pytest.raises(Exception, match="bad.warc"):
        read_warc(spark, str(tmp_path)).collect()


def test_warc_input_feeds_pipeline_byte_identical(spark):
    """The switch-over story: the same corpus through WARC archives and
    through the parquet pages table must extract byte-identically."""
    import __spark_entry__ as entry
    from paper2llm_spark.plans.extract import extract_documents
    from paper2llm_spark.sources.warc import _stage_warc

    sf = "/root/testdata/sf0.001"
    via_parquet = {
        r["url"]: r["markdown"]
        for r in extract_documents(
            entry._synth_pages(spark, sf), mode="placeholder"
        ).select("url", "markdown").collect()
    }
    via_warc = {
        r["url"]: r["markdown"]
        for r in extract_documents(
            read_warc(spark, _stage_warc(sf)), mode="placeholder"
        ).select("url", "markdown").collect()
    }
    assert via_warc == via_parquet and len(via_warc) > 0


def test_wet_sink_deterministic_and_complete(spark, tmp_path):
    """Two writes of the same frame produce byte-identical archives;
    the manifest accounts for every row; the reader recovers every
    payload."""
    from paper2llm_spark.sources.warc import write_wet

    docs = spark.createDataFrame(
        [(f"https://a.test/{i}", f"text body {i}") for i in range(20)],
        "url string, text string",
    )
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = write_wet(docs, d1, n_files=4).collect()
    m2 = write_wet(docs, d2, n_files=4).collect()
    assert sum(r["n_records"] for r in m1) == 20
    bytes1 = {r["path"].split("/")[-1]: open(r["path"], "rb").read() for r in m1}
    bytes2 = {r["path"].split("/")[-1]: open(r["path"], "rb").read() for r in m2}
    assert bytes1 == bytes2  # mtime pinned, sorted partitions
    back = read_warc(spark, d1).collect()
    assert {r["url"]: bytes(r["html"]).decode() for r in back} == {
        f"https://a.test/{i}": f"text body {i}" for i in range(20)
    }


def test_wat_sink_metadata_records_and_filter(spark, tmp_path):
    """WAT archives hold WARC `metadata` records: the default reader
    (content types) must skip them entirely, the metadata-typed scan
    must recover every envelope byte-for-byte; two writes are
    byte-identical."""
    from paper2llm_spark.sources.warc import read_warc, write_wat

    meta = spark.createDataFrame(
        [(f"https://a.test/{i}", '{"url":"u","links":[]}') for i in range(12)],
        "url string, text string",
    )
    d1, d2 = str(tmp_path / "wat1"), str(tmp_path / "wat2")
    m1 = write_wat(meta, d1, n_files=3).collect()
    m2 = write_wat(meta, d2, n_files=3).collect()
    assert sum(r["n_records"] for r in m1) == 12
    bytes1 = {r["path"].split("/")[-1]: open(r["path"], "rb").read() for r in m1}
    bytes2 = {r["path"].split("/")[-1]: open(r["path"], "rb").read() for r in m2}
    assert bytes1 == bytes2
    assert all(name.endswith(".warc.wat.gz") for name in bytes1)
    # default (content) scan skips metadata records entirely
    assert read_warc(spark, d1).count() == 0
    back = read_warc(spark, d1, row_types=("metadata",)).collect()
    assert len(back) == 12
    assert all(bytes(r["html"]).decode() == '{"url":"u","links":[]}'
               for r in back)


def test_wat_envelope_fields_parse_back(spark):
    """The synthesized WAT envelope round-trips through archive bytes
    into parsed title/link fields for every document."""
    import __spark_entry__ as entry_mod

    from paper2llm_spark.sources.warc import WAT_LINKS, wat_roundtrip

    rows = wat_roundtrip(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r["n_links"] == WAT_LINKS for r in rows)
    assert all(r["title"].startswith("Doc ") for r in rows)
