"""WARC container round-trip + malformed-input behavior (sources/warc.py)."""

import pytest

from geospatial_analysis_integrity_tool_spark.sources.warc import (
    parse_warc_bytes,
    warc_record_bytes,
)


def test_roundtrip_two_records():
    payload_a = b"<html><p>alpha</p></html>"
    payload_b = b"bytes \x00\xff with CRLF \r\n\r\n inside"  # framing must not split on content
    data = warc_record_bytes(
        "https://example.org/en/page/1", "2024-01-01T00:00:00Z", payload_a
    ) + warc_record_bytes(
        "https://example.org/fr/page/2", "2024-01-01T00:02:17Z", payload_b
    )
    recs = parse_warc_bytes(data)
    assert [r["target_uri"] for r in recs] == [
        "https://example.org/en/page/1",
        "https://example.org/fr/page/2",
    ]
    assert recs[0]["payload"] == payload_a
    assert recs[1]["payload"] == payload_b  # Content-Length framing, not regex split
    assert recs[0]["warc_type"] == "resource"
    assert recs[0]["record_id"].startswith("<urn:uuid:")


def test_record_id_deterministic():
    a = warc_record_bytes("https://x/1", "2024-01-01T00:00:00Z", b"p")
    b = warc_record_bytes("https://x/1", "2024-01-01T00:00:00Z", b"p")
    assert a == b


def test_truncated_payload_raises():
    good = warc_record_bytes("https://x/1", "2024-01-01T00:00:00Z", b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(good[:-14])  # cut into the payload


def test_bad_version_line_raises():
    with pytest.raises(ValueError, match="bad WARC version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
