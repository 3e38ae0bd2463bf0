"""Parse-stage contracts: byte-identical extraction per url (the
north_rule's per-row invariant), malformed-input safety, zlib transport
decompression — the graft of the reference's codec golden tests
(mdt_msg_samples/ pattern, SURVEY.md §5.1)."""

from __future__ import annotations

import hashlib
import zlib

import pytest
from pyspark.sql import functions as F

from bmspark import fixtures, oracle_extract
from bmspark.functions import parse


@pytest.fixture(scope="module")
def pages_parsed(spark):
    pg = fixtures.synth_pages(spark, 1200, partitions=8)
    out = parse.with_parsed(pg).select(
        "url", "html", "text", "page_id",
        F.col("parsed.title").alias("p_title"),
        F.col("parsed.text").alias("p_text"),
        F.col("parsed.text_sha").alias("p_sha"),
        F.col("parsed.links").alias("p_links"),
        F.col("parsed.parse_ok").alias("p_ok"),
    )
    return out.collect()


def test_byte_identity_per_url(pages_parsed):
    """UDF output ≡ pure-Python oracle, byte-for-byte, for every row —
    including malformed ones."""
    for r in pages_parsed:
        ref = oracle_extract.extract(bytes(r.html) if r.html else b"")
        assert r.p_title == ref["title"], r.url
        assert r.p_text == ref["text"], r.url
        assert r.p_sha == hashlib.sha256(ref["text_bytes"]).hexdigest(), r.url
        assert list(r.p_links or []) == ref["links"], r.url
        assert r.p_ok == ref["parse_ok"], r.url


def test_wellformed_rows_roundtrip_ground_truth(pages_parsed):
    """For well-formed rows the extracted text equals the generator's
    ground-truth text column exactly (the reference-vs-graft invariant)."""
    ok = [r for r in pages_parsed if r.text is not None]
    assert len(ok) > 1000
    for r in ok:
        assert r.p_text == r.text
        assert r.p_sha == hashlib.sha256(r.text.encode()).hexdigest()


def test_malformed_rows_flagged_not_thrown(pages_parsed):
    """5% malformed corpus: parse never throws; parse_ok=False routes to
    deadletter (reference drops + counts; we flag + keep)."""
    bad = [r for r in pages_parsed if r.text is None]
    assert len(bad) == 1200 // 20
    assert all(not r.p_ok for r in bad)


def test_zlib_transport_decompression():
    """ST-framing zlib flag analog: compressed payload decodes identically."""
    raw = b"<html><head><title>T</title></head><body><p>hello world</p></body></html>"
    assert oracle_extract.extract(zlib.compress(raw)) == oracle_extract.extract(raw)


def test_non_utf8_payload_bytes_preserved():
    """Byte-identity through the Arrow hop for non-utf8 payloads: the
    text_bytes sha must reflect the raw bytes, never a lossy str round-trip."""
    payload = b"<html><body><p>caf\xc3\xa9 ok</p><p>\xff\xfe broken</p></body></html>"
    ref = oracle_extract.extract(payload)
    assert ref["text"] is None and not ref["parse_ok"]
    assert ref["text_bytes"] == b"caf\xc3\xa9 ok\n\xff\xfe broken"


@pytest.mark.parametrize("payload", [
    b"", b"<", b"<html>", b"<p>unclosed", b"<title></title>",
    b"\x00\x01\x02", b"<p></p>" * 1000,
    "<p>日本語テキスト</p>".encode(),
    b'<a href="x">y</a>' * 50,
])
def test_edge_payloads_never_throw(payload):
    r = oracle_extract.extract(payload)
    assert isinstance(r["text_bytes"], bytes)
    assert isinstance(r["n_links"], int)


def test_udtf_link_extractor(spark):
    """U5 escape hatch: the UDTF yields one row per link, equal to
    exploding the parse struct's links array."""
    from bmspark import fixtures
    from pyspark.sql import functions as F

    spark.udtf.register("extract_links", parse.LinkExtractor)
    fixtures.pages_from_documents(spark, "/root/testdata/sf0.001").limit(
        50
    ).createOrReplaceTempView("pages_udtf")
    got = spark.sql(
        "SELECT url, f.pos, f.href FROM pages_udtf, LATERAL extract_links(html) f"
    )
    want = (
        parse.with_parsed(spark.table("pages_udtf"))
        .select("url", F.posexplode("parsed.links").alias("pos", "href"))
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_hypothesis_fuzz_extractor():
    """Property: extract() total over arbitrary bytes (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=2048))
    def prop(payload):
        r = oracle_extract.extract(payload)
        assert isinstance(r["text_bytes"], bytes)
        assert r["n_links"] == len(r["links"])

    prop()
