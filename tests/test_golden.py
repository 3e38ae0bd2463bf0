"""Committed golden fixtures (SURVEY.md §5.2.2 — the reference's
mdt_msg_samples/ pattern): frozen per-sink counts, per-url extracted-text
hashes, and the oracle-pages aggregate fingerprint. Any semantic drift in
the generator, extractor, or routing fails here even if relative
invariants still hold. Regenerate ONLY with a deliberate
generator_version bump."""

from __future__ import annotations

import hashlib
import json
import pathlib

from pyspark.sql import functions as F

from bmspark import fixtures
from bmspark.functions import parse

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_golden_sink_counts(spark):
    golden = json.loads((FIX / "golden_sink_counts.json").read_text())
    pg = fixtures.synth_pages(spark, golden["n_rows"], partitions=8)
    parsed = parse.with_parsed(pg).select(
        "url", "lang", F.col("parsed.parse_ok").alias("ok")
    )
    got = {
        "sink_en": parsed.filter(F.col("ok") & (F.col("lang") == "en")).count(),
        "sink_romance": parsed.filter(F.col("ok") & F.col("lang").isin("fr", "es")).count(),
        "sink_other": parsed.filter(
            F.col("ok") & ~F.col("lang").isin("en", "fr", "es")
        ).count(),
        "deadletter": parsed.filter(~F.col("ok")).count(),
    }
    assert got == golden["counts"]


def test_golden_text_hashes(spark):
    golden = json.loads((FIX / "golden_text_sha.json").read_text())
    pg = fixtures.synth_pages(spark, 2000, partitions=8).filter(
        F.col("page_id") < 25
    )
    rows = parse.with_parsed(pg).select(
        "url", F.col("parsed.text_sha").alias("sha")
    ).collect()
    got = {r.url: r.sha for r in rows}
    assert got == golden


def test_golden_oracle_agg_fingerprint(spark):
    golden = json.loads((FIX / "golden_oracle_agg.json").read_text())
    agg = (
        fixtures.pages_from_documents(spark, "/root/testdata/sf0.01")
        .groupBy("domain", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    blob = json.dumps(sorted([(r.domain, r.lang, r.n) for r in agg])).encode()
    assert hashlib.sha256(blob).hexdigest() == golden["sha256"]
    assert len(agg) == golden["n_groups"]
