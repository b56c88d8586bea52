"""Golden pins for pii_redact and dedup_incremental."""

from __future__ import annotations

from kafka_streams_spark.operators.dedup import dedup_incremental
from kafka_streams_spark.operators.text import pii_redact


def test_pii_redact_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or see https://ex.com/a?x=1 now"),
            (2, "server 10.0.0.1 is down"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_redactions) for r in pii_redact(df).collect()}
    assert got[1] == ("mail me at <EMAIL> or see <URL> now", 2)
    assert got[2] == ("server <IP> is down", 1)
    assert got[3] == ("clean text", 0)


def test_dedup_incremental_drops_seen_and_internal_dups(spark):
    existing = spark.createDataFrame(
        [(100, "already curated")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (1, "already curated"),   # exact hit in existing → dropped
            (2, "fresh content"),     # survives
            (3, "fresh content"),     # internal dup → min-id 2 survives
            (4, "other"),             # survives
        ],
        "doc_id long, text string",
    )
    ids = sorted(r.doc_id for r in dedup_incremental(new, existing).collect())
    assert ids == [2, 4]
