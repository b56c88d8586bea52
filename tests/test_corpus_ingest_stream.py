"""The self-growing-corpus ingest stream: cross-batch dedup against the
accepted corpus, internal dedup within a batch, quality gating, and the
batch-partition layout that makes replays idempotent."""

from __future__ import annotations

import json
import os

from kafka_streams_spark.streaming.ingest import run_corpus_ingest_stream

GOOD = (
    "the quick brown fox jumps over the lazy dog and then keeps running "
    "through the quiet forest until it finds a place to rest at last."
)
OTHER = (
    "meanwhile across the valley a completely different story unfolds in "
    "which nothing resembles the previous tale in any way at all here."
)
THIRD = (
    "a third narrative arrives later with fresh words describing rivers "
    "and mountains and the long roads that wander between distant towns."
)


def _write(src: str, name: str, rows: list[dict]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_corpus_ingest_grows_and_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two unique docs + an in-batch duplicate of the first
    _write(src, "b1.json", [
        {"doc_id": 1, "source": "s", "text": GOOD},
        {"doc_id": 2, "source": "s", "text": OTHER},
        {"doc_id": 3, "source": "s", "text": GOOD},  # in-batch dup of 1
    ])
    q = run_corpus_ingest_stream(spark, src, corpus, ckpt)
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert got == {1, 2}  # min-id winner survives the in-batch dup

        # batch 2: a cross-batch duplicate (same text as doc 1) + a new doc
        _write(src, "b2.json", [
            {"doc_id": 10, "source": "s", "text": GOOD},  # dup of corpus
            {"doc_id": 11, "source": "s", "text": THIRD},
        ])
        q.processAllAvailable()
        rows = spark.read.parquet(corpus).collect()
        assert {r["doc_id"] for r in rows} == {1, 2, 11}
        # the accepted corpus carries its batch lineage
        batches = {r["doc_id"]: r["ingest_batch"] for r in rows}
        assert batches[11] > batches[1]
    finally:
        q.stop()


def test_corpus_ingest_quality_gate(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _write(src, "b1.json", [
        {"doc_id": 1, "source": "s", "text": GOOD},
        {"doc_id": 2, "source": "s", "text": "tiny"},  # fails length gate
    ])
    q = run_corpus_ingest_stream(spark, src, corpus, ckpt, min_quality=0.75)
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert got == {1}
    finally:
        q.stop()


def test_corpus_ingest_span_removal_across_batches(spark, tmp_path):
    """remove_spans: a later batch's doc keeps only its novel tokens —
    spans already owned by the prior corpus are cut, continuously."""
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write(src, "b1.json", [{"doc_id": 1, "source": "s", "text": GOOD}])
    q = run_corpus_ingest_stream(spark, src, corpus, ckpt, remove_spans=5)
    try:
        q.processAllAvailable()
        # batch 2: novel prefix/suffix around a 6-token run lifted from GOOD
        lifted = "the quick brown fox jumps over"
        _write(src, "b2.json", [
            {"doc_id": 20, "source": "s", "text": f"fresh opening words {lifted} and a brand new ending"},
        ])
        q.processAllAvailable()
        rows = {r["doc_id"]: r for r in spark.read.parquet(corpus).collect()}
        assert set(rows) == {1, 20}
        assert rows[1]["text"] == GOOD  # prior corpus text untouched
        assert rows[20]["text"] == "fresh opening words and a brand new ending"
    finally:
        q.stop()

def test_span_removal_preserves_originals_and_rearrival_gate(spark, tmp_path):
    """r7 review wave 5: with remove_spans on, (a) a doc with NO cut
    spans must keep its ORIGINAL text (the token-normalized rebuild
    lowercases and collapses whitespace), and (b) a re-arrival of a
    byte-identical original must still be rejected by the membership
    gate even when the stored body was rewritten by span surgery — the
    gate now runs on the persisted src_md5 of the arrival text."""
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    cased = "The Quick Brown Fox KEEPS  Running far beyond every fence."
    _write(src, "b1.json", [{"doc_id": 1, "source": "s", "text": GOOD}])
    q = run_corpus_ingest_stream(spark, src, corpus, ckpt, remove_spans=5)
    try:
        q.processAllAvailable()
        # batch 2: one doc embedding a GOOD span (gets cut, body
        # rewritten) + one cased original (no cuts — must stay verbatim)
        embed = "totally new opening words " + GOOD + " and a new tail"
        _write(
            src,
            "b2.json",
            [
                {"doc_id": 2, "source": "s", "text": embed},
                {"doc_id": 3, "source": "s", "text": cased},
            ],
        )
        q.processAllAvailable()
        # batch 3: byte-identical re-arrivals of both batch-2 docs
        _write(
            src,
            "b3.json",
            [
                {"doc_id": 4, "source": "s", "text": embed},
                {"doc_id": 5, "source": "s", "text": cased},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["doc_id"]: r for r in spark.read.parquet(corpus).collect()}
    assert set(rows) == {1, 2, 3}  # re-arrivals rejected despite surgery
    assert rows[3]["text"] == cased  # no-cut doc kept verbatim
    assert GOOD not in rows[2]["text"]  # the embedded span was cut


def test_pre_upgrade_corpus_rows_stay_in_seen_set(spark, tmp_path):
    """r8 advice fix: a corpus written BEFORE src_md5 existed reads the
    column as NULL once a post-upgrade batch surfaces it in the merged
    schema — those rows must still gate re-arrivals (coalesce to the
    stored body's hash), not silently re-admit them."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # simulate a pre-upgrade corpus: one accepted partition WITHOUT the
    # src_md5 column (the old on-disk layout)
    (
        spark.createDataFrame(
            [(1, "s", GOOD)], "doc_id bigint, source string, text string"
        )
        .withColumn("ingest_batch", F.lit(900))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(corpus)
    )

    # post-upgrade stream: batch 0 lands a NEW doc (writing src_md5 and
    # surfacing the column in the merged schema), batch 1 re-delivers
    # the pre-upgrade document byte-identically
    _write(src, "b1.json", [{"doc_id": 20, "source": "s", "text": OTHER}])
    q = run_corpus_ingest_stream(spark, src, corpus, ckpt)
    try:
        q.processAllAvailable()
        _write(src, "b2.json", [{"doc_id": 30, "source": "s", "text": GOOD}])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(corpus).collect()
    # the re-arrival (doc 30) must be rejected by the membership gate
    assert {r["doc_id"] for r in rows} == {1, 20}
