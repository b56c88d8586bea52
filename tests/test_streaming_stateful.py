"""Tests for the stateful streaming operators: watermarked windows,
streaming dedup, and the applyInPandasWithState running balance."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streams_spark.streaming.stateful import (
    dedup_stream,
    running_balances_stateful,
    windowed_counts,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_batch_streaming_equivalence(spark, tmp_path):
    """The same windowed_counts transform must produce identical results
    in batch and through a file stream (batch/streaming unification is
    the engine's core design claim)."""
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01T00:50:00Z", "event_type": "click"},
        {"event_id": 3, "ts": "2024-01-01T01:10:00Z", "event_type": "click"},
        {"event_id": 4, "ts": "2024-01-01T00:20:00Z", "event_type": "view"},
    ]
    src = str(tmp_path / "src")
    _write_jsonl(os.path.join(src, "a.json"), rows)

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in windowed_counts(batch).collect()
    }
    assert expected[("2024-01-01 00:00:00", "click")] == 2
    assert expected[("2024-01-01 01:00:00", "click")] == 1

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["event_type"]): r["n_events"]
            for r in spark.table("win_counts").collect()
        }
        assert got == expected
    finally:
        q.stop()


def test_dedup_stream(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "event_type": "click"},
        {"event_id": 1, "ts": "2024-01-01T00:11:00Z", "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01T00:12:00Z", "event_type": "view"},
    ]
    src = str(tmp_path / "src")
    _write_jsonl(os.path.join(src, "a.json"), rows)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(r["event_id"] for r in spark.table("dedup_out").collect())
        assert ids == [1, 2]
    finally:
        q.stop()


def test_running_balances_stateful(spark, tmp_path):
    """Two micro-batches; state must accumulate across them exactly like
    the reference's KTable aggregate (and our groupBy().sum())."""
    from kafka_streams_spark.schema import PAYMENT_SCHEMA

    src = str(tmp_path / "src")
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            {"paymentId": "p1", "amount": 100, "currency": "GBP",
             "fromAccount": "ABC", "toAccount": "DEF", "rails": "BANK_RAILS_FOO"},
            {"paymentId": "p2", "amount": 50, "currency": "GBP",
             "fromAccount": "ABC", "toAccount": "DEF", "rails": "BANK_RAILS_FOO"},
        ],
    )
    stream = spark.readStream.schema(PAYMENT_SCHEMA).json(src)
    q = (
        running_balances_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_bal")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(
            os.path.join(src, "b2.json"),
            [{"paymentId": "p3", "amount": 25, "currency": "GBP",
              "fromAccount": "ABC", "toAccount": "DEF", "rails": "BANK_RAILS_FOO"}],
        )
        q.processAllAvailable()
        rows = spark.table("stateful_bal").collect()
        # update mode emits one row per batch; the latest must be 175
        latest = max(r["balance"] for r in rows if r["fromAccount"] == "ABC")
        assert latest == 175
    finally:
        q.stop()


def test_running_balances_ttl_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas variant: state accumulates across
    micro-batches (same contract as the applyInPandasWithState form);
    requires the RocksDB state store provider AND protobuf (absent in
    this container -> the operator raises ImportError with guidance and
    the test skips; it runs fully on a protobuf-equipped deployment)."""
    from kafka_streams_spark.schema import PAYMENT_SCHEMA
    from kafka_streams_spark.streaming.stateful import running_balances_ttl

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="protobuf"):
            running_balances_ttl(
                spark.readStream.schema(PAYMENT_SCHEMA).json(str(tmp_path))
            )
        _pytest.skip("protobuf not available: transformWithState gated")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        _write_jsonl(
            os.path.join(src, "b1.json"),
            [
                {"paymentId": "p1", "amount": 100, "currency": "GBP",
                 "fromAccount": "ABC", "toAccount": "DEF", "rails": "BANK_RAILS_FOO"},
            ],
        )
        stream = spark.readStream.schema(PAYMENT_SCHEMA).json(src)
        q = (
            running_balances_ttl(stream, ttl_ms=3_600_000)
            .writeStream.format("memory")
            .queryName("ttl_bal")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_jsonl(
                os.path.join(src, "b2.json"),
                [{"paymentId": "p2", "amount": 25, "currency": "GBP",
                  "fromAccount": "ABC", "toAccount": "DEF", "rails": "BANK_RAILS_FOO"}],
            )
            q.processAllAvailable()
            rows = spark.table("ttl_bal").collect()
            latest = max(r["balance"] for r in rows if r["fromAccount"] == "ABC")
            assert latest == 125
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_hopping_counts_batch_streaming_equivalence(spark, tmp_path):
    """Hopping windows (1h size, 30m slide): every event lands in 2
    windows, identical through batch and a file stream."""
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01T00:40:00Z", "event_type": "click"},
    ]
    src = str(tmp_path / "src_hop")
    _write_jsonl(os.path.join(src, "a.json"), rows)

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in windowed_counts(batch, slide="30 minutes").collect()
    }
    # event 1 ∈ [23:30,00:30) & [00:00,01:00); event 2 ∈ [00:00,01:00) & [00:30,01:30)
    assert expected[("2023-12-31 23:30:00", "click")] == 1
    assert expected[("2024-01-01 00:00:00", "click")] == 2
    assert expected[("2024-01-01 00:30:00", "click")] == 1

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        windowed_counts(stream, slide="30 minutes")
        .writeStream.format("memory")
        .queryName("hop_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hop"))
        .start()
    )
    q.processAllAvailable()
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.table("hop_counts").collect()
    }
    q.stop()
    assert got == expected


def test_dedup_stream_vs_corpus(spark, tmp_path):
    """Stream-static incremental dedup: docs whose content hash exists
    in the static corpus are dropped; within the stream, repeated
    content passes once; novel content passes."""
    from kafka_streams_spark.streaming.stateful import dedup_stream_vs_corpus

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    existing = spark.createDataFrame(
        [(100, "already curated content"), (101, "another known doc")],
        "doc_id bigint, text string",
    )
    rows = [
        {"doc_id": 1, "ts": "2024-01-01T00:10:00Z", "text": "already curated content"},
        {"doc_id": 2, "ts": "2024-01-01T00:11:00Z", "text": "genuinely new content"},
        {"doc_id": 3, "ts": "2024-01-01T00:12:00Z", "text": "genuinely new content"},
        {"doc_id": 4, "ts": "2024-01-01T00:13:00Z", "text": "also novel text here"},
    ]
    src = str(tmp_path / "src")
    _write_jsonl(os.path.join(src, "a.json"), rows)
    stream = spark.readStream.schema(doc_schema).json(src)
    q = (
        dedup_stream_vs_corpus(stream, existing)
        .writeStream.format("memory")
        .queryName("dedup_corpus_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.table("dedup_corpus_out").collect()
        )
        # 1 dropped (in corpus); 2 or 3 passes once (same content); 4 passes
        assert len(got) == 2 and got[0] in (2, 3) and got[1] == 4
    finally:
        q.stop()


def test_transition_counts_stateful_cross_batch(spark, tmp_path):
    """Two micro-batches; the batch-boundary transition (last event of
    batch 1 → first event of batch 2, per user) must be counted exactly
    once via the keyed state, and the summed deltas must equal the batch
    Markov matrix over the concatenated sequence."""
    from kafka_streams_spark.streaming.stateful import transition_counts_stateful

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    # user 1: a b | a  => a->b, b->a ; user 2: a | b => a->b
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            {"user_id": 1, "event_id": 1, "ts": 10, "event_type": "a"},
            {"user_id": 1, "event_id": 2, "ts": 20, "event_type": "b"},
            {"user_id": 2, "event_id": 3, "ts": 10, "event_type": "a"},
        ],
    )
    stream = spark.readStream.schema(schema).json(src)
    q = (
        transition_counts_stateful(stream)
        .writeStream.format("memory")
        .queryName("trans_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(
            os.path.join(src, "b2.json"),
            [
                {"user_id": 1, "event_id": 4, "ts": 30, "event_type": "a"},
                {"user_id": 2, "event_id": 5, "ts": 20, "event_type": "b"},
            ],
        )
        q.processAllAvailable()
        rows = spark.table("trans_counts").collect()
        from collections import defaultdict

        matrix = defaultdict(int)
        for r in rows:
            matrix[(r["event_type"], r["next_event_type"])] += r["n"]
        assert dict(matrix) == {("a", "b"): 2, ("b", "a"): 1}
    finally:
        q.stop()


def test_transition_counts_stateful_null_semantics_match_batch(spark, tmp_path):
    """r10 review fix: the streamed fold must apply the batch twin's
    NULL rules (analytics.event_transitions): NULL-ts rows are filtered
    (no position in a temporal sequence), pairs whose NEXT type is NULL
    are dropped, pairs whose SOURCE type is NULL are kept — including
    across a micro-batch boundary where the carried state itself is the
    NULL type."""
    from kafka_streams_spark.streaming.stateful import (
        transition_counts_stateful,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    # user 1 batch 1: a, (NULL ts: filtered), NULL-type  — the NULL-type
    # event ends the batch, so the state carries a NULL source type
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            {"user_id": 1, "event_id": 1, "ts": 10, "event_type": "a"},
            {"user_id": 1, "event_id": 2, "ts": None, "event_type": "zzz"},
            {"user_id": 1, "event_id": 3, "ts": 20, "event_type": None},
            {"user_id": 2, "event_id": 4, "ts": 10, "event_type": "a"},
        ],
    )
    stream = spark.readStream.schema(schema).json(src)
    q = (
        transition_counts_stateful(stream)
        .writeStream.format("memory")
        .queryName("trans_nulls")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(
            os.path.join(src, "b2.json"),
            [
                {"user_id": 1, "event_id": 5, "ts": 30, "event_type": "b"},
                {"user_id": 2, "event_id": 6, "ts": 20, "event_type": "b"},
            ],
        )
        q.processAllAvailable()
        rows = spark.table("trans_nulls").collect()
        from collections import defaultdict

        matrix = defaultdict(int)
        for r in rows:
            matrix[(r["event_type"], r["next_event_type"])] += r["n"]
        # batch semantics over user 1's ts-ordered sequence a, NULL, b:
        # (a -> NULL) dropped, (NULL -> b) kept; the zzz row never
        # participates (NULL ts). user 2: plain (a -> b).
        assert dict(matrix) == {(None, "b"): 1, ("a", "b"): 1}
    finally:
        q.stop()
