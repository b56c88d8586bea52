"""Stream-stream interval join, session windows, and suppress-final
(append-mode window finalization) — the stateful streaming capabilities
beyond the reference's single running aggregate (SURVEY.md §2.4)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streams_spark.streaming.stateful import (
    interval_join,
    session_counts,
    windowed_counts,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
    ]
)


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, ts, user, etype):
    return {"event_id": eid, "ts": ts, "user_id": user, "event_type": etype}


def test_interval_join_streams(spark, tmp_path):
    """Clicks join purchases that happen within 1 hour AFTER the click;
    out-of-window pairs must not appear, and the range predicate plus
    watermarks make the join state bounded."""
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    _write_jsonl(
        os.path.join(clicks_dir, "a.json"),
        [
            _ev(1, "2024-01-01T00:00:00Z", "u1", "click"),
            _ev(2, "2024-01-01T05:00:00Z", "u2", "click"),
        ],
    )
    _write_jsonl(
        os.path.join(buys_dir, "a.json"),
        [
            _ev(10, "2024-01-01T00:30:00Z", "u1", "purchase"),  # in window
            _ev(11, "2024-01-01T09:00:00Z", "u2", "purchase"),  # too late
        ],
    )
    clicks = spark.readStream.schema(EVENT_SCHEMA).json(clicks_dir)
    buys = spark.readStream.schema(EVENT_SCHEMA).json(buys_dir)
    joined = interval_join(
        clicks.select(F.col("ts").alias("cts"), "user_id"),
        buys.select(F.col("ts").alias("bts"), F.col("user_id").alias("buyer")),
        on=F.col("l.user_id") == F.col("r.buyer"),
        left_ts="cts",
        right_ts="bts",
        before="interval 1 hour",
        after="interval 0 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("ij_out").collect()
        assert {r["user_id"] for r in rows} == {"u1"}
    finally:
        q.stop()


def test_suppress_final_append_mode(spark, tmp_path):
    """Append mode == suppress(untilWindowCloses): a window emits nothing
    while open, exactly one row after the watermark passes its end."""
    src = str(tmp_path / "src")
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            _ev(1, "2024-01-01T00:10:00Z", "u1", "click"),
            _ev(2, "2024-01-01T00:20:00Z", "u1", "click"),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    win = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        win.writeStream.format("memory")
        .queryName("supp_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("supp_out").count() == 0  # window still open

        # an event far past the window end advances the watermark beyond
        # 01:00 + 30m -> the 00:00-01:00 window finalizes and emits once
        _write_jsonl(
            os.path.join(src, "b2.json"),
            [_ev(3, "2024-01-01T03:00:00Z", "u1", "click")],
        )
        q.processAllAvailable()
        rows = spark.table("supp_out").collect()
        assert len(rows) == 1
        assert rows[0]["n_events"] == 2
        assert str(rows[0]["window_start"]) == "2024-01-01 00:00:00"
    finally:
        q.stop()


def test_session_counts_streaming(spark, tmp_path):
    """Session merge across micro-batches: two bursts 10 min apart fuse
    into one session; a 2-hour-later burst opens a second."""
    src = str(tmp_path / "src")
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            _ev(1, "2024-01-01T00:00:00Z", "u1", "click"),
            _ev(2, "2024-01-01T00:10:00Z", "u1", "click"),
            _ev(3, "2024-01-01T02:00:00Z", "u1", "click"),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        counts = sorted(r["n_events"] for r in spark.table("sess_out").collect())
        assert counts == [1, 2]
    finally:
        q.stop()


def test_late_event_beyond_watermark_ignored(spark, tmp_path):
    """Late-data contract: once the watermark closes a window (append
    mode emitted it), an event for that window arriving later is
    dropped — state for the window is gone and no correction row
    appears. (The reference has no event-time semantics at all; this
    pins OUR documented behavior.)"""
    src = str(tmp_path / "src")
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [_ev(1, "2024-01-01T00:10:00Z", "u1", "click")],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    win = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        win.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(  # advance watermark past 01:30 -> window emits
            os.path.join(src, "b2.json"),
            [_ev(2, "2024-01-01T05:00:00Z", "u1", "click")],
        )
        q.processAllAvailable()
        assert spark.table("late_out").count() == 1
        _write_jsonl(  # late event for the closed 00:00 window
            os.path.join(src, "b3.json"),
            [_ev(3, "2024-01-01T00:20:00Z", "u1", "click")],
        )
        q.processAllAvailable()
        rows = spark.table("late_out").collect()
        assert len(rows) == 1 and rows[0]["n_events"] == 1  # unchanged
    finally:
        q.stop()


def test_session_late_bridge_event_merges_two_sessions(spark, tmp_path):
    """The session-window MERGE rule across micro-batches: batch 1
    creates two separate sessions (00:00 and 00:50, gap 30 min); a
    LATE bridging event at 00:25 in batch 2 is within the gap of both,
    so the state store must fuse all three into ONE session."""
    src = str(tmp_path / "src")
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [
            _ev(1, "2024-01-01T00:00:00Z", "u1", "click"),
            _ev(2, "2024-01-01T00:50:00Z", "u1", "click"),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_bridge")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        counts = sorted(r["n_events"] for r in spark.table("sess_bridge").collect())
        assert counts == [1, 1]  # two separate sessions before the bridge
        _write_jsonl(
            os.path.join(src, "b2.json"),
            [_ev(3, "2024-01-01T00:25:00Z", "u1", "click")],
        )
        q.processAllAvailable()
        rows = spark.table("sess_bridge").collect()
        assert [r["n_events"] for r in rows] == [3]  # fused into one
        assert str(rows[0]["session_start"]) == "2024-01-01 00:00:00"
        assert str(rows[0]["session_end"]) == "2024-01-01 01:20:00"  # last + gap
    finally:
        q.stop()
