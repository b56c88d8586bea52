"""Pin the events.ts normalization contract across BOTH physical parquet
layouts the driver has shipped: TIMESTAMP(NANOS) (read as epoch-nanos
BIGINT via nanosAsLong) and timestamp[us] (read as TIMESTAMP_NTZ).

load_table must yield the SAME canonical representation for both: an
epoch-NANOS BIGINT truncated to µs precision, equal to DuckDB's
`epoch_ns(ts)` on the same file — the invariant every event-time
operator and oracle is built on.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_spark.sources.testdata import load_table

ROWS = [
    (1, 1704067200_000001, 10, "click", 1.5, "{}"),
    (2, 1704067201_123456, 11, "purchase", 2.5, "{}"),
    (3, 1704070000_999999, 10, "view", 0.5, "{}"),
]


def _write_events(tmp_path, ts_type, ts_unit_divisor):
    """Write a tiny events.parquet with ts in the given arrow type.
    ROWS carry epoch-MICROS; divisor converts to the target unit."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(
                [r[1] // ts_unit_divisor for r in ROWS], pa.int64()
            ).cast(ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type,divisor",
    [
        (pa.timestamp("us"), 1),  # current driver layout → TIMESTAMP_NTZ
        (pa.timestamp("ns"), 1),  # legacy layout → nanosAsLong BIGINT
    ],
    ids=["timestamp_us", "timestamp_ns"],
)
def test_ts_normalizes_to_epoch_nanos(spark, tmp_path, ts_type, divisor):
    # timestamp("ns") arrow cast from int64 interprets the ints as NANOS,
    # so scale the µs fixture up to nanos for that layout.
    if ts_type == pa.timestamp("ns"):
        sf = _write_events_ns(tmp_path)
    else:
        sf = _write_events(tmp_path, ts_type, divisor)

    got = {
        r.event_id: r.ts
        for r in load_table(spark, sf, "events").select("event_id", "ts").collect()
    }
    want = {eid: us * 1000 for eid, us, *_ in ROWS}
    assert got == want

    # DuckDB reads the same file; epoch_ns must agree (µs-truncated).
    duck = {
        eid: (ns // 1000) * 1000
        for eid, ns in duckdb.sql(
            f"SELECT event_id, epoch_ns(ts) FROM '{sf}/events.parquet'"
        ).fetchall()
    }
    assert got == duck


def _write_events_ns(tmp_path):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] * 1000 for r in ROWS], pa.int64()).cast(
                pa.timestamp("ns")
            ),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)
