"""Stateful Structured Streaming operators.

The reference's only stateful operator is the running per-account sum
(PaymentTopology.java:78-88), which plain `groupBy().sum()` covers. These
wrappers provide the GENERAL forms a user would reach for next — the
Kafka Streams capabilities (windowed stores, suppression, custom
aggregators) the reference's dependency offers but the app doesn't use
(SURVEY.md §2.4), mapped to their Spark-native equivalents:

- event-time tumbling windows + watermark  → `windowed_counts`
- stream dedup with state TTL              → `dedup_stream`
- arbitrary per-key aggregation state      → `running_balances_stateful`
  (applyInPandasWithState — the `aggregate(Initializer, Aggregator)`
  analog, with explicit state schema, timeouts, and update semantics)

State lives in Spark's checkpointed state store; at scale configure the
RocksDB provider (`spark.sql.streaming.stateStore.providerClass`) —
same role as Kafka Streams' RocksDB + changelog topic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts with late-data handling; pass
    ``slide`` < ``window`` for hopping windows (each event counted in
    window/slide overlapping windows — `TimeWindows.advanceBy` analog).

    The watermark bounds state: windows older than (max event time -
    watermark) are finalized and evicted — the missing piece in the
    reference, which has no event-time logic at all (SURVEY.md §2.4).
    Works identically on a batch DataFrame (window() is just a function).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    `dropDuplicatesWithinWatermark` keeps each key only until the
    watermark passes — infinite streams, finite state. (Plain
    `dropDuplicates` on a stream grows state forever.)"""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def dedup_stream_vs_corpus(
    stream_docs: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming incremental dedup against a STATIC curated corpus — the
    streaming form of ``operators.dedup.dedup_incremental``: documents
    arriving on the stream are dropped when their content hash already
    exists in yesterday's corpus (stream-static left-anti join on
    md5(text)), and within the stream itself each hash passes at most
    once per watermark span (``dropDuplicatesWithinWatermark`` — bounded
    state on an infinite stream).

    Scale shape: the static side projects to ONE 32-char hash column
    before the join — the curated corpus's payload never loads; Spark
    re-plans the static side per micro-batch, so persist the hash
    projection (or maintain it as a compact parquet table, the streaming
    analog of the persisted signature table in
    ``dedup_incremental_fuzzy``) to avoid re-reading 100 TB of text
    every trigger.
    """
    seen = existing.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    hashed = stream_docs.withColumn("_h", F.md5(F.col(text_col)))
    fresh = hashed.join(seen, "_h", "left_anti")
    return (
        fresh.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time session windows (``SessionWindows.with(gap)`` analog):
    per-key windows that extend while events keep arriving within ``gap``
    and merge when a late event bridges two. ``F.session_window`` does
    the merging in the state store; the watermark closes and evicts
    sessions, so state stays bounded on infinite streams."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def suppress_final(windowed: DataFrame):
    """``suppress(untilWindowCloses)`` analog: emit each window exactly
    once, after the watermark passes its end — not on every update.

    In Spark this is not an operator but an OUTPUT MODE: a watermarked
    windowed aggregate under ``outputMode("append")`` holds results in
    state and appends a row only when the window is finalized. This
    helper documents that mapping; wire it as
    ``suppress_final(windowed_counts(stream)).format(...)``.
    """
    return windowed.writeStream.outputMode("append")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    before: str = "interval 1 hour",
    after: str = "interval 0 seconds",
) -> DataFrame:
    """Stream-stream join within a time window — ``KStream.join(KStream,
    JoinWindows.of(...))``. Right events pair with left events whose
    timestamp lies in ``[right_ts - before, right_ts + after]``.

    Both sides carry watermarks AND the join condition carries the time
    range — that pair is what lets Spark expire join state (without the
    range bound, both sides buffer forever). Alias the sides ``l`` / ``r``
    in ``on``."""
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    rng = (
        (F.col(f"l.{left_ts}") >= F.col(f"r.{right_ts}") - F.expr(before))
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{right_ts}") + F.expr(after))
    )
    return l.join(r, on & rng)


def running_balances_ttl(merged: DataFrame, ttl_ms: int = 3_600_000) -> DataFrame:
    """Per-account running balance on the transformWithStateInPandas API
    (Spark 4.x arbitrary-state v2) with per-key state TTL — balances of
    inactive accounts evict automatically, which is how unbounded key
    spaces (10⁹ accounts at 100 TB) keep state finite without a manual
    compaction job.

    vs ``running_balances_stateful`` (applyInPandasWithState): same
    semantics while keys stay warm, plus typed state handles and
    TTL-driven eviction. Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — the same store Kafka Streams
    uses for exactly this job — plus the ``protobuf`` package (the
    transformWithState Python protocol). Where protobuf isn't installed
    (this container) this raises ImportError with guidance;
    ``running_balances_stateful`` is the drop-in fallback.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package, not "
            "available in this container; use running_balances_stateful "
            "(applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = BALANCE_OUTPUT_SCHEMA

    class BalanceProcessor(StatefulProcessor):
        # self-contained: imports inside, no module-global references
        def init(self, handle: StatefulProcessorHandle) -> None:
            from pyspark.sql.types import LongType, StructField, StructType

            self._state = handle.getValueState(
                "balance",
                StructType([StructField("balance", LongType())]),
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            total = 0
            for pdf in rows:
                total += int(pdf["amount"].sum())
            prev = self._state.get()
            balance = (prev[0] if prev else 0) + total
            self._state.update((balance,))
            yield _pd.DataFrame({"fromAccount": [key[0]], "balance": [balance]})

        def close(self) -> None:
            pass

    return (
        merged.select("fromAccount", "amount")
        .groupBy("fromAccount")
        .transformWithStateInPandas(
            BalanceProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


BALANCE_STATE_SCHEMA = StructType([StructField("balance", LongType())])
BALANCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("fromAccount", StringType()),
        StructField("balance", LongType()),
    ]
)


def running_balances_stateful(merged: DataFrame) -> DataFrame:
    """Per-account running balance via explicit state — the faithful
    analog of the reference's `aggregate(() -> 0L, (k, v, agg) -> agg+v,
    Materialized.as("balance"))` (PaymentTopology.java:78-88): an
    initializer (zero state), an aggregator (fold amounts into state),
    and a named queryable materialization (the emitted update stream).

    For a plain sum, `groupBy().sum()` is strictly better (no Python);
    this is the extension point for aggregates Spark can't express —
    conditional folds, per-key model state, decaying counters. One row
    per (key, batch) is emitted in update-mode semantics.

    The closure is self-contained (workers can't import this package).
    """

    def update(key, pdfs, state):
        total = 0
        for pdf in pdfs:
            total += int(pdf["amount"].sum())
        if state.exists:
            (prev,) = state.get
        else:
            prev = 0
        new_balance = prev + total
        state.update((new_balance,))
        import pandas as _pd

        yield _pd.DataFrame({"fromAccount": [key[0]], "balance": [new_balance]})

    return (
        merged.select("fromAccount", "amount")
        .groupBy("fromAccount")
        .applyInPandasWithState(
            update,
            outputStructType=BALANCE_OUTPUT_SCHEMA,
            stateStructType=BALANCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


TRANSITION_STATE_SCHEMA = StructType([StructField("last_type", StringType())])
TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("next_event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def transition_counts_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch
    :func:`~kafka_streams_spark.operators.analytics.event_transitions`
    Markov matrix: per-user transition-count DELTAS per micro-batch,
    with each user's LAST event type carried as keyed state so the
    boundary transition between two micro-batches is counted exactly
    once — the cross-batch edge a stateless per-batch lead() would drop.

    Within a batch, a user's events order by (ts, event_id) — the same
    deterministic sequence as the batch operator — and fold left from
    the stored last type. The emitted rows are additive deltas (the CMS
    changelog pattern, `streaming/sketch_stream.py`): the global matrix
    is `SUM(n) GROUP BY (event_type, next_event_type)` over the sink
    table, so replayed batches stay idempotent under the router's
    partition-overwrite discipline rather than by double-counting state.

    State is one string per user (bounded by |users|, not history);
    at 10⁹ users swap to the transformWithState TTL form exactly like
    :func:`running_balances_ttl`.

    Input columns: (user_id long, event_id long, ts long/timestamp,
    event_type string). The closure is self-contained (workers can't
    import this package).
    """

    def update(key, pdfs, state):
        import pandas as _pd

        chunks = [pdf for pdf in pdfs]
        rows = _pd.concat(chunks) if chunks else _pd.DataFrame()
        pairs: dict[tuple, int] = {}
        # NULL semantics must match the batch twin (r10 review fix):
        # NULL-ts rows have no position in a temporal sequence and are
        # filtered (analytics.py event_transitions does the same);
        # a pair whose NEXT type is NULL is dropped, a pair whose
        # SOURCE type is NULL is kept (the batch lead() + isNotNull
        # filter behavior). "have a previous event" is therefore
        # tracked separately from "the previous type was NULL".
        have_prev = bool(state.exists)
        cur = state.get[0] if state.exists else None
        if len(rows):
            rows = rows[rows["ts"].notna()]
            rows = rows.sort_values(["ts", "event_id"])
            for t in rows["event_type"]:
                if _pd.isna(t):
                    t = None
                if have_prev and t is not None:
                    pairs[(cur, t)] = pairs.get((cur, t), 0) + 1
                cur, have_prev = t, True
        if have_prev:
            state.update((cur,))
        if pairs:
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pairs),
                    "event_type": [p for p, _ in pairs],
                    "next_event_type": [n for _, n in pairs],
                    "n": list(pairs.values()),
                }
            )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
