"""Kafka Streams DSL facade over DataFrames.

A user of the reference writes a *topology*: ``builder.stream(topic)
.filter(...).branch(...).mapValues(...).merge(...).groupByKey()
.aggregate(...)`` (PaymentTopology.java:39-98). This module provides that
exact call surface — ``StreamsBuilder`` / ``KStream`` /
``KGroupedStream`` / ``KTable`` — so a topology ports line-for-line,
while every method compiles to declarative DataFrame operations that
Catalyst optimizes as one plan.

Design rules (Spark-first, not a runtime port):
- A ``KStream`` is a DataFrame plus the *name of its key column*. Kafka
  Streams keys drive partitioning; in Spark the grouping column does, so
  "re-keying" is just recording which column the next groupBy will use —
  Catalyst plans the hash Exchange only where an aggregation/join needs
  it (the analog of the broker repartition topic,
  PaymentTopology.java:76-77, appears as an Exchange, and ``mapValues``
  vs ``map`` needs no hand care — SURVEY.md §4.1).
- "Lambdas" are **Column expressions**, not Python callables: the
  reference's inline Java lambdas (rails test PaymentTopology.java:46,
  FX arithmetic :54-68) become ``F.col(...)`` predicates/projections that
  run inside whole-stage codegen. Python functions are deliberately not
  accepted in the hot path — a row-at-a-time callable here would be a
  100× regression at scale.
- The DSL builds ONE logical plan; nothing executes until a sink/action.
  ``Topology.describe()`` is Spark's explain output (parity with
  ``topology.describe()``, TopologyController.java:20-23).

Operators the reference's Kafka Streams 2.7 dependency offers but the
demo never calls (SURVEY.md §2.4 — flatMap, selectKey, repartition,
foreach, cogroup, reduce, count, windowed aggregations, suppression,
global tables, stream/table joins) are included so the DSL covers the
*capability* surface, each mapped to its native Spark form.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Topology / builder
# ---------------------------------------------------------------------------


@dataclass
class Topology:
    """The built dataflow: named sinks + named tables, all still lazy."""

    sinks: dict[str, DataFrame] = field(default_factory=dict)
    tables: dict[str, DataFrame] = field(default_factory=dict)

    def describe(self) -> str:
        """Textual plan for every sink/table — parity with
        ``topology.describe().toString()`` (TopologyController.java:20-23),
        except the text is Catalyst's optimized plan, not a node DAG."""
        parts = []
        for kind, reg in (("sink", self.sinks), ("table", self.tables)):
            for name, df in reg.items():
                plan = df._jdf.queryExecution().toString()
                parts.append(f"=== {kind}: {name} ===\n{plan}")
        return "\n".join(parts)


class StreamsBuilder:
    """Entry point, mirroring ``StreamsBuilder`` (PaymentTopology.java:39).

    Sources are DataFrames (batch or streaming — the DSL is agnostic;
    the same topology object runs under a batch action or a
    ``foreachBatch``).
    """

    def __init__(self) -> None:
        self._topology = Topology()

    def stream(self, df: DataFrame, key: str | None = None) -> "KStream":
        """``builder.stream(topic, Consumed.with(...))`` analog. ``key``
        names the column playing the record-key role (partitioning /
        groupByKey default)."""
        return KStream(df, key, self._topology)

    def table(self, df: DataFrame, key: str, order_col: str | None = None) -> "KTable":
        """``builder.table(topic)`` — a changelog read as a table: latest
        value per key. With ``order_col`` the winner is the max-order row
        (one window shuffle); without, rows are assumed already unique
        per key."""
        return KTable(_latest_per_key(df, key, order_col), key, self._topology)

    def global_table(self, df: DataFrame, key: str) -> "GlobalKTable":
        """``builder.globalTable(topic)`` — replicated-to-every-instance
        table. Spark-native form: a broadcast join side (the whole point
        of a GlobalKTable is joining without repartitioning the stream —
        exactly what ``F.broadcast`` gives)."""
        return GlobalKTable(df, key)

    def build(self) -> Topology:
        return self._topology


def _latest_per_key(df: DataFrame, key: str, order_col: str | None) -> DataFrame:
    if order_col is None:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# KStream
# ---------------------------------------------------------------------------


class KStream:
    """Record stream: DataFrame + key-column name (SURVEY.md §1.1)."""

    def __init__(self, df: DataFrame, key: str | None, topology: Topology) -> None:
        self.df = df
        self.key = key
        self._topology = topology

    def _wrap(self, df: DataFrame, key: str | None = None) -> "KStream":
        return KStream(df, key if key is not None else self.key, self._topology)

    # -- stateless record ops ------------------------------------------------

    def filter(self, predicate: Column) -> "KStream":
        """``KStream.filter`` (PaymentTopology.java:46). Predicate is a
        Column expression → pushdown-able."""
        return self._wrap(self.df.filter(predicate))

    def filter_not(self, predicate: Column) -> "KStream":
        return self._wrap(self.df.filter(~predicate))

    def map_values(self, **exprs: Column) -> "KStream":
        """``KStream.mapValues`` (PaymentTopology.java:54-68): rewrite
        value fields, key untouched. Each kwarg is column → expression;
        unlisted columns pass through. No repartition flag needed —
        Catalyst keys shuffles off groupBy columns, not projection style
        (SURVEY.md §4.1). Rewriting the KEY column is rejected — the
        mapValues contract says the key cannot change, and a silent
        rewrite would make every later group_by_key() group on the
        mutated values with no diagnostic (r10 review fix); use
        :meth:`map` to re-key."""
        if self.key and self.key in exprs:
            raise ValueError(
                f"map_values cannot rewrite the key column {self.key!r} "
                "(mapValues keeps the key) — use map() to re-key"
            )
        return self._wrap(self.df.withColumns(dict(exprs)))

    def flat_map_values(self, expr: Column, alias: str) -> "KStream":
        """``KStream.flatMapValues``: one record → N records. The array
        expression is exploded; other columns replicate."""
        return self._wrap(self.df.withColumn(alias, F.explode(expr)))

    def flat_map(
        self,
        expr: Column,
        alias: str,
        key_expr: Column | None = None,
        key_alias: str = "_key",
    ) -> "KStream":
        """``KStream.flatMap``: one record → N (key, value) records —
        the re-keying sibling of :meth:`flat_map_values` (SURVEY §2.4).
        ``expr`` is an array expression (typically array-of-structs);
        each element becomes a row bound to ``alias``. ``key_expr``
        (usually a field of the exploded element, e.g.
        ``F.col("pair.k")``) re-keys the stream — like ``map``, the
        new key only marks the grouping column; the Exchange
        materializes under the next stateful op."""
        out = self.df.withColumn(alias, F.explode(expr))
        if key_expr is not None:
            out = out.withColumn(key_alias, key_expr)
            return self._wrap(out, key=key_alias)
        return self._wrap(out)

    def select_key(self, expr: Column, alias: str = "_key") -> "KStream":
        """``KStream.selectKey``: re-key without touching the value. In
        Kafka Streams this marks the stream for repartition; here it just
        records the new grouping column — the Exchange materializes only
        under a downstream stateful op."""
        return self._wrap(self.df.withColumn(alias, expr), key=alias)

    def map(self, key_expr: Column, key_alias: str, **value_exprs: Column) -> "KStream":
        """``KStream.map`` (PaymentTopology.java:76): new key + new value."""
        df = self.df.withColumn(key_alias, key_expr).withColumns(dict(value_exprs))
        return self._wrap(df, key=key_alias)

    def process(self, fn, schema) -> "KStream":
        """Processor-API analog (``KStream.process`` /
        ``transformValues``): arbitrary per-batch logic the expression
        language can't state. ``fn`` is an Arrow-batched
        ``mapInPandas`` generator (Iterator[pd.DataFrame] →
        Iterator[pd.DataFrame]) — the slow path by design; reach for it
        only after Column expressions genuinely can't express the
        semantics. The closure must be self-contained (imports inside):
        workers can't assume this package is importable."""
        return self._wrap(self.df.mapInPandas(fn, schema=schema))

    def peek(self, name: str, *metrics: Column) -> "KStream":
        """``KStream.peek`` (PaymentTopology.java:43,47,72). Semantically a
        no-op; with metric expressions it becomes ``df.observe`` so the
        observation shows up in query progress without a second scan."""
        if metrics:
            return self._wrap(self.df.observe(name, *metrics))
        return self

    def branch(self, *predicates: Column) -> list["KStream"]:
        """``KStream.branch`` (PaymentTopology.java:50-53,91-93):
        first-match split; records matching no predicate are DROPPED (no
        catch-all leg — SURVEY.md §2.1 op 4). First-match is encoded as
        pred_i AND NOT any(pred_0..i-1), so overlapping predicates keep
        Kafka Streams semantics exactly. Predicates are evaluated
        null-safely (NULL counts as false, the boolean a Kafka Streams
        Predicate would return): under raw three-valued logic a NULL
        from an EARLIER predicate poisoned the ~any(...) term and
        dropped the row from every leg — including a leg whose own
        predicate was TRUE — diverging from sources/branched.route_tag
        on the same topology (r10 review fix)."""
        legs = []
        seen: Column | None = None
        for p in predicates:
            pn = p.eqNullSafe(F.lit(True))
            cond = pn if seen is None else pn & ~seen
            legs.append(self._wrap(self.df.filter(cond)))
            seen = pn if seen is None else seen | pn
        return legs

    def merge(self, other: "KStream") -> "KStream":
        """``KStream.merge`` (PaymentTopology.java:71): UNION ALL / bag."""
        return self._wrap(self.df.unionByName(other.df))

    def repartition(self, num_partitions: int | None = None) -> "KStream":
        """``KStream.repartition()``: explicit shuffle on the key (or
        round-robin at the cluster default parallelism for a keyless
        stream — the argless form used to crash with a bare TypeError
        there, r10 review fix). ``num_partitions`` must be >= 1 when
        given (a falsy-zero check used to silently ignore 0). Rarely
        needed — prefer letting the next stateful op plan it."""
        if num_partitions is not None and num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        cols = [F.col(self.key)] if self.key else []
        if num_partitions is not None:
            return self._wrap(self.df.repartition(num_partitions, *cols))
        if not cols:
            default = self.df.sparkSession.sparkContext.defaultParallelism
            return self._wrap(self.df.repartition(default))
        return self._wrap(self.df.repartition(*cols))

    # -- joins ---------------------------------------------------------------

    def join_global(
        self, table: "GlobalKTable", on: Column, how: str = "inner"
    ) -> "KStream":
        """``KStream.join(GlobalKTable)``: enrich without repartitioning
        the stream — compiled to a broadcast hash join, the Spark form of
        a replicated table."""
        return self._wrap(self.df.join(F.broadcast(table.df), on, how))

    def join_table(self, table: "KTable", on: list[str] | Column, how: str = "inner") -> "KStream":
        """``KStream.join(KTable)``: stream-table enrichment. Shuffles
        both sides on the join key unless the table is small enough for
        AQE to broadcast."""
        return self._wrap(self.df.join(table.df, on, how))

    def join_windowed(
        self,
        other: "KStream",
        on: Column,
        left_ts: str,
        right_ts: str,
        before: str = "interval 1 hour",
        after: str = "interval 1 hour",
    ) -> "KStream":
        """``KStream.join(KStream, JoinWindows)``: stream-stream join
        where events pair only within a time window. Compiles to an
        equi-join with a range predicate — on streams, add watermarks on
        both sides first and Spark bounds the join state
        (kafka_streams_spark.streaming.stateful.interval_join).

        When both sides carry this stream's key column, the RIGHT copy
        is dropped after the join: the raw condition join kept both,
        so the result's claimed key was ambiguous and every stateful
        continuation (group_by_key, select, to) crashed with
        AMBIGUOUS_REFERENCE (r10 review fix) — in Kafka Streams a
        windowed join yields a single-keyed stream."""
        l, r = self.df.alias("l"), other.df.alias("r")
        rng = (
            (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(before))
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(after))
        )
        joined = l.join(r, on & rng)
        if self.key and self.key in self.df.columns and self.key in other.df.columns:
            joined = joined.drop(F.col(f"r.{self.key}"))
        return self._wrap(joined)

    # -- grouping ------------------------------------------------------------

    def group_by_key(self) -> "KGroupedStream":
        """``KStream.groupByKey`` (PaymentTopology.java:77)."""
        if not self.key:
            raise ValueError("stream has no key column; use group_by(expr, alias)")
        return KGroupedStream(self.df, self.key, self._topology)

    def group_by(self, expr: Column, alias: str) -> "KGroupedStream":
        """``KStream.groupBy``: re-key + group in one step."""
        return KGroupedStream(self.df.withColumn(alias, expr), alias, self._topology)

    # -- sinks ---------------------------------------------------------------

    def to(self, name: str) -> DataFrame:
        """``KStream.to(topic)`` (PaymentTopology.java:96-97): register a
        named sink on the topology. Execution is the caller's choice —
        batch write, streaming router leg, or Kafka sink
        (sources/kafka.to_kafka_sink)."""
        self._topology.sinks[name] = self.df
        return self.df

    def foreach(self, fn: Callable[[Iterable], None]) -> None:
        """``KStream.foreach``: terminal side-effecting op. Driver-side
        iteration over ``toLocalIterator`` — deliberately NOT a
        per-executor Python callback; use ``to()`` + a real sink for
        anything at scale."""
        for row in self.df.toLocalIterator():
            fn(row)


# ---------------------------------------------------------------------------
# Grouped stream / windowing
# ---------------------------------------------------------------------------


class KGroupedStream:
    def __init__(self, df: DataFrame, key: str, topology: Topology) -> None:
        self.df = df
        self.key = key
        self._topology = topology

    def aggregate(self, agg: Column, materialized_as: str | None = None) -> "KTable":
        """``KGroupedStream.aggregate(Initializer, Aggregator,
        Materialized.as(name))`` (PaymentTopology.java:78-88). The
        (init, fold) pair is expressed as an aggregate Column — for the
        reference's running sum, ``F.sum("amount")``; the initializer is
        the aggregate's identity. Folds no aggregate expression can
        state go to streaming.stateful.running_balances_stateful
        (applyInPandasWithState).

        ``materialized_as`` registers the result as a named queryable
        table (the "balance" store, :88)."""
        out = self.df.groupBy(self.key).agg(agg)
        return self._materialize(out, materialized_as)

    def reduce(self, value_col: str, materialized_as: str | None = None) -> "KTable":
        """``KGroupedStream.reduce``: fold with the value's own type —
        for numeric values this is sum (the only reduce shape the
        reference's value types admit)."""
        return self.aggregate(F.sum(value_col).alias(value_col), materialized_as)

    def count(self, alias: str = "count", materialized_as: str | None = None) -> "KTable":
        """``KGroupedStream.count``."""
        return self.aggregate(F.count("*").alias(alias), materialized_as)

    def windowed_by(
        self,
        ts_col: str,
        duration: str,
        advance: str | None = None,
        grace: str | None = None,
    ) -> "TimeWindowedKStream":
        """``groupedStream.windowedBy(TimeWindows.of(d).advanceBy(a)
        .grace(g))``: tumbling when ``advance`` is None, hopping
        otherwise. Event-time windows the reference never uses
        (SURVEY.md §2.4) but its dependency offers. ``grace`` is the
        late-data allowance — Spark's watermark: on a streaming input
        it bounds window state AND (with :meth:`KTable.suppress`) sets
        when a window is final; on batch it is a no-op (every window is
        already closed)."""
        return TimeWindowedKStream(
            self.df, self.key, ts_col, duration, advance, self._topology,
            grace=grace,
        )

    def session_windowed_by(
        self, ts_col: str, gap: str, grace: str | None = None
    ) -> "SessionWindowedKStream":
        """``windowedBy(SessionWindows.with(gap).grace(g))``. ``grace``
        = watermark, as in :meth:`windowed_by`; on a stream Spark
        REQUIRES it for session windows (unbounded gap-merge state
        otherwise), and with :meth:`KTable.suppress` it sets when a
        session is final."""
        return SessionWindowedKStream(
            self.df, self.key, ts_col, gap, self._topology, grace=grace
        )

    def _materialize(self, df: DataFrame, name: str | None) -> "KTable":
        if name:
            self._topology.tables[name] = df
        return KTable(df, self.key, self._topology)


class TimeWindowedKStream:
    """Tumbling/hopping windowed aggregation → one ``F.window`` groupBy.

    Hopping windows in Spark are the same operator with a slide duration;
    each row lands in duration/advance windows (window-assign explode is
    internal, no hand-rolled fan-out)."""

    def __init__(
        self, df, key, ts_col, duration, advance, topology, grace=None
    ) -> None:
        self.df, self.key, self.ts_col = df, key, ts_col
        self.duration, self.advance = duration, advance
        self.grace = grace
        self._topology = topology

    def aggregate(self, agg: Column, materialized_as: str | None = None) -> "KTable":
        win = (
            F.window(F.col(self.ts_col), self.duration, self.advance)
            if self.advance
            else F.window(F.col(self.ts_col), self.duration)
        )
        src = self.df
        if self.grace is not None and src.isStreaming:
            # the grace period is the watermark: it must bind BEFORE the
            # aggregation (Spark sizes window state off it), which is
            # why suppression is declared here, not invented post-agg
            src = src.withWatermark(self.ts_col, self.grace)
        out = (
            src.groupBy(win.alias("window"), F.col(self.key))
            .agg(agg)
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "*",
            )
            .drop("window")
        )
        if materialized_as:
            self._topology.tables[materialized_as] = out
        t = KTable(out, self.key, self._topology)
        t._windowed = True
        t._graced = self.grace is not None
        return t

    def count(self, alias: str = "count", materialized_as: str | None = None) -> "KTable":
        return self.aggregate(F.count("*").alias(alias), materialized_as)


class SessionWindowedKStream:
    """Session windows via ``F.session_window`` — gap-merged per key by
    the engine (no window-function prev-ts reconstruction needed)."""

    def __init__(self, df, key, ts_col, gap, topology, grace=None) -> None:
        self.df, self.key, self.ts_col, self.gap = df, key, ts_col, gap
        self.grace = grace
        self._topology = topology

    def aggregate(self, agg: Column, materialized_as: str | None = None) -> "KTable":
        src = self.df
        if self.grace is not None and src.isStreaming:
            src = src.withWatermark(self.ts_col, self.grace)
        out = (
            src.groupBy(
                F.session_window(F.col(self.ts_col), self.gap).alias("w"), F.col(self.key)
            )
            .agg(agg)
            .select(
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "*",
            )
            .drop("w")
        )
        if materialized_as:
            self._topology.tables[materialized_as] = out
        t = KTable(out, self.key, self._topology)
        t._windowed = True
        t._graced = self.grace is not None
        return t

    def count(self, alias: str = "count", materialized_as: str | None = None) -> "KTable":
        return self.aggregate(F.count("*").alias(alias), materialized_as)


def cogroup(
    streams: list[tuple[KGroupedStream, Column]],
    materialized_as: str | None = None,
    fill: dict | None = None,
) -> "KTable":
    """``KGroupedStream.cogroup(...).aggregate(...)``: N keyed streams
    folded into ONE table, each with its own aggregator.

    Spark-first shape: aggregate each stream (map-side partial combine
    shrinks every side before any network), then full-outer join the
    small per-key results. Equivalent to the shared-state fold whenever
    each aggregator is commutative/associative — which is what Kafka
    Streams requires of cogroup aggregators anyway.

    A key absent from one stream gets NULL in that stream's aggregate
    column; Kafka Streams' initializer-seeded fold would show the
    initializer value instead. The facade models one OUTPUT COLUMN per
    aggregator rather than one shared accumulator, so the identity is
    per-column and caller-declared: pass ``fill={"cnt": 0}`` to
    coalesce a column to its aggregator's identity (r7 review: the old
    docstring promised a coalesce it never applied)."""
    assert streams, "cogroup needs at least one grouped stream"
    acc: DataFrame | None = None
    key = streams[0][0].key
    topology = streams[0][0]._topology
    for g, agg in streams:
        part = g.df.groupBy(F.col(g.key).alias(key)).agg(agg)
        acc = part if acc is None else acc.join(part, key, "full_outer")
    for c, v in (fill or {}).items():
        acc = acc.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    if materialized_as:
        topology.tables[materialized_as] = acc
    return KTable(acc, key, topology)


# ---------------------------------------------------------------------------
# KTable / GlobalKTable
# ---------------------------------------------------------------------------


class KTable:
    """Changelog table: latest value per key (SURVEY.md §1.1). Batch: the
    aggregation result; streaming: the same plan under update/complete
    output mode."""

    def __init__(self, df: DataFrame, key: str, topology: Topology) -> None:
        self.df = df
        self.key = key
        self._topology = topology
        self._windowed = False
        self._graced = False
        self._suppressed = False

    @property
    def output_mode(self) -> str:
        """The streaming output mode this table's semantics require:
        ``append`` after :meth:`suppress` (emit-final — a window's row
        appears once, when the watermark closes it), else ``update``
        (Kafka Streams' default continuous-refinement changelog)."""
        return "append" if self._suppressed else "update"

    def suppress(self) -> "KTable":
        """``KTable.suppress(untilWindowCloses(unbounded()))``: emit
        only the FINAL value per window, never intermediates — the
        emit-final contract. Spark-native form: suppression is not a
        post-aggregation operator but a property of HOW the windowed
        aggregate runs — watermark (declared as the window's ``grace``,
        bound BEFORE the groupBy) + ``append`` output mode, which emits
        each window exactly once when the watermark passes its end. This
        method validates the plan supports that (windowed + graced) and
        flips :attr:`output_mode`; the runner passes it to
        ``writeStream.outputMode``. On a batch DataFrame it is the
        identity — every window is already closed, so final == latest,
        exactly Kafka Streams' semantics at log end."""
        if not self._windowed:
            raise ValueError(
                "suppress() needs a windowed aggregation — emit-final is "
                "meaningless for an unwindowed table (it would never emit)"
            )
        if self.df.isStreaming and not self._graced:
            raise ValueError(
                "suppress() on a stream needs windowed_by(..., grace=...): "
                "without a watermark Spark cannot know when a window is "
                "final, and append mode would emit nothing"
            )
        t = self._derived(self.df)
        t._windowed, t._suppressed = True, True
        return t

    def _derived(self, df: DataFrame) -> "KTable":
        """Rebuild with SELF's window/grace/suppression flags intact. A
        row subset (filter) or value recompute (map_values) of a
        windowed aggregate is still that windowed aggregate — dropping
        the flags here made ``windowed_by(...).count().filter(...)``
        reject suppress() and, worse, let ``suppress().filter(...)``
        silently revert :attr:`output_mode` to ``update``, re-emitting
        the intermediate window refinements emit-final forbids."""
        t = KTable(df, self.key, self._topology)
        t._windowed = self._windowed
        t._graced = self._graced
        t._suppressed = self._suppressed
        return t

    def filter(self, predicate: Column) -> "KTable":
        return self._derived(self.df.filter(predicate))

    def map_values(self, **exprs: Column) -> "KTable":
        return self._derived(self.df.withColumns(dict(exprs)))

    def join(self, other: "KTable", how: str = "inner") -> "KTable":
        """KTable-KTable join: equi-join on the shared key. Window and
        grace flags carry over from the LEFT table (the join preserves
        its row grain); the result is emit-final only when BOTH sides
        are — one update-mode side re-opens rows, so ``_suppressed``
        is the conjunction."""
        t = self._derived(self.df.join(other.df, self.key, how))
        t._suppressed = self._suppressed and other._suppressed
        return t

    def to_stream(self) -> KStream:
        """``KTable.toStream()``: the changelog as a record stream."""
        return KStream(self.df, self.key, self._topology)

    def query(self, key_value) -> object | None:
        """Interactive query: point lookup, None == the 404 case
        (BalanceController.java:29-34)."""
        rows = self.df.filter(F.col(self.key) == key_value).limit(1).collect()
        if not rows:
            return None
        row = rows[0]
        others = [c for c in self.df.columns if c != self.key]
        return row[others[0]] if len(others) == 1 else row.asDict()


class GlobalKTable:
    """Replicated lookup table — always joined via ``F.broadcast``."""

    def __init__(self, df: DataFrame, key: str) -> None:
        self.df = df
        self.key = key
