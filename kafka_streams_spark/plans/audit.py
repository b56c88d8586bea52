"""Physical-plan audits: make scale properties testable.

"Would this plan survive a 100× scale-up?" is a question about the
physical plan, not the output rows: did the filter reach the parquet
scan, did the scan prune to the projected columns, how many Exchanges
(shuffles) does a pipeline pay, did the small side broadcast, is the
aggregation partial (map-side combine), is the top-k a
TakeOrderedAndProject rather than a global sort. This module parses the
executed plan into those facts so tests can PIN them — a regression that
silently adds a shuffle or un-pushes a filter fails CI, not the 100 TB
run.

(The reference has no analog: Kafka Streams runs the topology exactly as
written, and its only plan introspection is ``topology.describe()`` —
SURVEY.md §4.1. This is the part of the engine Catalyst gives us that a
topology-as-code runtime cannot.)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    """Parsed facts about a DataFrame's executed (physical) plan."""

    plan: str
    formatted: str

    # -- shuffles ----------------------------------------------------------
    @property
    def num_exchanges(self) -> int:
        """Shuffle count (hash/range/round-robin/single repartitions).
        Broadcast exchanges are counted separately — they ship a small
        table, not the data. RoundRobinPartitioning (df.repartition(n)
        with no key — e.g. spread() without `by`) is a full-data
        shuffle and MUST count, or a silently-added repartition passes
        every pinned exchange budget (r7 review wave 5, verified).
        ``ReusedExchange`` lines embed the REUSED exchange's own text
        ("ReusedExchange [...], Exchange hashpartitioning(...)") and
        must not count — reuse makes the plan cheaper, not more
        shuffled (r10 review fix, verified on an executed self-join
        plan: 4 counted vs 3 real)."""
        return sum(
            len(re.findall(r"Exchange (?:hash|range|Single|RoundRobin)", line))
            for line in self.plan.splitlines()
            if "ReusedExchange" not in line
        )

    @property
    def num_hash_exchanges(self) -> int:
        """Hash/range/single-partition shuffles only — the exchanges a
        query's *algorithm* requires. Excludes the round-robin
        ``REPARTITION_BY_NUM`` widening exchanges that ``spread()``
        inserts as a parallelism floor on serial scan inputs: those are
        no-ops at real scale (the floor repartition fires only when the
        current partitioning is below the target) and would otherwise
        make every exchange-budget pin fail on an optimization that
        adds no shuffle at scale (r14 driver finding: the knn_batch pin
        broke on exactly this). Pins that must reject ANY added
        shuffle, including a floor, keep using ``num_exchanges``."""
        return sum(
            len(re.findall(r"Exchange (?:hash|range|Single)", line))
            for line in self.plan.splitlines()
            if "ReusedExchange" not in line
        )

    @property
    def num_broadcasts(self) -> int:
        return sum(
            line.count("BroadcastExchange")
            for line in self.plan.splitlines()
            if "ReusedExchange" not in line
        )

    # -- joins -------------------------------------------------------------
    @property
    def join_strategies(self) -> list[str]:
        return re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)",
            self.plan,
        )

    # -- scans -------------------------------------------------------------
    @property
    def pushed_filters(self) -> list[str]:
        """Filters that reached the parquet reader (one entry per scan).
        Same-line only: an unclosed bracket (a truncated plan string)
        must yield NO match, not run across newlines into unrelated
        plan text and report a downstream Filter as pushed (r10 review
        fix — :func:`audit` also raises the metadata length cap so the
        bracket is never truncated in the first place)."""
        return re.findall(r"PushedFilters: \[([^\]\n]*)\]", self.plan)

    @property
    def partition_filters(self) -> list[str]:
        """Predicates applied to PARTITION columns at planning time (one
        entry per scan) — these prune whole directories before any file
        is listed or read. The r13 BalanceStore point-lookup pin: a
        lookup whose bucket equality does NOT appear here scans all 64
        buckets. Same-line only, same rationale as ``pushed_filters``."""
        return re.findall(r"PartitionFilters: \[([^\]\n]*)\]", self.plan)

    def partition_filter_pruned(self, col: str) -> bool:
        """True iff some scan carries an EQUALITY partition filter on
        ``col`` — the shape that prunes to a single directory (an
        ``isnotnull`` alone keeps every partition)."""
        return any(
            re.search(rf"\({re.escape(col)}#\d+L? = ", f)
            for f in self.partition_filters
        )

    @property
    def read_schemas(self) -> list[str]:
        """Column sets actually read from parquet (one per scan).
        Bracket-depth aware: nested types (``array<int>``,
        ``struct<...>`` fields) contain ``>`` themselves, so a naive
        ``[^>]*`` both truncated nested schemas and returned NOTHING
        for wide scans whose metadata Spark abbreviated — making every
        column-pruning pin pass vacuously (r10 review fix)."""
        out = []
        for m in re.finditer(r"ReadSchema: struct<", self.plan):
            depth, start = 1, m.end()
            for j in range(start, len(self.plan)):
                c = self.plan[j]
                if c == "<":
                    depth += 1
                elif c == ">":
                    depth -= 1
                    if depth == 0:
                        out.append(self.plan[start:j])
                        break
                elif c == "\n":
                    break  # truncated metadata: refuse a partial schema
        return out

    @property
    def num_scans(self) -> int:
        return len(re.findall(r"FileScan|Scan parquet", self.plan))

    # -- execution shape ---------------------------------------------------
    @property
    def num_codegen_spans(self) -> int:
        """Distinct whole-stage-codegen spans — `*(N)` operator prefixes
        in the executed plan (plus any explicit WholeStageCodegen nodes)."""
        ids = set(re.findall(r"\*\((\d+)\)", self.plan))
        ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", self.formatted))
        return len(ids)

    @property
    def has_partial_aggregation(self) -> bool:
        """Map-side combine: a HashAggregate below the Exchange. Shuffle
        volume is per-(task, key), not per-row — load-bearing for any
        high-cardinality groupBy at scale."""
        return bool(
            re.search(r"partial_", self.plan)
            or re.search(r"Functions: \[partial", self.formatted)
        )

    @property
    def has_take_ordered(self) -> bool:
        """Top-k as per-partition heaps + driver merge of k·partitions
        rows — never a global sort shuffle."""
        return "TakeOrderedAndProject" in self.plan

    @property
    def num_unpartitioned_windows(self) -> int:
        """WindowExec nodes with NO partition spec — every row moves to
        ONE partition, the classic scale-killer (the r4 ``corpus_drift``
        regression class). A ``Window`` plan line prints its bracket
        groups as ``[funcs]``, then optionally ``[partSpec]`` and/or
        ``[orderSpec]``: one group = global unpartitioned; two groups =
        unpartitioned iff the trailing group is an ORDER spec (contains
        an ASC/DESC direction — partition specs never print one); three
        groups = partitioned. Must be zero unless the window provably
        runs over a bounded table (per-day spine, ≤k head,
        centroid/bucket tables) — see
        tests/test_plan_audit.py::test_no_unpartitioned_window_outside_whitelist."""
        n = 0
        for line in self.plan.splitlines():
            m = re.search(r"(?:^|[\s+:-])Window (\[.*)$", line)
            if not m:
                continue
            groups = m.group(1).split("], [")
            if len(groups) == 1 or (
                len(groups) == 2
                and re.search(r" (ASC|DESC)\b", groups[-1])
            ):
                n += 1
        return n

    @property
    def scan_columns(self) -> list[set[str]]:
        """Top-level column-name sets per scan, split bracket-depth
        aware (nested types carry commas)."""
        out = []
        for schema in self.read_schemas:
            cols, depth, start = set(), 0, 0
            for j, c in enumerate(schema + ","):
                if c in "<([":
                    depth += 1
                elif c in ">)]":
                    depth -= 1
                elif c == "," and depth == 0:
                    field = schema[start:j]
                    cols.add(field.split(":", 1)[0].strip())
                    start = j + 1
            out.append(cols)
        return out

    def scans_column(self, col: str) -> bool:
        """Exact column-name membership — substring matching made
        ``scans_column("id")`` true for a scan reading only ``doc_id``
        (r10 review fix)."""
        return any(col in cols for cols in self.scan_columns)

    def filter_pushed(self, fragment: str) -> bool:
        return any(fragment in f for f in self.pushed_filters)


def jobs_run_during(spark, fn):
    """Run ``fn()`` and return (result, number of Spark jobs it
    triggered). Query *construction* must trigger zero — a ``.count()``
    or ``.head()`` while building a plan is a hidden extra pass over the
    corpus at 100 TB. (Legitimate exceptions — e.g. an index-training
    KMeans fit — should be explicit and counted deliberately.)"""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or ())
    result = fn()
    after = set(tracker.getJobIdsForGroup(None) or ())
    return result, len(after - before)


def audit(df: DataFrame) -> PlanAudit:
    """Parse the executed plan. The plan STRING is rendered under a
    raised ``spark.sql.maxMetadataStringLength`` (default 100): at the
    default, a wide scan's ``ReadSchema``/``PushedFilters`` metadata is
    abbreviated mid-bracket, the parsers return nothing, and every
    pruning/pushdown pin passes or fails vacuously — the exact
    regression class this module exists to catch (r10 review fix,
    verified on a full ``lineitem`` scan: ``read_schemas == []`` at the
    default cap)."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "100000")
    try:
        qe = df._jdf.queryExecution()
        return PlanAudit(
            plan=qe.executedPlan().toString(),
            formatted=qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ),
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
