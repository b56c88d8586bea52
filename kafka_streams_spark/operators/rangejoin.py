"""Interval (range) join — the second "operator Spark lacks" after
:mod:`asof` (SURVEY.md §2.5 custom-operator scope), built as a
composition of DataFrame ops.

Semantics: for every left row, match the right rows with the same key
and ``right.ts ∈ [left.ts - before, left.ts + after]`` (DuckDB/SQL's
``r.ts BETWEEN l.ts - b AND l.ts + a`` inequality join). Spark plans a
raw inequality join as BroadcastNestedLoopJoin / cartesian-per-key —
O(|L|·|R|) pair evaluations per key, a scale-killer the moment a key is
hot.

Bucketed formulation instead: with span ``W = before + after``, a left
row's window covers at most TWO width-W time buckets, so

    right → bucket floor(ts / W)                (map-only)
    left  → explode to the ≤2 covering buckets  (map-only, fan-out ≤ 2)
    equi-join on (key, bucket)                  (one hash shuffle)
    exact BETWEEN filter on the candidates      (codegen)

Candidate pairs are bounded by per-bucket density — the true temporal
locality of the data — not by |L|·|R|. The join is a plain shuffled
hash join, so AQE skew splitting and map-side pruning all apply. At
100 TB this is the difference between a loop join that never finishes
and one shuffle proportional to the real match volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    before: int,
    after: int,
    how: str = "inner",
) -> DataFrame:
    """Match right rows with ``r[right_ts]`` in the closed interval
    ``[l[left_ts] - before, l[left_ts] + after]`` and the same `key`.

    Timestamps are integers (the engine's epoch-nanos convention — see
    ``load_table``); `before`/`after` are non-negative offsets in the
    same unit. Output: all left columns + all right columns except the
    join key (right's ts column must be distinctly named). ``how`` may
    be ``inner`` or ``left`` (left keeps unmatched left rows with null
    right columns; implemented as inner + anti-join backfill so the
    bucket fan-out never produces per-bucket null duplicates).
    """
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    span = max(before + after, 1)
    lo = F.col(left_ts) - F.lit(before)
    hi = F.col(left_ts) + F.lit(after)

    # Exact integer floor-division: (x - pmod(x, s)) is divisible by s,
    # so `div` (truncating) equals floor. Never routes ~1.7e18 epoch-nanos
    # through a double (2^53 mantissa) the way F.floor(x / s) would.
    def _bucket_expr(colname_expr: str) -> F.Column:
        e = f"({colname_expr})"
        return F.expr(f"({e} - pmod({e}, {span}L)) div {span}L")

    l_b = left.withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    _bucket_expr(f"{left_ts} - {before}L"),
                    _bucket_expr(f"{left_ts} + {after}L"),
                )
            )
        ),
    )
    r_b = right.withColumn(
        "_bkt", _bucket_expr(right_ts)
    ).withColumnRenamed(key, "_rkey")

    matched = (
        l_b.join(
            r_b,
            (F.col(key) == F.col("_rkey")) & (l_b["_bkt"] == r_b["_bkt"]),
            "inner",
        )
        .filter(F.col(right_ts).between(lo, hi))
        .drop("_bkt", "_rkey")
    )
    if how == "inner":
        return matched
    # the left path consumes `matched` TWICE (output union + anti-join
    # backfill) and the explode+shuffle subtree does not share through
    # exchange reuse — materialize it once (r7 review wave 4)
    from kafka_streams_spark.functions.partitioning import materialize_shared

    matched = materialize_shared(matched)
    rcols = [c for c in right.columns if c != key]
    unmatched = left.join(matched.select(key, left_ts), [key, left_ts], "left_anti")
    for c in rcols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return matched.unionByName(unmatched)


def clicks_before_purchase(
    events: DataFrame, window_ns: int = 1_800_000_000_000
) -> DataFrame:
    """Attribution composition over the `events` table: for each
    purchase, the number and cents-value of clicks by the same user in
    the preceding ``window_ns`` (default 30 min). Returns
    (event_id, user_id, n_clicks, click_value_cents) for purchases with
    at least one qualifying click (inner interval join).

    Shape: both sides are filtered scans of the same source (pushed to
    parquet), the interval join is one equi-shuffle on (user, bucket),
    and the per-purchase rollup reuses the join's partitioning.

    Interval convention (r10 review note): CLOSED on both ends — a
    click stamped at exactly the purchase timestamp counts as
    "preceding" (coarse clocks log same-interaction events with equal
    ts; ties attribute deterministically rather than dropping). Pass a
    strict predicate downstream if simultaneous events must not
    attribute.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = interval_join(
        purchases, clicks, key="user_id", left_ts="p_ts", right_ts="c_ts",
        before=window_ns, after=0,
    )
    from kafka_streams_spark.operators.analytics import _cents

    return joined.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum(_cents("c_value")).alias("click_value_cents"),
    )
