"""Semantic pins for funnel and cohort-retention: the strict-ordering
and first-seen-bucketing behaviors the value-oracle can't distinguish
from plausible-but-wrong unordered formulations."""

from __future__ import annotations

from pyspark.sql import functions as F


def _funnel_core(e):
    """The funnel's stacked-aggregation core over a (user_id,
    event_type, ts) frame — mirrors analytics.funnel_conversions."""
    t1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    t2 = (
        e.join(t1, "user_id")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2")
        )
    )
    t3 = (
        e.join(t2, "user_id")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).alias("t3")
        )
    )
    return t3.agg(
        F.count("t1").alias("n_step1"),
        F.count("t2").alias("n_step2"),
        F.count("t3").alias("n_step3"),
    )


def test_funnel_requires_strict_order(spark):
    """User A: view→click→purchase (full conversion). User B:
    purchase→view→click (purchase precedes the funnel → stops at
    click). User C: click only (never enters). An unordered conditional
    count would report B as converted."""
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "purchase", 50), (2, "view", 100), (2, "click", 200),
        (3, "click", 100),
    ]
    e = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = _funnel_core(e).head()
    assert (got["n_step1"], got["n_step2"], got["n_step3"]) == (2, 2, 1)


def test_funnel_uses_earliest_qualifying_event(spark):
    """The stage-2 timestamp is the EARLIEST click after the first
    view — a later purchase between two clicks still converts."""
    rows = [
        (1, "view", 100), (1, "click", 150), (1, "purchase", 175), (1, "click", 200),
    ]
    e = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = _funnel_core(e).head()
    assert (got["n_step1"], got["n_step2"], got["n_step3"]) == (1, 1, 1)


def test_cohort_retention_offsets(spark, sf_dir):
    """Every offset is ≥0 (nobody is active before their first-seen
    week) and each cohort's offset-0 cell equals its member count."""
    from kafka_streams_spark.operators.analytics import cohort_retention
    from kafka_streams_spark.sources.testdata import load_table

    ret = cohort_retention(spark, sf_dir).collect()
    assert all(r["week_offset"] >= 0 for r in ret)
    week0 = {r["cohort_week"]: r["n_users"] for r in ret if r["week_offset"] == 0}
    e = load_table(spark, sf_dir, "events")
    cohort_sizes = {
        r["cohort_week"]: r["n"]
        for r in e.groupBy("user_id")
        .agg(F.expr(f"min(ts) div {7*24*3600*10**9}").alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # offset-0 always exists per cohort: the first-seen event itself
    assert week0 == cohort_sizes
