"""Bucketed co-located join: the pay-the-shuffle-once layout.

Pins the scale fact on the PHYSICAL PLAN: a join of two tables bucketed
on the join key with equal bucket counts plans zero shuffle exchanges,
while the same join on plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest

from kafka_streams_spark.plans.audit import audit
from kafka_streams_spark.sources.bucketed import drop_bucketed, write_bucketed
from kafka_streams_spark.sources.testdata import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast join path so the exchange count is the
    thing under test (at real scale neither side broadcasts)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    try:
        write_bucketed(
            orders, "orders_b", ["o_orderkey"], 4,
            str(tmp_path / "orders_b"), sort_cols=["o_orderkey"],
        )
        write_bucketed(
            lineitem, "lineitem_b", ["l_orderkey"], 4,
            str(tmp_path / "lineitem_b"), sort_cols=["l_orderkey"],
        )
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")

        joined_b = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        a_bucketed = audit(joined_b)
        assert a_bucketed.num_exchanges == 0  # co-located: no shuffle
        assert "SortMergeJoin" in a_bucketed.join_strategies

        # control: identical join on plain parquet shuffles both sides
        joined_p = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_quantity", "o_totalprice")
        assert audit(joined_p).num_exchanges == 2

        # same rows either way
        assert joined_b.count() == joined_p.count()
    finally:
        drop_bucketed(spark, "orders_b")
        drop_bucketed(spark, "lineitem_b")


def test_bucketed_aggregation_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    """groupBy on the bucket key also rides the bucketed layout."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    try:
        write_bucketed(
            lineitem, "lineitem_agg_b", ["l_orderkey"], 4,
            str(tmp_path / "lineitem_agg_b"),
        )
        agg = spark.table("lineitem_agg_b").groupBy("l_orderkey").count()
        assert audit(agg).num_exchanges == 0
        plain = lineitem.groupBy("l_orderkey").count()
        assert audit(plain).num_exchanges == 1
        assert agg.count() == plain.count()
    finally:
        drop_bucketed(spark, "lineitem_agg_b")


def test_write_ordered_shards_global_order(spark, tmp_path):
    """Shards are range-partitioned and internally sorted: reading files
    in shard order yields the global order."""
    import glob

    from pyspark.sql import functions as F

    from kafka_streams_spark.sources.bucketed import write_ordered_shards

    df = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    out = str(tmp_path / "shards")
    write_ordered_shards(df.orderBy(F.rand(seed=3)), out, ["k"], num_shards=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    seen = []
    for f in files:
        ks = [r["k"] for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks)  # internally sorted
        seen.append(ks)
    flat = [k for ks in seen for k in ks]
    # range partitioning: file boundaries respect the global order
    assert flat == sorted(flat)
    assert sorted(flat) == list(range(1000))
