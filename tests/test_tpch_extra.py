"""Semantic pins for the TPC-H-remainder queries (Q2/Q7-Q9/Q11-Q13/
Q15-Q17/Q19-Q22 shapes, adapted to the no-partsupp testdata) — the
behaviors the DuckDB value-oracle can't distinguish: tie handling,
zero-group preservation, threshold scale-freeness, disjoint bucket
coverage. Values themselves are pinned by tools/check_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_spark.operators import analytics as A


def test_q15_returns_all_ties(spark, sf_dir):
    """Every returned supplier carries exactly the max revenue — the
    MAX-equality join surfaces ties instead of picking one winner."""
    out = A.q15_top_supplier(spark, sf_dir).collect()
    assert len(out) >= 1
    revs = {r["total_revenue_x10k"] for r in out}
    assert len(revs) == 1


def test_q13_preserves_zero_order_customers(spark):
    """The priority filter lives in the LEFT JOIN's ON clause: a
    customer whose orders ALL match the excluded priority still appears
    in the c_count=0 bucket (a post-join WHERE would drop them)."""
    c = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    o = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "5-LOW"), (12, 2, "5-LOW")],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    dist = {
        r["c_count"]: r["custdist"]
        for r in per_cust.groupBy("c_count").agg(F.count("*").alias("custdist")).collect()
    }
    # cust 1: one urgent order -> 1; cust 2: only 5-LOW -> 0; cust 3: no orders -> 0
    assert dist == {1: 1, 0: 2}


def test_q12_buckets_partition_all_lineitems(spark, sf_dir):
    """Delay buckets are exhaustive and disjoint: high+low counts over
    all buckets equals the lineitem⋈orders row count."""
    from kafka_streams_spark.sources.testdata import load_table

    out = A.q12_ship_delay(spark, sf_dir)
    total = out.agg(
        F.sum(F.col("high_line_count") + F.col("low_line_count")).alias("n")
    ).head()["n"]
    l = load_table(spark, sf_dir, "lineitem")
    assert total == l.count()  # every line joins (FK integrity) & lands in one bucket


def test_q11_threshold_is_scale_free(spark, sf_dir):
    """Relative-to-mean threshold selects a small but non-empty slice
    (the fixed-fraction-of-total original degenerates to empty as the
    part count grows)."""
    from kafka_streams_spark.sources.testdata import load_table

    out = A.q11_important_parts(spark, sf_dir)
    n_sel = out.count()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert 0 < n_sel < 0.2 * n_parts


def test_q2_min_price_join_back_keeps_all_argmins(spark):
    """Two suppliers tied at a part's min price BOTH surface (argmin by
    join-back-on-equality, not a pick-one rank)."""
    l = spark.createDataFrame(
        [(1, 101, 5.0), (1, 102, 5.0), (1, 103, 9.0), (2, 101, 7.0)],
        ["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    part_min = offers.groupBy(F.col("l_partkey").alias("min_partkey")).agg(
        F.min("best_price").alias("min_price")
    )
    winners = offers.join(
        part_min,
        (F.col("l_partkey") == F.col("min_partkey"))
        & (F.col("best_price") == F.col("min_price")),
    )
    got = {(r["l_partkey"], r["l_suppkey"]) for r in winners.collect()}
    assert got == {(1, 101), (1, 102), (2, 101)}


def test_q21_sole_late_supplier_logic(spark):
    """Constructed orders: supplier A is sole-late on a 2-supplier
    order (counted); order with two late suppliers counts nobody;
    single-supplier late order counts nobody."""
    import datetime

    d = datetime.datetime
    o = spark.createDataFrame(
        [(1, d(1996, 1, 1)), (2, d(1996, 1, 1)), (3, d(1996, 1, 1))],
        ["o_orderkey", "o_orderdate"],
    ).withColumn("o_orderstatus", F.lit("F"))
    late, ontime = d(1996, 6, 1), d(1996, 1, 15)
    l = spark.createDataFrame(
        [
            # order 1: A late, B on time -> A counted
            (1, 100, late), (1, 200, ontime),
            # order 2: A and B both late -> nobody
            (2, 100, late), (2, 200, late),
            # order 3: only A, late -> nobody (single-supplier)
            (3, 100, late),
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    losf = l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    per_os = losf.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.datediff("l_shipdate", "o_orderdate") > 60, 1).otherwise(0)
        ).alias("was_late")
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.count("*").alias("n_supp"), F.sum("was_late").alias("n_late")
    )
    culprits = per_os.filter(F.col("was_late") == 1).join(
        per_o.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
        F.col("l_orderkey") == F.col("agg_orderkey"),
    )
    got = [(r["l_orderkey"], r["l_suppkey"]) for r in culprits.collect()]
    assert got == [(1, 100)]


def test_q19_build_side_pruned_before_broadcast(spark, sf_dir):
    """The factored part-only disjunction prunes the broadcast build
    side: same result as filtering after an unpruned join, with a
    3-brand build side instead of all parts."""
    from kafka_streams_spark.sources.testdata import load_table

    pruned = A.q19_discounted_revenue(spark, sf_dir).head()["revenue_x10k"]
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    unpruned = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(F.sum(A._x10k(A._disc_price())).alias("revenue_x10k"))
        .head()["revenue_x10k"]
    )
    assert pruned == unpruned


def test_q8_share_bounds_and_volume_consistency(spark, sf_dir):
    """Market share ∈ [0,1] and nation_volume ≤ total_volume per year."""
    for r in A.q8_market_share(spark, sf_dir).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["nation_volume_x10k"] <= r["total_volume_x10k"]


def test_q22_excludes_recently_active_customers(spark, sf_dir):
    """No prospect has an order on/after the cutoff (anti-join is on
    the FILTERED order set, not all orders)."""
    from kafka_streams_spark.sources.testdata import load_table

    # Rebuild the prospect set pre-aggregation to inspect membership.
    c = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
        .distinct()
    )
    nations_out = {
        r["n_name"]: r["numcust"]
        for r in A.q22_prospect_customers(spark, sf_dir).collect()
    }
    # total prospects equals the independent recomputation
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("t")
    ).head()["t"]
    expect = (
        c.filter(F.col("c_acctbal") > threshold)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .count()
    )
    assert sum(nations_out.values()) == expect
