"""Relational analytics over the TPC-H-ish testdata — the breadth layer
of the engine (joins, grouped aggregation, windows, top-k, event-time
bucketing) that the reference's DSL lacks entirely (SURVEY.md §2.4) but
any replacement engine needs.

Cross-engine determinism: every money aggregate runs on DECIMAL(18,2)
inputs (exact + associative → identical under any partitioning; double
sums would drift in the last ulps vs a serial DuckDB run). Join shapes:
dimension tables are broadcast (no shuffle of the fact side's rows);
fact-fact joins shuffle on the join key and rely on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kafka_streams_spark.sources.testdata import load_table

DEC = "decimal(18,2)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped aggregate scan of lineitem with a date
    filter. The filter and the 7-column projection both push to the
    parquet scan; sums are map-side partial."""
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    qty = F.col("l_quantity").cast(DEC)
    # Re-cast each product to a small decimal before the next multiply:
    # chaining three decimal(18,2) multiplies exceeds precision 38, where
    # Spark silently rescales (allowPrecisionLoss) and DuckDB errors —
    # the intermediate casts keep both engines in exact arithmetic.
    disc_price = (price * (F.lit(1).cast(DEC) - disc)).cast("decimal(18,4)")
    charge = (disc_price * (F.lit(1).cast(DEC) + tax)).cast("decimal(18,6)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with selective
    filters. customer is a dimension → broadcast; orders⋈lineitem
    shuffles on orderkey. Top-10 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        l.join(broadcast(o.join(broadcast(c), o.o_custkey == c.c_custkey)), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey"),
            F.col("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the dimension chain
    region→nation→{customer,supplier}→orders→lineitem. Every dimension
    side is broadcast — the only shuffles are the fact-side groupBy and
    the orders⋈lineitem key exchange."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    nr = n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            broadcast(nr),
            (c.c_nationkey == F.col("n_nationkey")) & (s.s_nationkey == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k per group via window rank — one shuffle on the partition key,
    per-partition sort, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def order_count_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # money as exact integer cents: a DECIMAL(38,2) this large round-trips
    # through float64 (pandas/arrow) with last-digit error; BIGINT doesn't
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100).cast("long").alias("total_value_cents"),
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation on event time. `ts` arrives as
    epoch-nanos long (see load_table); the hour bucket is integer
    division — exact, and identical to DuckDB's epoch_ns(ts)//3.6e12.
    In streaming mode the same expression under a watermark gives the
    windowed aggregate."""
    e = load_table(spark, sf_dir, "events")
    # `div` = exact integer division on longs. A `/` here would round-trip
    # through double: epoch-nanos (~1.7e18) exceed double's 53-bit mantissa
    # and hour buckets could come out off-by-one at boundaries.
    hour = F.expr("ts div 3600000000000")
    return e.groupBy(hour.alias("epoch_hour"), F.col("event_type")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("decimal(38,2)").alias("total_value"),
    )


def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1 h window, 15 min slide): each event
    contributes to size/slide = 4 overlapping windows. The streaming
    DSL's `windowed_by(hopping)` (dsl.py) computes the same thing under
    a watermark; this is the batch twin, expressed as an explicit
    explode over the 4 covering window starts so DuckDB can reproduce it
    exactly. `F.window(ts, "1 hour", "15 minutes")` is the built-in
    spelling, but it wants a timestamp column — epoch-nanos longs stay
    exact (see events_hourly) and integer window arithmetic is
    engine-portable.

    Scale shape: one explode (×4 rows, map-side) + one aggregation
    shuffle with partial aggregates — same plan family as events_hourly,
    just a 4× fatter map stage. No window-function sort anywhere.
    """
    slide_ns = 900_000_000_000  # 15 min
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            "value",
            F.expr("ts div 900000000000").alias("_slot"),
        )
        .select(
            "event_type",
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_k"),
            "_slot",
        )
        .groupBy(
            ((F.col("_slot") - F.col("_k")) * F.lit(slide_ns)).alias("win_start_ns"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("decimal(38,2)").alias("total_value"),
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    from their previous event exceeds `gap_minutes`. Classic
    lag + cumulative-sum-over-window formulation — one shuffle on
    user_id, sessions assigned without any self-join. Batch analog of
    Structured Streaming's session windows."""
    e = load_table(spark, sf_dir, "events")
    gap_ns = gap_minutes * 60 * 1_000_000_000
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        (F.col("ts") - F.lag("ts").over(w_user)) > gap_ns, 1
    ).otherwise(0)
    with_sess = e.withColumn(
        "session_seq",
        F.sum(F.coalesce(is_new, F.lit(0))).over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.expr("(max(ts) - min(ts)) div 1000000").alias("duration_ms"),
    )


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per type (the oracle-checkable variant;
    `approx_users_by_type` is the HLL++ scale path)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+aggregate, no grouping. Every predicate
    pushes to the parquet scan; the aggregate is a single partial+final
    pair — the cheapest possible plan for the semantics."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
    )


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP(status, priority) — grouping-set
    aggregation the reference's DSL has no analog for. One shuffle; the
    grouping-set expansion happens map-side before the exchange."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100).cast("long").alias("total_value_cents"),
    )


def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user bucket): all 4 grouping combinations in
    one pass."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("user_bucket", F.expr("user_id % 10"))
        .cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n_events"))
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having ≥1 order. Semi joins ship only the
    join key of the probe side and stop at first match — at scale this
    beats an inner-join+distinct by the width of the orders row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (the NOT EXISTS shape —
    null-safe, unlike NOT IN)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (`percentile` = DuckDB's
    `quantile_cont`, bitwise-identical interpolation — verified). The
    scale path is `percentile_approx` (KLL/GK sketch, constant memory);
    exact percentile sorts per group and is the oracle-checkable variant."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))"
            ).alias("_q")
        )
        .select(
            "l_returnflag",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
            F.col("_q")[3].alias("p95"),
        )
    )


def orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-table-style enrichment: every order decorated with customer
    + nation attributes via broadcast dimension joins — zero shuffle of
    the fact side."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "c_name",
            "n_name",
        )
    )


def approx_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — constant memory per group at any
    scale (the 100 TB path where exact distinct would shuffle every
    (type,user) pair). Sketch-based, so no SQL oracle: the driver's
    rows-only check applies."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi-join — count orders in a
    quarter that have at least one line item shipped after the order
    date. The left-semi join never materializes matching lineitems (each
    order emits at most once, no fan-out row explosion), and the date
    range pushes to the orders scan."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    in_range = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    late = in_range.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q10_returned_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    fact-fact join (orders⋈lineitem, shuffled on orderkey) decorated by
    broadcast customer/nation dims, top-k by revenue with deterministic
    tiebreak."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    disc_price = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(18,4)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join —
    share of revenue from promo parts in one month. `part` broadcasts;
    the CASE WHEN rides inside the same partial aggregate, so promo and
    total sums cost one pass."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(18,4)")
    return (
        l.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0).cast("decimal(18,4)")))
            .cast("decimal(38,4)")
            .alias("promo_revenue"),
            F.sum(disc_price).cast("decimal(38,4)").alias("total_revenue"),
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str, min_qty: int = 300) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact — orders whose total
    quantity exceeds a threshold, decorated with the customer. The
    lineitem pre-aggregation runs FIRST (shuffle carries one row per
    order, not per line), and only qualifying orders join customer."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast(DEC).alias("o_totalprice"),
            F.col("total_qty").cast("decimal(38,2)").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def daily_revenue_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame analytics over daily order revenue: cumulative
    revenue (ROWS unbounded-preceding) and a trailing 7-day revenue
    (RANGE frame over a day number, so calendar gaps are honored — a
    ROWS frame would silently span missing days). Money is exact integer
    cents end-to-end. One aggregation shuffle + one single-partition
    window over ~one row per day (tiny by construction)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("o_date"))
        .agg(
            (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
            .cast("long")
            .alias("revenue_cents")
        )
        .withColumn("day_nr", F.datediff(F.col("o_date"), F.lit("1995-01-01")))
    )
    w_cum = Window.orderBy("day_nr").rowsBetween(Window.unboundedPreceding, 0)
    w_7d = Window.orderBy("day_nr").rangeBetween(-6, 0)
    return daily.select(
        F.date_format("o_date", "yyyy-MM-dd").alias("o_date"),
        "revenue_cents",
        F.sum("revenue_cents").over(w_cum).alias("cumulative_cents"),
        F.sum("revenue_cents").over(w_7d).alias("trailing7_cents"),
    )
