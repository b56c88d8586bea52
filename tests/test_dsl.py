"""DSL facade tests: the reference topology ported call-for-call through
StreamsBuilder/KStream/KGroupedStream/KTable (PaymentTopology.java:39-98),
asserted against the same golden scenario as the direct-operator pipeline,
plus the DSL-only capabilities (branch first-match, cogroup, windows,
global-table join, KTable ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spark.dsl import StreamsBuilder, cogroup
from kafka_streams_spark.functions.numeric import java_round
from tests.test_payments_golden import golden_df


def build_payment_topology(builder, payments):
    """PaymentTopology.buildPipeline (PaymentTopology.java:39-98), line
    for line: stream → filter(rails) → branch(currency) → mapValues(FX)
    → merge → [group_by(fromAccount).aggregate ; branch(rails) → to]."""
    stream = builder.stream(payments, key="paymentId").peek("in")
    routed = stream.filter(F.col("rails").isin("BANK_RAILS_FOO", "BANK_RAILS_BAR"))
    gbp, usd = routed.branch(
        F.col("currency") == "GBP", F.col("currency") == "USD"
    )
    usd_fx = usd.map_values(
        amount=java_round(F.col("amount") * F.lit(0.8)),
        currency=F.lit("GBP"),
    )
    merged = gbp.merge(usd_fx).peek("merged")
    balance = merged.group_by(F.col("fromAccount"), "k").aggregate(
        F.sum("amount").alias("balance"), materialized_as="balance"
    )
    foo, bar = merged.branch(
        F.col("rails") == "BANK_RAILS_FOO", F.col("rails") == "BANK_RAILS_BAR"
    )
    foo.to("rails-foo-topic")
    bar.to("rails-bar-topic")
    return balance


def test_dsl_topology_golden(spark):
    builder = StreamsBuilder()
    balance = build_payment_topology(builder, golden_df(spark))
    topo = builder.build()

    foo = {r["paymentId"] for r in topo.sinks["rails-foo-topic"].collect()}
    bar = {r["paymentId"]: r.asDict() for r in topo.sinks["rails-bar-topic"].collect()}
    assert foo == {"p1", "p2", "p3"}
    assert set(bar) == {"p5"}
    assert bar["p5"]["amount"] == 800 and bar["p5"]["currency"] == "GBP"

    # interactive query parity: 200 / 404 (BalanceController.java:29-34)
    assert balance.query("ABC") == 210
    assert balance.query("XYZ") == 800
    assert balance.query("DEF") is None

    # topology describe parity (TopologyController.java:20-23)
    desc = topo.describe()
    assert "rails-foo-topic" in desc and "balance" in desc


def test_branch_first_match_overlapping(spark):
    """Overlapping predicates: each record lands in the FIRST matching
    leg only (Kafka Streams branch() contract)."""
    df = spark.createDataFrame([(1, 5), (2, 15), (3, 50)], ["id", "v"])
    b = StreamsBuilder()
    small, medium = b.stream(df, key="id").branch(F.col("v") < 20, F.col("v") < 100)
    assert {r["id"] for r in small.df.collect()} == {1, 2}
    assert {r["id"] for r in medium.df.collect()} == {3}  # 1,2 already claimed


def test_branch_drops_no_match(spark):
    df = spark.createDataFrame([(1, 500)], ["id", "v"])
    b = StreamsBuilder()
    (leg,) = b.stream(df, key="id").branch(F.col("v") < 100)
    assert leg.df.count() == 0


def test_flat_map_values_and_select_key(spark):
    df = spark.createDataFrame([("a", [1, 2, 3])], ["k", "vs"])
    b = StreamsBuilder()
    s = b.stream(df, key="k").flat_map_values(F.col("vs"), "v").select_key(
        F.col("v") % 2, "parity"
    )
    counts = s.group_by_key().count().df.collect()
    got = {r["parity"]: r["count"] for r in counts}
    assert got == {0: 1, 1: 2}


def test_reduce_and_count(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], ["k", "amount"]
    )
    b = StreamsBuilder()
    g = b.stream(df, key="k").group_by_key()
    assert g.reduce("amount").query("a") == 30
    assert g.count().query("b") == 1


def test_cogroup(spark):
    """Two keyed streams folded into one table, each with its own
    aggregator — deposits sum positive, withdrawals sum negative."""
    deposits = spark.createDataFrame([("a", 100), ("a", 50), ("b", 10)], ["acct", "amt"])
    withdrawals = spark.createDataFrame([("a", 30), ("c", 7)], ["acct", "amt"])
    b = StreamsBuilder()
    t = cogroup(
        [
            (b.stream(deposits, key="acct").group_by_key(), F.sum("amt").alias("deposited")),
            (b.stream(withdrawals, key="acct").group_by_key(), F.sum("amt").alias("withdrawn")),
        ]
    )
    rows = {r["acct"]: r.asDict() for r in t.df.collect()}
    assert rows["a"]["deposited"] == 150 and rows["a"]["withdrawn"] == 30
    assert rows["b"]["deposited"] == 10 and rows["b"]["withdrawn"] is None
    assert rows["c"]["deposited"] is None and rows["c"]["withdrawn"] == 7


def test_windowed_tumbling_and_hopping(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:05:00"), ("u1", "2024-01-01 00:20:00"),
         ("u1", "2024-01-01 00:35:00")],
        ["user", "ts_s"],
    ).withColumn("ts", F.to_timestamp("ts_s"))
    b = StreamsBuilder()
    g = b.stream(df, key="user").group_by_key()

    tumb = g.windowed_by("ts", "30 minutes").count().df.collect()
    assert sorted(r["count"] for r in tumb) == [1, 2]

    # hopping 30m window sliding every 15m: each event lands in 2 windows
    hop = g.windowed_by("ts", "30 minutes", advance="15 minutes").count().df
    assert hop.agg(F.sum("count")).collect()[0][0] == 6


def test_session_window(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-01 00:10:00"),
         ("u1", "2024-01-01 02:00:00")],
        ["user", "ts_s"],
    ).withColumn("ts", F.to_timestamp("ts_s"))
    b = StreamsBuilder()
    sessions = (
        b.stream(df, key="user").group_by_key()
        .session_windowed_by("ts", "30 minutes").count().df.collect()
    )
    assert sorted(r["count"] for r in sessions) == [1, 2]


def test_global_table_join_broadcasts(spark):
    facts = spark.createDataFrame([(1, "GB"), (2, "US")], ["id", "cc"])
    dim = spark.createDataFrame([("GB", "pound"), ("US", "dollar")], ["cc", "name"])
    b = StreamsBuilder()
    joined = b.stream(facts, key="id").join_global(
        b.global_table(dim, "cc"), on="cc"
    )
    plan = joined.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert {r["name"] for r in joined.df.collect()} == {"pound", "dollar"}


def test_table_latest_per_key_and_ktable_join(spark):
    changelog = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 99), ("b", 1, 5)], ["k", "seq", "v"]
    )
    b = StreamsBuilder()
    t = b.table(changelog, key="k", order_col="seq")
    assert t.query("a")["v"] == 99
    other = b.table(spark.createDataFrame([("a", "x")], ["k", "tag"]), key="k")
    joined = t.join(other, how="left")
    rows = {r["k"]: r["tag"] for r in joined.df.collect()}
    assert rows == {"a": "x", "b": None}


def test_stream_stream_windowed_join(spark):
    purchases = spark.createDataFrame(
        [("u1", "2024-01-01 01:00:00"), ("u2", "2024-01-01 05:00:00")],
        ["user", "pts_s"],
    ).withColumn("pts", F.to_timestamp("pts_s")).drop("pts_s")
    clicks = spark.createDataFrame(
        [("u1", "2024-01-01 00:30:00"), ("u1", "2024-01-01 10:00:00"),
         ("u2", "2024-01-01 04:59:00")],
        ["user", "cts_s"],
    ).withColumn("cts", F.to_timestamp("cts_s")).drop("cts_s")
    b = StreamsBuilder()
    joined = b.stream(purchases, key="user").join_windowed(
        b.stream(clicks, key="user"),
        on=F.col("l.user") == F.col("r.user"),
        left_ts="pts", right_ts="cts",
        before="interval 1 hour", after="interval 0 hours",
    )
    # u1's 10:00 click is outside [00:00, 01:00]; u2's 04:59 is inside
    assert joined.df.count() == 2


def test_dsl_topology_streaming(spark, tmp_path):
    """The DSL facade is batch/streaming agnostic: the same
    build_payment_topology over a readStream source yields the golden
    balances (complete mode) and sink legs (append mode)."""
    import json
    import os

    from kafka_streams_spark.schema import PAYMENT_SCHEMA
    from tests.test_payments_golden import GOLDEN

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for pid, amt, cur, frm, to, rails in GOLDEN:
            f.write(json.dumps({
                "paymentId": pid, "amount": amt, "currency": cur,
                "fromAccount": frm, "toAccount": to, "rails": rails,
            }) + "\n")

    stream = spark.readStream.schema(PAYMENT_SCHEMA).json(src)
    builder = StreamsBuilder()
    balance = build_payment_topology(builder, stream)
    topo = builder.build()

    qb = (
        balance.df.writeStream.format("memory").queryName("dsl_bal")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_b")).start()
    )
    qf = (
        topo.sinks["rails-foo-topic"].writeStream.format("memory")
        .queryName("dsl_foo").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_f")).start()
    )
    try:
        qb.processAllAvailable()
        qf.processAllAvailable()
        bal = {r["k"]: r["balance"] for r in spark.table("dsl_bal").collect()}
        assert bal == {"ABC": 210, "XYZ": 800}
        foo = {r["paymentId"] for r in spark.table("dsl_foo").collect()}
        assert foo == {"p1", "p2", "p3"}
    finally:
        qb.stop()
        qf.stop()


def test_flat_map_rekeys_and_fans_out(spark):
    """KStream.flatMap: one record -> N (key, value) records, the
    re-keying sibling of flatMapValues — exploded element field becomes
    the new grouping key."""
    df = spark.createDataFrame(
        [("a", [(1, "x"), (2, "y"), (1, "z")])],
        "k0 string, pairs array<struct<pk:int, v:string>>",
    )
    b = StreamsBuilder()
    s = b.stream(df, key="k0").flat_map(
        F.col("pairs"), "pair", key_expr=F.col("pair.pk"), key_alias="pk"
    )
    assert s.key == "pk"
    got = {r["pk"]: r["count"] for r in s.group_by_key().count().df.collect()}
    assert got == {1: 2, 2: 1}
    # without key_expr the old key is kept (pure fan-out)
    s2 = b.stream(df, key="k0").flat_map(F.col("pairs"), "pair")
    assert s2.key == "k0" and s2.df.count() == 3


def test_suppress_emit_final_streaming_and_guards(spark, tmp_path):
    """KTable.suppress (emit-final): on a streaming windowed aggregate
    with a grace period, output_mode flips to append and the sink sees
    each window EXACTLY once, only after the watermark closes it —
    never an intermediate refinement. Guards: suppress without a
    window, or streaming without grace, raises."""
    import json
    import os

    import pytest

    src = str(tmp_path / "sup_src")
    os.makedirs(src)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for k, ts in rows:
                f.write(json.dumps({"k": k, "ts": ts}) + "\n")

    write("b0.json", [("u1", "2024-01-01 00:05:00"),
                      ("u1", "2024-01-01 00:25:00")])

    sdf = (
        spark.readStream.schema("k string, ts string").json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    b = StreamsBuilder()
    table = (
        b.stream(sdf, key="k").group_by_key()
        .windowed_by("ts", "10 minutes", grace="5 minutes")
        .count()
    )
    assert table.output_mode == "update"
    sup = table.suppress()
    assert sup.output_mode == "append"

    q = (
        sup.df.writeStream.format("memory").queryName("sup_sink")
        .outputMode(sup.output_mode)
        .option("checkpointLocation", str(tmp_path / "sup_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark advanced to 00:25-5min = 00:20 after the data batch
        # (processAllAvailable includes the no-data catch-up batch): the
        # 00:00-00:10 window is final and emitted ONCE; 00:20-00:30 is
        # still open — an update-mode run would already show it
        rows = sorted(
            (str(r["window_start"]), r["count"])
            for r in spark.table("sup_sink").collect()
        )
        assert rows == [("2024-01-01 00:00:00", 1)]
        write("b1.json", [("u1", "2024-01-01 00:45:00")])
        q.processAllAvailable()
        # watermark 00:40 closes 00:20-00:30; 00:40-00:50 stays open;
        # the already-emitted window does NOT re-emit (exactly once)
        rows = sorted(
            (str(r["window_start"]), r["count"])
            for r in spark.table("sup_sink").collect()
        )
        assert rows == [
            ("2024-01-01 00:00:00", 1),
            ("2024-01-01 00:20:00", 1),
        ]
    finally:
        q.stop()

    # guard: unwindowed table
    plain = b.stream(
        spark.createDataFrame([("a", 1)], ["k", "v"]), key="k"
    ).group_by_key().count()
    with pytest.raises(ValueError, match="windowed aggregation"):
        plain.suppress()
    # guard: streaming windowed WITHOUT grace
    graceless = (
        b.stream(sdf, key="k").group_by_key()
        .windowed_by("ts", "10 minutes")
        .count()
    )
    with pytest.raises(ValueError, match="grace"):
        graceless.suppress()


def test_session_suppress_emit_final_streaming(spark, tmp_path):
    """suppress over SESSION windows: grace = watermark, append mode
    emits a session exactly once, after the watermark passes its end
    (last event + gap); the open session never appears."""
    import json
    import os

    src = str(tmp_path / "ssup_src")
    os.makedirs(src)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for k, ts in rows:
                f.write(json.dumps({"k": k, "ts": ts}) + "\n")

    write("b0.json", [("u1", "2024-01-01 00:00:00"),
                      ("u1", "2024-01-01 00:02:00")])
    sdf = (
        spark.readStream.schema("k string, ts string").json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    b = StreamsBuilder()
    sup = (
        b.stream(sdf, key="k").group_by_key()
        .session_windowed_by("ts", "5 minutes", grace="1 minute")
        .count(alias="n")
        .suppress()
    )
    q = (
        sup.df.writeStream.format("memory").queryName("ssup_sink")
        .outputMode(sup.output_mode)
        .option("checkpointLocation", str(tmp_path / "ssup_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark 00:01 < session end 00:07 -> still open, invisible
        assert spark.table("ssup_sink").count() == 0
        write("b1.json", [("u1", "2024-01-01 01:00:00")])
        q.processAllAvailable()
        rows = [
            (str(r["session_start"]), str(r["session_end"]), r["n"])
            for r in spark.table("ssup_sink").collect()
        ]
        # the merged 00:00+00:02 session (end = last event + gap) emits
        # once; the 01:00 session stays open
        assert rows == [
            ("2024-01-01 00:00:00", "2024-01-01 00:07:00", 2)
        ]
    finally:
        q.stop()


def test_kstream_process_map_in_pandas(spark):
    """Processor-API analog: arbitrary Arrow-batched logic through
    KStream.process, schema-checked output."""
    from pyspark.sql.types import LongType, StructField, StructType

    df = spark.createDataFrame([(1,), (2,), (3,)], ["v"])

    def double(batches):
        for pdf in batches:
            pdf["v"] = pdf["v"] * 2
            yield pdf

    b = StreamsBuilder()
    out = b.stream(df, key="v").process(
        double, StructType([StructField("v", LongType())])
    )
    assert sorted(r["v"] for r in out.df.collect()) == [2, 4, 6]


def test_sql_surface(spark, sf_dir):
    """The SQL surface (catalog views) answers the reference's queries
    with plain spark.sql — capability the reference lacks entirely
    (SURVEY.md 2.4). Point lookup == interactive-query parity."""
    from kafka_streams_spark.catalog import register_views

    names = register_views(spark, sf_dir)
    assert {"payments", "payments_merged", "balances", "events"} <= set(names)
    row = spark.sql(
        "SELECT balance FROM balances WHERE fromAccount = 'ACC-1'"
    ).collect()
    direct = spark.sql(
        "SELECT SUM(amount) b FROM payments_merged WHERE fromAccount = 'ACC-1'"
    ).collect()
    assert row and row[0]["balance"] == direct[0]["b"]


def test_ktable_derived_ops_preserve_window_flags(spark):
    """r10 review fix: KTable.filter/map_values rebuilt the table with
    default flags, so a filtered windowed aggregate rejected suppress()
    and — worse — filter AFTER suppress() silently reverted output_mode
    to 'update', re-emitting the intermediate window refinements
    emit-final forbids. Derived tables now carry the flags; a join is
    emit-final only when BOTH sides are."""
    builder = StreamsBuilder()
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:01:00", 1), ("a", "2024-01-01 00:40:00", 2)],
        "k string, ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    windowed = (
        builder.stream(df, key="k")
        .group_by_key()
        .windowed_by("ts", "30 minutes")
        .count()
    )

    # suppress after filter: still a windowed aggregate
    sup = windowed.filter(F.col("count") >= 1).suppress()
    assert sup.output_mode == "append"

    # filter / map_values after suppress: emit-final survives
    assert sup.filter(F.col("count") >= 1).output_mode == "append"
    assert sup.map_values(doubled=F.col("count") * 2).output_mode == "append"

    # join: append only when BOTH sides are suppressed
    other = sup.map_values(extra=F.lit(1))
    assert sup.join(other).output_mode == "append"
    plain = builder.table(df.select("k", "v", "ts"), key="k", order_col="ts")
    assert sup.join(plain).output_mode == "update"


def test_branch_null_predicate_is_false_and_api_guards(spark):
    """r10 review fixes on the DSL surface:

    - branch(): a NULL from an EARLIER predicate must not poison the
      first-match encoding — NULL counts as false (the boolean a Kafka
      Streams Predicate returns), matching sources/branched.route_tag.
    - map_values() rejects rewriting the key column (mapValues keeps
      the key; the silent rewrite corrupted later group_by_key runs).
    - repartition() on a keyless stream round-robins at the default
      parallelism instead of crashing; 0 partitions is rejected.
    - join_windowed() drops the right copy of a shared key column so
      stateful continuations do not hit AMBIGUOUS_REFERENCE."""
    import pytest

    builder = StreamsBuilder()
    df = spark.createDataFrame(
        [(None, "b"), ("a", "b"), ("c", "d")], "x string, y string"
    )
    s = builder.stream(df)
    leg1, leg2 = s.branch(F.col("x") == "a", F.col("y") == "b")
    assert {tuple(r) for r in leg1.df.collect()} == {("a", "b")}
    # the (NULL, 'b') row's first predicate is NULL -> false; its second
    # is true -> leg 2 (the old logic dropped it from every leg)
    assert {tuple(r) for r in leg2.df.collect()} == {(None, "b")}

    keyed = builder.stream(df, key="x")
    with pytest.raises(ValueError, match="cannot rewrite the key"):
        keyed.map_values(x=F.upper("x"))

    out = s.repartition()  # keyless: round-robin, not TypeError
    assert out.df.count() == 3
    with pytest.raises(ValueError, match="num_partitions"):
        s.repartition(0)

    ev = spark.createDataFrame(
        [(1, 10), (2, 500)], "user bigint, ts bigint"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    clicks = spark.createDataFrame(
        [(1, 20), (2, 99999)], "user bigint, ts2 bigint"
    ).withColumn("ts2", F.timestamp_seconds("ts2"))
    j = builder.stream(ev, key="user").join_windowed(
        builder.stream(clicks, key="user"),
        on=F.col("l.user") == F.col("r.user"),
        left_ts="ts",
        right_ts="ts2",
        before="interval 1 minute",
        after="interval 1 minute",
    )
    assert j.df.columns.count("user") == 1  # single key column survives
    counts = j.group_by_key().count().df.collect()  # no AMBIGUOUS_REFERENCE
    assert {(r["user"], r["count"]) for r in counts} == {(1, 1)}
