"""Single-scan M-way branch sink: read-once fan-out in batch, with
first-match routing and the no-catch-all drop contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spark.operators.payments import route_and_convert
from kafka_streams_spark.schema import PAYMENT_SCHEMA
from kafka_streams_spark.sources.branched import read_branch, write_branched
from tests.test_payments_golden import golden_df


def test_write_branched_golden(spark, tmp_path):
    merged = route_and_convert(golden_df(spark))
    path = str(tmp_path / "branched")
    write_branched(
        merged,
        path,
        ("foo", F.col("rails") == "BANK_RAILS_FOO"),
        ("bar", F.col("rails") == "BANK_RAILS_BAR"),
    )
    foo = {r["paymentId"] for r in read_branch(spark, path, "foo").collect()}
    bar = {r["paymentId"]: r.asDict() for r in read_branch(spark, path, "bar").collect()}
    assert foo == {"p1", "p2", "p3"}
    assert set(bar) == {"p5"} and bar["p5"]["amount"] == 800
    # read_branch prunes at the partition level
    plan = (
        read_branch(spark, path, "foo")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "branch" in plan


def test_write_branched_first_match_and_drop(spark, tmp_path):
    df = spark.createDataFrame(
        [
            {"paymentId": "x1", "amount": 5, "currency": "GBP",
             "fromAccount": "A", "toAccount": "B", "rails": "BANK_RAILS_FOO"},
            {"paymentId": "x2", "amount": 500, "currency": "GBP",
             "fromAccount": "A", "toAccount": "B", "rails": "BANK_RAILS_XXX"},
        ],
        schema=PAYMENT_SCHEMA,
    )
    path = str(tmp_path / "b2")
    # overlapping predicates: first match wins; XXX matches neither -> dropped
    write_branched(
        df,
        path,
        ("small", F.col("amount") < 100),
        ("any_foo", F.col("rails") == "BANK_RAILS_FOO"),
    )
    small = {r["paymentId"] for r in read_branch(spark, path, "small").collect()}
    assert small == {"x1"}
    import glob

    assert not glob.glob(f"{path}/branch=any_foo/*")  # x1 claimed by 'small'
    total = spark.read.parquet(path).count()
    assert total == 1  # x2 dropped entirely
