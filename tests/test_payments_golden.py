"""Golden 5-event scenario — the reference's canonical unit test
(PaymentTopologyTest.java:81-145, distilled in FIXTURES.md §2) plus the
edge-case semantic pins from FIXTURES.md §4."""

from __future__ import annotations

from kafka_streams_spark.operators.payments import (
    BalanceStore,
    get_balance,
    process_payments,
)
from kafka_streams_spark.plans.audit import audit
from kafka_streams_spark.schema import PAYMENT_SCHEMA

GOLDEN = [
    # paymentId, amount, currency, fromAccount, toAccount, rails
    ("p1", 100, "GBP", "ABC", "DEF", "BANK_RAILS_FOO"),
    ("p2", 50, "GBP", "ABC", "DEF", "BANK_RAILS_FOO"),
    ("p3", 60, "GBP", "ABC", "DEF", "BANK_RAILS_FOO"),
    ("p4", 1200, "GBP", "ABC", "DEF", "BANK_RAILS_XXX"),
    ("p5", 1000, "USD", "XYZ", "DEF", "BANK_RAILS_BAR"),
]


def golden_df(spark):
    rows = [
        {
            "paymentId": pid,
            "amount": amt,
            "currency": cur,
            "fromAccount": frm,
            "toAccount": to,
            "rails": rails,
        }
        for pid, amt, cur, frm, to, rails in GOLDEN
    ]
    return spark.createDataFrame(rows, schema=PAYMENT_SCHEMA)


def test_golden_scenario(spark):
    out = process_payments(golden_df(spark))

    foo = {r["paymentId"]: r.asDict() for r in out["rails_foo"].collect()}
    bar = {r["paymentId"]: r.asDict() for r in out["rails_bar"].collect()}

    # FOO sink: p1,p2,p3 unchanged (PaymentTopologyTest.java:122-127)
    assert set(foo) == {"p1", "p2", "p3"}
    assert foo["p1"]["amount"] == 100 and foo["p1"]["currency"] == "GBP"

    # BAR sink: p5 FX-converted 1000 USD -> 800 GBP, other fields unchanged
    # (PaymentTopologyTest.java:129-139)
    assert set(bar) == {"p5"}
    assert bar["p5"]["amount"] == 800
    assert bar["p5"]["currency"] == "GBP"
    assert bar["p5"]["fromAccount"] == "XYZ" and bar["p5"]["toAccount"] == "DEF"

    # p4 (BANK_RAILS_XXX) appears nowhere
    balances = out["balance"]
    assert get_balance(balances, "ABC") == 210
    assert get_balance(balances, "XYZ") == 800
    assert get_balance(balances, "DEF") is None  # never-sender -> absent, not 0


def test_balance_store_bucket_pruned_lookup(spark, tmp_path):
    """The §2.3 point lookup at scale (r12 verdict item 5): materialize
    the golden balances to a bucket-partitioned store, then pin that
    get_balance (a) returns the same golden/404 answers through the
    store, and (b) plans as a PARTITION-pruned read — the bucket
    equality must appear in PartitionFilters (planning-time directory
    pruning, 1/64th of state) and the fromAccount equality must push to
    the parquet reader inside the surviving bucket."""
    out = process_payments(golden_df(spark))
    store = BalanceStore.materialize(out["balance"], str(tmp_path / "bal"))

    # same parity surface, same answers — incl. the 404 case
    assert get_balance(store, "ABC") == 210
    assert get_balance(store, "XYZ") == 800
    assert get_balance(store, "DEF") is None

    a = audit(store.lookup_plan("ABC"))
    assert a.partition_filter_pruned("bucket"), a.partition_filters
    assert a.filter_pushed("fromAccount"), a.pushed_filters
    # the lookup is a pure scan+filter: no shuffle, no aggregation re-run
    assert a.num_exchanges == 0


def test_unknown_currency_dropped(spark):
    # FIXTURES.md §4: currency=EUR matches neither branch predicate ->
    # silently dropped (Kafka Streams branch() contract, no catch-all).
    df = spark.createDataFrame(
        [
            {
                "paymentId": "e1",
                "amount": 500,
                "currency": "EUR",
                "fromAccount": "EEE",
                "toAccount": "DEF",
                "rails": "BANK_RAILS_FOO",
            }
        ],
        schema=PAYMENT_SCHEMA,
    )
    out = process_payments(df)
    assert out["rails_foo"].count() == 0
    assert out["rails_bar"].count() == 0
    assert out["balance"].count() == 0


def test_fx_rounding_pins(spark):
    # FIXTURES.md §4 rounding vectors: 1->1, 3->2, 5->4, 13->10 (USD->GBP)
    vectors = {1: 1, 3: 2, 5: 4, 13: 10}
    df = spark.createDataFrame(
        [
            {
                "paymentId": f"r{amt}",
                "amount": amt,
                "currency": "USD",
                "fromAccount": "RND",
                "toAccount": "DEF",
                "rails": "BANK_RAILS_FOO",
            }
            for amt in vectors
        ],
        schema=PAYMENT_SCHEMA,
    )
    out = process_payments(df)
    got = {int(r["paymentId"][1:]): r["amount"] for r in out["rails_foo"].collect()}
    assert got == vectors
