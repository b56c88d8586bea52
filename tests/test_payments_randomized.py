"""Seeded randomized-vs-model test — mirror of the reference's 1000-event
component test (KafkaStreamsCT.java:136-192, FIXTURES.md §3): random
amounts/currencies/rails checked against an independent Python model that
replicates Math.round(amount * 0.8) (KafkaStreamsCT.java:174)."""

from __future__ import annotations

import math
import random

from kafka_streams_spark.operators.payments import (
    BalanceStore,
    get_balance,
    process_payments,
)
from kafka_streams_spark.schema import PAYMENT_SCHEMA

N = 1000
SEED = 42


def test_randomized_vs_model(spark):
    rng = random.Random(SEED)
    rows = []
    for i in range(N):
        rows.append(
            {
                "paymentId": f"p{i}",
                "amount": rng.randint(10, 10000),
                "currency": rng.choice(["GBP", "USD"]),
                "fromAccount": "FROM",
                "toAccount": "TO",
                "rails": rng.choice(["BANK_RAILS_FOO", "BANK_RAILS_BAR"]),
            }
        )

    # independent model (KafkaStreamsCT.java:167-177)
    exp_foo = sum(1 for r in rows if r["rails"] == "BANK_RAILS_FOO")
    exp_bar = N - exp_foo
    exp_balance = sum(
        r["amount"]
        if r["currency"] == "GBP"
        else math.floor(r["amount"] * 0.8 + 0.5)  # Java Math.round
        for r in rows
    )

    out = process_payments(spark.createDataFrame(rows, schema=PAYMENT_SCHEMA))
    assert out["rails_foo"].count() == exp_foo
    assert out["rails_bar"].count() == exp_bar
    assert out["rails_foo"].count() + out["rails_bar"].count() == N
    assert get_balance(out["balance"], "FROM") == exp_balance


def test_randomized_store_vs_model(spark, tmp_path):
    """The bucket-pruned BalanceStore against the same independent
    model, over MANY accounts (so accounts land in many distinct
    buckets — the golden test only exercises two): every materialized
    account's pruned lookup equals the model sum; absent accounts are
    None (404), never 0."""
    rng = random.Random(SEED + 1)
    rows = []
    model: dict[str, int] = {}
    for i in range(N):
        acct = f"A{rng.randint(0, 99):02d}"
        amount = rng.randint(10, 10000)
        currency = rng.choice(["GBP", "USD"])
        rows.append(
            {
                "paymentId": f"p{i}",
                "amount": amount,
                "currency": currency,
                "fromAccount": acct,
                "toAccount": "TO",
                "rails": rng.choice(["BANK_RAILS_FOO", "BANK_RAILS_BAR"]),
            }
        )
        model[acct] = model.get(acct, 0) + (
            amount if currency == "GBP" else math.floor(amount * 0.8 + 0.5)
        )

    out = process_payments(spark.createDataFrame(rows, schema=PAYMENT_SCHEMA))
    store = BalanceStore.materialize(out["balance"], str(tmp_path / "bal"))
    # point-lookup a sample of accounts (each lookup is a full Spark
    # round trip; the full-table equality below covers every account,
    # this loop specifically exercises the PRUNED path across ~all
    # buckets without 100 sequential jobs)
    for acct in rng.sample(sorted(model), 20):
        assert get_balance(store, acct) == model[acct], acct
    assert get_balance(store, "NEVER_SENT") is None
    # the store's full table round-trips the aggregation
    got = {
        r["fromAccount"]: r["balance"] for r in store.balances().collect()
    }
    assert got == model
