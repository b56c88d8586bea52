"""Seeded randomized-vs-model test — mirror of the reference's 1000-event
component test (KafkaStreamsCT.java:136-192, FIXTURES.md §3): random
amounts/currencies/rails checked against an independent Python model that
replicates Math.round(amount * 0.8) (KafkaStreamsCT.java:174)."""

from __future__ import annotations

import math
import random

from kafka_streams_spark.operators.payments import get_balance, process_payments
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
