"""SQL surface: register the engine's tables and derived views so users
query with plain ``spark.sql`` — a capability the reference explicitly
lacks (SURVEY.md §2.4: "No SQL or any query language; no parser, no
catalog"). Spark's parser/analyzer/catalog close that gap for free; this
module just names things.

Views are temp views over the parquet testdata plus the payment-domain
derivations (`payments`, `payments_merged`, `balances`). A view is a
logical-plan alias — querying one composes with pushdown/pruning exactly
like the DataFrame form (same Catalyst plan), so the SQL surface costs
nothing at any scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kafka_streams_spark.operators.payments import account_balances, route_and_convert
from kafka_streams_spark.sources.testdata import (
    TABLES,
    load_table,
    payments_from_events,
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table plus the payment-domain views.
    Returns the registered view names."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    payments = payments_from_events(spark.table("events"))
    payments.createOrReplaceTempView("payments")
    merged = route_and_convert(payments)
    merged.createOrReplaceTempView("payments_merged")
    account_balances(merged).createOrReplaceTempView("balances")
    names += ["payments", "payments_merged", "balances"]
    return names
