"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
twin. Reference-parity operators run against the `events` table shaped as
payments (FIXTURES.md §5); extended operators use documents/embeddings.

Cross-engine determinism rules used throughout (see kafka_streams_spark.
functions.numeric): money aggregates are DECIMAL (exact, order-independent
— double sums would differ in last ulps between a parallel Spark sum and a
serial DuckDB sum); Java Math.round == floor(x+0.5); DuckDB SUM(BIGINT)
is cast back to BIGINT to match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# payments pipeline (reference parity, SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def _payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_spark.sources.testdata import load_table, payments_from_events

    return payments_from_events(load_table(spark, sf_dir, "events"))


def _q_payments_source(spark, sf_dir):
    return _payments(spark, sf_dir)


def _q_filter_rails(spark, sf_dir):
    from kafka_streams_spark.operators.payments import filter_supported_rails

    return filter_supported_rails(_payments(spark, sf_dir))


def _q_branch_gbp(spark, sf_dir):
    from kafka_streams_spark.operators.payments import (
        branch_by_currency,
        filter_supported_rails,
    )

    gbp, _ = branch_by_currency(filter_supported_rails(_payments(spark, sf_dir)))
    return gbp


def _q_branch_usd(spark, sf_dir):
    from kafka_streams_spark.operators.payments import (
        branch_by_currency,
        filter_supported_rails,
    )

    _, usd = branch_by_currency(filter_supported_rails(_payments(spark, sf_dir)))
    return usd


def _q_fx_convert(spark, sf_dir):
    from kafka_streams_spark.operators.payments import (
        branch_by_currency,
        filter_supported_rails,
        fx_convert_usd_to_gbp,
    )

    _, usd = branch_by_currency(filter_supported_rails(_payments(spark, sf_dir)))
    return fx_convert_usd_to_gbp(usd)


def _merged(spark, sf_dir):
    from kafka_streams_spark.operators.payments import (
        branch_by_currency,
        filter_supported_rails,
        fx_convert_usd_to_gbp,
        merge,
    )

    gbp, usd = branch_by_currency(filter_supported_rails(_payments(spark, sf_dir)))
    return merge(gbp, fx_convert_usd_to_gbp(usd))


def _q_merged(spark, sf_dir):
    return _merged(spark, sf_dir)


def _q_rails_foo(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_rails

    foo, _ = branch_by_rails(_merged(spark, sf_dir))
    return foo


def _q_rails_bar(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_rails

    _, bar = branch_by_rails(_merged(spark, sf_dir))
    return bar


def _q_balances(spark, sf_dir):
    from kafka_streams_spark.operators.payments import account_balances

    return account_balances(_merged(spark, sf_dir))


# ---------------------------------------------------------------------------
# contract entry points
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-account balances of the full payment topology
    over sf0.001 events."""
    return _q_balances(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "payments_source": _q_payments_source,
        "payments_filter_rails": _q_filter_rails,
        "payments_branch_gbp": _q_branch_gbp,
        "payments_branch_usd": _q_branch_usd,
        "payments_fx_convert": _q_fx_convert,
        "payments_merged": _q_merged,
        "payments_rails_foo": _q_rails_foo,
        "payments_rails_bar": _q_rails_bar,
        "payments_balances": _q_balances,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _payments_cte() -> str:
    from kafka_streams_spark.sources.testdata import PAYMENTS_FROM_EVENTS_SQL

    return f"WITH payments AS ({PAYMENTS_FROM_EVENTS_SQL})"

_FILTERED = (
    "SELECT * FROM payments WHERE rails IN ('BANK_RAILS_FOO', 'BANK_RAILS_BAR')"
)
_FX = """
SELECT key, paymentId,
       CAST(FLOOR(amount * 0.8 + 0.5) AS BIGINT) AS amount,
       'GBP' AS currency, toAccount, fromAccount, rails
FROM usd
"""
_MERGED_CTES = f"""
filtered AS ({_FILTERED}),
gbp AS (SELECT * FROM filtered WHERE currency = 'GBP'),
usd AS (SELECT * FROM filtered WHERE currency = 'USD'),
fx AS ({_FX}),
merged AS (SELECT * FROM gbp UNION ALL SELECT * FROM fx)
"""


def oracle_sql() -> dict[str, str]:
    p = _payments_cte()
    return {
        "payments_source": f"{p} SELECT * FROM payments",
        "payments_filter_rails": f"{p}, filtered AS ({_FILTERED}) SELECT * FROM filtered",
        "payments_branch_gbp": (
            f"{p}, filtered AS ({_FILTERED}) "
            "SELECT * FROM filtered WHERE currency = 'GBP'"
        ),
        "payments_branch_usd": (
            f"{p}, filtered AS ({_FILTERED}) "
            "SELECT * FROM filtered WHERE currency = 'USD'"
        ),
        "payments_fx_convert": (
            f"{p}, filtered AS ({_FILTERED}), "
            f"usd AS (SELECT * FROM filtered WHERE currency = 'USD') {_FX}"
        ),
        "payments_merged": f"{p}, {_MERGED_CTES} SELECT * FROM merged",
        "payments_rails_foo": (
            f"{p}, {_MERGED_CTES} SELECT * FROM merged WHERE rails = 'BANK_RAILS_FOO'"
        ),
        "payments_rails_bar": (
            f"{p}, {_MERGED_CTES} SELECT * FROM merged WHERE rails = 'BANK_RAILS_BAR'"
        ),
        "payments_balances": (
            f"{p}, {_MERGED_CTES} "
            "SELECT fromAccount, CAST(SUM(amount) AS BIGINT) AS balance "
            "FROM merged GROUP BY fromAccount"
        ),
    }
