"""Readers for the driver's parquet testdata and the events→payments
mapping used to exercise the reference topology on driver data.

FIXTURES.md §5 directs: reference-parity operators run against `events`
shaped as payments (event_type ↔ rails/currency domains, user_id ↔
fromAccount, value ↔ amount). The mapping below is deterministic and
expressed identically in the DataFrame API (engine) and ANSI SQL
(DuckDB oracle); `tests/test_testdata_mapping.py` pins their equality.

Cross-engine-safe constructs only:
- minor-units amount via ``floor(value*100 + 0.5)`` (cast of a raw double
  to bigint TRUNCATES in Spark but ROUNDS in DuckDB — never cast raw);
- modulo on bigint, string concat with ||-equivalent `concat`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Inferred parquet schemas, keyed by file path. Schema inference runs a
# (tiny but real) Spark job to read footers; contract queries load the
# same tables over and over, so the first load pays the footer read and
# every later load passes the cached schema → zero jobs during query
# construction (pinned by test_query_construction_runs_no_jobs).
# Keyed by path with no invalidation ON PURPOSE: testdata fixtures are
# immutable within a process. Regenerating a file at the same path
# in-process would serve the stale schema — call
# ``_SCHEMA_CACHE.clear()`` in that (test-only) situation.
_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → Catalyst gets pushdown,
    pruning, and split-based parallelism for free.

    `events.ts` is normalized to an epoch-NANOS BIGINT at µs precision —
    the canonical event-time representation every downstream operator and
    DuckDB oracle (`epoch_ns(ts)`) computes against. Two physical layouts
    exist across testdata generations, both handled:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; `nanosAsLong`
      (set at runtime so it also holds under the driver's session) reads it
      as epoch-nanos long, then we TRUNCATE to µs (`(ts div 1000) * 1000`).
    - timestamp[us] (reads as TIMESTAMP_NTZ): `timestampdiff(MICROSECOND,
      ntz-epoch, ts) * 1000` — pure wall-clock arithmetic on NTZ operands,
      independent of the session timezone (the earlier `unix_micros(cast)`
      form silently shifted if anything reset spark.sql.session.timeZone
      between construction and execution). The NTZ wall clock IS UTC by
      generation, matching DuckDB's naive-timestamp `epoch_ns`.

    µs is the canonical precision; keeping sub-µs nanos made durations/gap
    comparisons differ by ±1 at the last digit vs any timestamp-typed engine.
    """
    if name == "events":
        # Harmless for timestamp[us] files; required to read TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = _read_cached(spark, f"{sf_dir}/events.parquet")
        if isinstance(ev.schema["ts"].dataType, LongType):
            # integer div — float division would shed low bits (nanos > 2^53)
            return ev.withColumn("ts", F.expr("(ts div 1000) * 1000"))
        # Wall-clock diff on NTZ operands — no session-tz dependency, no
        # global conf mutation; the NTZ wall clock is UTC by generation.
        return ev.withColumn(
            "ts",
            F.expr(
                "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"
            ),
        )
    return _read_cached(spark, f"{sf_dir}/{name}.parquet")


def _read_cached(spark: SparkSession, path: str) -> DataFrame:
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


# Kept textually close to the DataFrame version below; used as a CTE by the
# DuckDB oracle so both engines compute payments from the same recipe.
PAYMENTS_FROM_EVENTS_SQL = """
SELECT
    CAST(event_id AS VARCHAR)               AS key,
    CAST(event_id AS VARCHAR)               AS paymentId,
    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS amount,
    CASE WHEN event_id % 3 = 0 THEN 'USD' ELSE 'GBP' END AS currency,
    'ACC-' || CAST((user_id + 7) % 20 AS VARCHAR) AS toAccount,
    'ACC-' || CAST(user_id AS VARCHAR)      AS fromAccount,
    CASE event_type
        WHEN 'purchase' THEN 'BANK_RAILS_FOO'
        WHEN 'view'     THEN 'BANK_RAILS_FOO'
        WHEN 'click'    THEN 'BANK_RAILS_BAR'
        WHEN 'signup'   THEN 'BANK_RAILS_BAR'
        ELSE 'BANK_RAILS_XXX'
    END                                     AS rails
FROM events
"""


def payments_from_events(events: DataFrame) -> DataFrame:
    """DataFrame twin of PAYMENTS_FROM_EVENTS_SQL (pure Column exprs,
    narrow projection — no shuffle, fully pushdown-friendly)."""
    eid_str = F.col("event_id").cast("string")
    return events.select(
        eid_str.alias("key"),
        eid_str.alias("paymentId"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("amount"),
        F.when(F.col("event_id") % 3 == 0, F.lit("USD"))
        .otherwise(F.lit("GBP"))
        .alias("currency"),
        F.concat(F.lit("ACC-"), ((F.col("user_id") + 7) % 20).cast("string")).alias(
            "toAccount"
        ),
        F.concat(F.lit("ACC-"), F.col("user_id").cast("string")).alias("fromAccount"),
        F.when(F.col("event_type").isin("purchase", "view"), F.lit("BANK_RAILS_FOO"))
        .when(F.col("event_type").isin("click", "signup"), F.lit("BANK_RAILS_BAR"))
        .otherwise(F.lit("BANK_RAILS_XXX"))
        .alias("rails"),
    )
