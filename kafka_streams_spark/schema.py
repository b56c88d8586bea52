"""Schemas and schema-on-read JSON helpers.

Reference data model: a single domain type PaymentEvent
(reference: src/main/java/demo/kafka/streams/event/PaymentEvent.java:12-25)
with String key + JSON value on the wire
(JsonSerializer.java:20-29 / JsonDeserializer.java:23-32). Lenient
semantics preserved: unknown JSON fields ignored, missing fields -> null
(JsonMapper.java:13). Amounts are integral units (Java Long), not decimal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# PaymentEvent.java:12-25 — field-for-field. `key` is the Kafka record key
# (tests key by paymentId, PaymentTopologyTest.java:87).
PAYMENT_SCHEMA = StructType(
    [
        StructField("paymentId", StringType()),
        StructField("amount", LongType()),
        StructField("currency", StringType()),
        StructField("toAccount", StringType()),
        StructField("fromAccount", StringType()),
        StructField("rails", StringType()),
    ]
)

PAYMENT_FIELDS = [f.name for f in PAYMENT_SCHEMA.fields]

# Enum domains: Currency.java:3-6, Rails.java:3-7.
CURRENCY_GBP = "GBP"
CURRENCY_USD = "USD"
RAILS_FOO = "BANK_RAILS_FOO"
RAILS_BAR = "BANK_RAILS_BAR"
RAILS_XXX = "BANK_RAILS_XXX"
SUPPORTED_RAILS = [RAILS_FOO, RAILS_BAR]  # PaymentTopology.java:33


def payment_from_json(value: Column, mode: str = "PERMISSIVE") -> Column:
    """bytes/string JSON -> PaymentEvent struct.

    Default PERMISSIVE: malformed JSON yields a null struct instead of
    killing the stream (documented difference, SURVEY.md §1.3); unknown
    fields ignored, missing -> null. ``mode="FAILFAST"`` restores the
    reference's strictness — JsonDeserializer.java:29-31 rethrows on any
    malformed payload and the stream dies — by failing the Spark task on
    the first unparseable record. Well-formed-but-empty ``{}`` parses in
    BOTH modes (Jackson succeeds with all-null fields; so do we).
    """
    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError("mode must be PERMISSIVE or FAILFAST")
    return F.from_json(value.cast("string"), PAYMENT_SCHEMA, {"mode": mode})


def payment_to_json() -> Column:
    """PaymentEvent columns -> JSON string with pinned field order
    (JsonSerializer.java:20-29; order pinned for byte-stable goldens).
    Resolves the bare PAYMENT_FIELDS column names against whatever
    frame the expression is attached to. ``ignoreNullFields=false``
    pins Jackson parity for sparse records: Spark's to_json default
    silently OMITS null-valued fields, so a payment parsed from a
    partial payload re-serialized with currency/toAccount/... absent —
    a lossy round-trip and non-byte-stable goldens (r10 review fix);
    the reference serializer emits ``"currency":null``."""
    return F.to_json(
        F.struct(*[F.col(c) for c in PAYMENT_FIELDS]),
        {"ignoreNullFields": "false"},
    )


def parse_payment_stream(raw: DataFrame, mode: str = "PERMISSIVE") -> DataFrame:
    """Kafka-shaped (key binary, value binary) -> flat payment DataFrame.

    Spark analog of the source scan Consumed.with(String, PaymentSerdes)
    (PaymentTopology.java:41-42). Null payloads stay null rows upstream of
    the struct expansion (JsonDeserializer.java:24-25) and are dropped here,
    matching "null record -> no output". ``mode="FAILFAST"`` matches the
    reference's die-on-malformed behavior (see payment_from_json).
    """
    parsed = raw.select(
        F.col("key").cast("string").alias("key"),
        payment_from_json(F.col("value"), mode=mode).alias("p"),
    )
    # PERMISSIVE from_json yields an all-null struct for malformed input
    # (and for null payloads), not a NULL struct — so "no record" means
    # every field is null. An all-null payment is also what Jackson
    # produces for `{}` and it is semantically dead downstream (rails
    # filter drops it), so one predicate covers all three cases.
    any_field = F.coalesce(
        *[F.col(f"p.{f}").cast("string") for f in PAYMENT_FIELDS]
    )
    return parsed.filter(any_field.isNotNull()).select("key", "p.*")
