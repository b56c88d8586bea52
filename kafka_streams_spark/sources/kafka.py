"""Kafka source/sink builders — the production IO path of the reference
(topics `payment-topic` → `rails-foo-topic`/`rails-bar-topic`,
application.yml:13-15), expressed as Structured Streaming readers and
writers.

This container has no Kafka broker or spark-sql-kafka connector jar, so
these builders are exercised by unit tests only up to plan construction;
the transform core they feed is the same one the file-based tests drive
end-to-end. On a real deployment add
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.

Scale notes: source parallelism = Kafka partition count (minPartitions
can oversplit); `maxOffsetsPerTrigger` bounds micro-batch size so a
backlogged topic can't produce an unboundedly large batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_spark.schema import PAYMENT_FIELDS, payment_to_json

DEFAULT_PAYMENT_TOPIC = "payment-topic"  # application.yml:13
RAILS_FOO_TOPIC = "rails-foo-topic"  # application.yml:14
RAILS_BAR_TOPIC = "rails-bar-topic"  # application.yml:15


def read_payment_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_PAYMENT_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming reader for the payment topic; returns the raw
    (key binary, value binary, ...) frame — compose with
    ``schema.parse_payment_stream`` for typed payments."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def to_kafka_sink(
    payments: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Writer for an outbound rails topic: key = record key, value = the
    pinned-field-order JSON (JsonSerializer parity). Returns the started
    StreamingQuery."""
    from pyspark.sql import functions as F

    out = payments.select(
        F.col("key").cast("binary").alias("key"),
        payment_to_json().cast("binary").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def payment_columns_for_sink(df: DataFrame) -> DataFrame:
    """Project exactly the wire columns (key + the six payment fields) —
    shared by Kafka and file sinks so both serialize identically."""
    from pyspark.sql import functions as F

    return df.select("key", *[F.col(c) for c in PAYMENT_FIELDS])
