"""Bucketed-table storage: pre-shuffled layout for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides on the join key — every query, every day. Bucketing
pays that shuffle ONCE at write time: both tables are hash-clustered
into the same number of buckets on the join key, so every later join or
aggregation on that key reads co-located buckets and plans ZERO
exchanges (`test_bucketed_join_no_shuffle` pins this fact on the
physical plan). This is Spark's equivalent of the reference's Kafka
co-partitioning contract — Kafka Streams joins require both topics to
have the same partition count and keying (the `*-repartition` topic
mechanics in SURVEY.md §3.1); bucketing is the same contract for tables.

Notes that matter at scale:
- bucket count is a layout decision: pick so one bucket of the BIGGEST
  table fits an executor's working memory (AQE cannot re-split a bucket).
- `sortBy` within buckets additionally removes the sort from sort-merge
  joins (bucketed scan emits sorted runs).
- both sides must agree on bucket count and key, or Spark falls back to
  shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table registered as
    ``table`` (explicit ``path``, so no warehouse-dir writes)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def write_ordered_shards(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    num_shards: int,
) -> None:
    """Deterministic ordered export: range-partition on ``order_cols``
    into ``num_shards`` files, each internally sorted — the final
    write of a corpus build (training shards readable in a stable
    global order: shard i's keys all precede shard i+1's).

    ``repartitionByRange`` samples the key distribution, so shard
    BOUNDARIES can shift between runs on different data layouts — but
    every shard is still internally sorted and the concatenation is
    always the same total order; readers that consume shards in index
    order see a byte-stable sequence once the per-file ordering is
    fixed by sortWithinPartitions. One range shuffle + per-partition
    sort — the minimum possible for globally ordered output (a global
    orderBy would plan the same exchange, then collapse everything
    through one writer task if coalesced).
    """
    (
        df.repartitionByRange(num_shards, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
