"""Single-scan M-way branch sink.

``branch()`` as N filters re-reads the parent once per leg in pure batch
mode (ARCHITECTURE.md §8) — fine for 2 legs on a cached micro-batch,
wrong for an M-way split of a 100 TB scan. This sink restores the
read-once property of Kafka Streams' branch-to-topics
(PaymentTopology.java:91-97) for arbitrary M: compute a routing tag as a
COLUMN, write once partitioned by the tag, and each "topic" is the
``tag=<value>/`` subtree — readable independently, partition-pruned.

One scan, zero shuffles (partitionBy on write splits files per task, not
across the cluster); rows matching no branch are dropped (null tag),
preserving the branch() no-catch-all contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route_tag(*branches: tuple[str, Column]) -> Column:
    """First-match routing tag: name of the first predicate a row
    matches, else null (dropped — Kafka Streams branch() contract)."""
    tag = F.lit(None).cast("string")
    for name, pred in reversed(branches):
        tag = F.when(pred, F.lit(name)).otherwise(tag)
    return tag


def write_branched(
    df: DataFrame,
    path: str,
    *branches: tuple[str, Column],
    tag_col: str = "branch",
) -> None:
    """Write every branch in ONE pass: `path/<tag_col>=<name>/...`.
    Unmatched rows are dropped before the write."""
    tagged = df.withColumn(tag_col, route_tag(*branches)).filter(
        F.col(tag_col).isNotNull()
    )
    tagged.write.mode("overwrite").partitionBy(tag_col).parquet(path)


def read_branch(spark, path: str, name: str, tag_col: str = "branch") -> DataFrame:
    """Read one branch's subtree — partition-pruned to `tag=<name>/`."""
    return spark.read.parquet(path).filter(F.col(tag_col) == name).drop(tag_col)
