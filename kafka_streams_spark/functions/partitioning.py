"""Partition-shape helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, by: str | None = None) -> DataFrame:
    """Ensure at least cluster-default parallelism before a CPU-heavy
    stage (explode, pair join, signature computation).

    Small inputs (one parquet file → one partition) otherwise serialize
    the whole downstream pipeline onto a single task. The repartition is
    applied only when the plan's current partitioning is below the
    default parallelism, so at real scale — where scans already produce
    thousands of splits — this is a no-op and costs no shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if by is not None:
        return df.repartition(target, F.col(by))
    return df.repartition(target)
