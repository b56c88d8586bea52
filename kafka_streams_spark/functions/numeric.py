"""Numeric helpers with pinned cross-engine semantics."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def java_round(col: Column) -> Column:
    """Java ``Math.round(double)`` == ``floor(x + 0.5)`` as a Column -> long.

    The reference FX conversion uses Math.round (PaymentTopology.java:61).
    Spark's ``round()`` is HALF_UP (rounds -2.5 -> -3) while Math.round
    gives -2; ``floor(x + 0.5)`` is exact Java semantics for all inputs and
    is also expressible verbatim in DuckDB SQL for oracle parity.
    """
    return F.floor(col + F.lit(0.5)).cast("long")


def money(col: Column, scale: int = 6) -> Column:
    """Cast an aggregate to a fixed DECIMAL(38, scale).

    Summing doubles is order-dependent across partitions — a parallel Spark
    sum and a serial DuckDB sum can differ in the last ulps and break
    value-hash comparison. Decimal arithmetic is exact and associative, so
    aggregates computed on DECIMAL match bit-for-bit regardless of
    partitioning. Cast to a fixed precision so the output schema is stable
    across engines too.
    """
    return col.cast(f"decimal(38,{scale})")
