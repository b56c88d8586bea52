"""As-of (most-recent-prior) join — the canonical "operator Spark lacks"
(SURVEY.md §2.5 custom-operator scope), built as a composition of
existing DataFrame ops rather than a Pandas UDF.

Semantics: for every left row, attach the payload of the right row with
the same key and the greatest timestamp ≤ the left timestamp (DuckDB's
``ASOF JOIN``, kdb's ``aj``). The naive formulation — range self-join
``l.ts >= r.ts`` + argmax — explodes to O(|L|·|R|) per key. This
implementation is the scalable union-sort-carry form:

    union(tag L/R) → window over (key ORDER BY ts, side) →
    last_value(right payload, ignorenulls) → keep L rows

One shuffle on the key, one per-partition sort — the same cost as any
keyed window; no pair space, no skew beyond what the key distribution
already has. At 100 TB this is the only formulation that survives: range
joins don't bucket, but sort-carry is linear after the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Attach, to each left row, `payload_cols` from the most recent right
    row with the same `key` and right.ts <= left.ts (ties: right row
    wins, i.e. a right row at exactly left.ts is visible).

    Output: all left columns + one `<col><suffix>` per payload column
    (null when no prior right row exists).

    The carried value is a single STRUCT of all payload columns, not one
    ``last(ignorenulls)`` per column: the struct is non-null for every
    right row even when individual payload fields are NULL, so a NULL
    field on the most recent matching right row is preserved as NULL
    instead of being skipped in favor of a stale older value (DuckDB
    ASOF JOIN semantics). One window evaluation instead of N, too.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    carry_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(carry_type).alias("_p"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_p"),
    )
    # align schemas for the union: left cols not present on the right → null
    for c in lcols:
        if c not in (key, ts):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    # NULL-key right rows can never be an as-of match: the declared
    # semantics are DuckDB ASOF JOIN / kdb aj, i.e. key EQUALITY, and
    # NULL equals nothing. Without this filter the window-partition
    # formulation quietly groups NULL keys together and hands NULL-key
    # left rows payloads from NULL-key right rows — caught by the NULL
    # fuzz stream (real corpora rarely show it). NULL-key LEFT rows
    # stay, and with no right rows in their partition their asof
    # columns are NULL, exactly the no-match outcome.
    # NULL-TIMESTAMP right rows can never match either: r.ts <= l.ts is
    # never TRUE for NULL (DuckDB ASOF agrees), but Spark sorts NULL
    # FIRST ascending, so an unfiltered NULL-ts right row would sort
    # before everything and its payload would be carried into every
    # left row as a phantom "earliest prior" match (r7 review wave 4,
    # verified by execution). NULL-ts LEFT rows stay: they sort before
    # all (now ts-non-NULL) right rows, so their carry is NULL — the
    # correct no-match outcome.
    r_tagged = r_tagged.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    r_tagged = r_tagged.select(*lcols, "_side", "_p")

    unioned = l_tagged.unionByName(r_tagged)
    # _side 0 (right) sorts before _side 1 (left) at equal ts → a right
    # row at exactly left.ts is already visible to that left row. The
    # payload struct is the FINAL sort key: with duplicate (key, ts)
    # right rows the carried payload would otherwise be
    # partition-order-dependent (r7 review wave 4); struct comparison
    # makes the winner the largest payload, deterministically.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"), F.col("_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        F.col("_side"),
        F.last(F.col("_p"), ignorenulls=True).over(w).alias("_carry"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_carry").getField(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
