"""Corpus/table profiling — the data-QA step a training pipeline runs
before and after every curation stage (null creep, cardinality checks,
range drift).

One job, one pass over the data: all per-column measures are computed
in a single wide aggregate (count/nulls/min/max are plain agg
expressions; distinct counts ride the same aggregate), then the 1-row
wide result is unpivoted driver-free with ``stack``. Contrast with the
naive one-query-per-column profiler: N scans of a 100 TB table instead
of one.

Exact ``countDistinct`` over k columns makes Catalyst plan an Expand
(k× row multiplication before the partial aggregate) — correct but the
map-side cost scales with k. ``profile_columns(..., exact=False)``
swaps in HLL++ ``approx_count_distinct`` (2% default error): no
Expand, one buffer per column — the form to run at 100 TB; the exact
form doubles as its oracle twin at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, n_distinct,
    min_str, max_str), one output row per requested column.

    min/max are computed on the native type (numeric min, not
    lexicographic) and cast to string afterwards so heterogeneous
    columns fit one schema. n_distinct excludes NULLs (SQL COUNT
    DISTINCT semantics). Deterministic for ``exact=True``;
    ``exact=False`` is the HLL++ scale path (rows-only contract).
    """
    cols = cols or df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
