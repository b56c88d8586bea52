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
    # positional internal aliases + backtick-quoted source columns: the
    # old f"_null_{c}" aliases broke on any column name that is not a
    # bare SQL identifier (spaces, dots, quotes — all legal in a Spark
    # schema), crashing the profiler on exactly the messy inputs it
    # exists to describe (r10 review fix)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{i}"),
            distinct(col).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")


def value_histogram(
    df: DataFrame,
    value_col: str,
    bin_width_cents: int = 100_000,
    scale: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable fixed-bin histogram sketch of a numeric column — the
    quantile-family member of the engine's sketch trio (HLL++ for
    distincts, CMS for frequencies, this for quantiles/distributions).

    Values are first snapped to an integer grid (``floor(x·scale+0.5)``,
    the engine's money convention — see oracles.py header), then bucketed
    with INTEGER division ``cents div bin_width_cents``; both steps are
    bit-deterministic cross-engine, so unlike KLL/GK (whose internals are
    implementation-defined, the reason ``percentile_approx`` is a
    rows-only path) the sketch itself is oracle-checkable.

    Scale shape: one map-only projection into one aggregation shuffle
    whose map-side partial combine collapses every partition to
    ≤ value_range/bin_width rows before network transfer. Histograms of
    two corpora merge by summing counters on ``bucket`` — the
    mergeability that makes this the per-shard/per-day distribution
    summary (streamed twin: ``streaming/sketch_stream.run_histogram_stream``).
    NULL values are excluded (SQL aggregate semantics; pair with
    ``profile_columns`` for null accounting).

    ``group_cols`` makes the sketch STRATIFIED — (group..., bucket,
    counter), one distribution per stratum in the same single shuffle
    (the per-language/per-source length-distribution audit). The grid
    is shared across strata, so per-stratum histograms still merge by
    addition and cross-stratum comparisons line bucket-for-bucket.

    Output: (group_cols..., bucket BIGINT, counter BIGINT) — bucket b
    covers [b·bin_width, (b+1)·bin_width) in cents.
    """
    cents = F.floor(F.col(value_col) * F.lit(scale) + F.lit(0.5)).cast("bigint")
    groups = list(group_cols or [])
    # FLOOR division in pure int64: pmod makes the remainder non-negative,
    # so the truncating `div` is exact — no double round-trip (bigint/int
    # division would go through double and lose precision past 2^53), and
    # negative values land in their floor bucket (`%`would truncate
    # toward zero and disagree with the oracle's Python-style `//`).
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, cents.alias("_cents"))
        .select(
            *groups,
            F.expr(
                f"(_cents - pmod(_cents, {int(bin_width_cents)})) "
                f"div {int(bin_width_cents)}"
            )
            .cast("bigint")
            .alias("bucket"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.count("*").alias("counter"))
    )


def histogram_quantiles(
    hist: DataFrame, qs: list[float], bin_width_cents: int = 100_000, scale: int = 100
) -> DataFrame:
    """Quantile estimates read off a :func:`value_histogram` sketch:
    for each q, the UPPER EDGE of the first bucket whose cumulative
    count reaches rank ``max(1, ceil(q·n))`` — a deterministic estimate
    within one bin width of the exact quantile (the trade the sketch
    makes: constant state, mergeable, rank error bounded by the bucket
    population).

    The cumulative window runs over the HISTOGRAM table, which is
    bounded by value_range/bin_width by construction (≤ a few thousand
    rows for any sane bin choice) — the documented bounded-table
    exception to the no-global-window rule (same class as zipf's ≤k
    head, text.py:1598). The corpus itself is never windowed.

    Output: (q DOUBLE, est DOUBLE) — est in original value units.
    """
    from pyspark.sql import Window

    n_total = hist.agg(F.sum("counter").alias("_n"))
    cum = hist.withColumn(
        "_cum",
        F.sum("counter").over(
            # global-window-bounded(n_buckets): input is the histogram
            # bucket table — one row per bucket, never per data row
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).crossJoin(F.broadcast(n_total))
    qdf = cum.select(
        "bucket",
        "_cum",
        "_n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n")))
    hit = qdf.filter(F.col("_cum") >= rank)
    est_cents = (F.min("bucket") + F.lit(1)) * F.lit(bin_width_cents)
    return (
        hit.groupBy("q")
        .agg((est_cents / F.lit(float(scale))).alias("est"))
        .select("q", "est")
    )


def histogram_quantiles_by_group(
    hist: DataFrame,
    qs: list[float],
    group_cols: list[str],
    bin_width_cents: int = 100_000,
    scale: int = 100,
) -> DataFrame:
    """Per-stratum quantiles read off a STRATIFIED
    :func:`value_histogram` sketch (``group_cols=...``): the same
    upper-edge rule as :func:`histogram_quantiles`, windowed per
    stratum — per-source p50/p99 document lengths from one sketch scan.
    The cumulative window partitions on the stratum and runs over the
    bounded per-stratum bucket rows (≤ range/bin each), so no partition
    ever holds more than one stratum's buckets.

    Output: (group_cols..., q DOUBLE, est DOUBLE).
    """
    from pyspark.sql import Window

    groups = list(group_cols)
    n_total = hist.groupBy(*groups).agg(F.sum("counter").alias("_n"))
    cum = hist.withColumn(
        "_cum",
        F.sum("counter").over(
            Window.partitionBy(*groups)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).join(n_total, groups)
    qdf = cum.select(
        *groups,
        "bucket",
        "_cum",
        "_n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n")))
    hit = qdf.filter(F.col("_cum") >= rank)
    est_cents = (F.min("bucket") + F.lit(1)) * F.lit(bin_width_cents)
    return (
        hit.groupBy(*groups, "q")
        .agg((est_cents / F.lit(float(scale))).alias("est"))
        .select(*groups, "q", "est")
    )


def join_size_audit(
    a: DataFrame, key_a: str, b: DataFrame, key_b: str
) -> DataFrame:
    """Pre-flight pricing of an equi-join from per-key COUNT profiles —
    the join-family member of the repo's audit convention
    (`lsh_bucket_stats` / `hamming_bucket_stats` / `knn_recall_audit`):
    measure what a shuffle will cost BEFORE running it.

    The exact inner-join output cardinality is
    sum over shared keys of cnt_a(key) * cnt_b(key) — computable from
    the two (key, count) profile tables alone, so at 100 TB this audit
    shuffles one aggregated row per distinct key instead of the data
    itself. The read-off tells you which physical strategy the real
    join needs: `top_key_share` near 1.0 says one hot key produces
    almost all output (salt it — `functions.partitioning.salted_join`
    — or split it off); `join_rows` >> both inputs says the join
    explodes (fix the key, not the cluster); tiny `n_keys_b` says
    broadcast.

    NULL keys never satisfy an equi-join, so they are excluded from
    key/`join_rows` figures but still counted in `n_rows_*` (the
    difference is itself a data-quality signal). Tie-break for
    `top_key`: largest (contribution, key-string) pair, so the output
    is deterministic. Empty join: top_key NULL, top_key_share 0.0.

    Output 1 row: (n_rows_a, n_rows_b, n_keys_a, n_keys_b,
    n_shared_keys, join_rows BIGINT, top_key STRING,
    top_key_share DOUBLE).
    """
    # One scan per side: the audit is a pure read-off of the two
    # per-key profiles (key_profile), which keep the NULL-key group so
    # row totals and distinct-key counts are derived from the profile
    # itself. Each profile feeds two consumers with DIFFERENT exchange
    # shapes (a 1-row totals agg and the contribution join), which
    # Spark's ReuseExchange cannot unify — materialize_shared computes
    # each profile once and lets both branches read it.
    from kafka_streams_spark.functions.partitioning import materialize_shared

    return join_size_from_profiles(
        materialize_shared(key_profile(a, key_a)),
        materialize_shared(key_profile(b, key_b)),
    )


def auto_join(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    how: str = "inner",
    broadcast_max_rows: int = 1_000_000,
    skew_share: float = 0.5,
    salt_buckets: int = 8,
    profile_a: DataFrame | None = None,
    profile_b: DataFrame | None = None,
) -> DataFrame:
    """Equi-join routed by :func:`join_size_audit`'s verdict — the
    consumer the audit was missing (r7 verdict item 7): ``knn_auto``
    routes on a measured recall audit; this routes on the measured join
    pricing, so the strategy choice is itself a checkable output
    instead of advice in a docstring.

    Routing rule, first match wins (all figures from the 1-row audit —
    a bounded dispatch collect, the knn_auto budget):

    1. ``broadcast_b``  — n_rows_b <= broadcast_max_rows: ship the
       dimension to every executor, no shuffle of ``a`` at all.
    2. ``broadcast_a``  — inner joins only (side swap is illegal for
       outer/semi shapes) and n_rows_a fits: broadcast the other side.
    3. ``salted``       — top_key_share >= skew_share AND
       n_rows_b · salt_buckets <= n_rows_a: one hot key would put most
       of the join's output through one task; salt the big side and
       replicate the small one (`salted_join`) so the hot key spreads
       over ``salt_buckets`` tasks. Only for join shapes where
       replication cannot duplicate unmatched rows. The second clause
       (r9, advisor find) prices the rewrite itself: salting replicates
       ``b`` salt_buckets× through the exchange, so when ``b`` is
       comparable to ``a`` the "replicate the small one" precondition
       fails and the replicated shuffle would move MORE data than the
       plain one it replaces — fall through to shuffle (where AQE's
       skew-join split still gets a shot at the hot key).
    4. ``shuffle``      — the plain hash/SMJ exchange; AQE finishes the
       sizing at runtime.

    The audit's remaining verdict — ``join_rows`` far above both inputs
    (an exploding key, "fix the key, not the cluster") — is deliberately
    NOT auto-routed: no physical strategy repairs a wrong key, so the
    caller must look at the audit, not at a router.

    Both key columns end up as ONE output column named ``key_a``
    (``b``'s key is renamed before the join); other column names must
    be disjoint — loudly rejected otherwise. Output: (route, key_a,
    a-columns..., b-columns...), identical layout whichever route
    fires, so downstream code and the DuckDB oracle twin (which derives
    the route with the same CASE over the same audit CTE) never depend
    on the decision.

    At 100 TB the audit prices the join from two per-key profiles (one
    aggregated row per distinct key shuffles, never the data), and the
    routed join is exactly the plan you would have hand-written after
    reading the audit. With ``profile_a``/``profile_b`` (both or
    neither) the audit reads pre-built :func:`key_profile` tables —
    including the stream-maintained store
    (``streaming/sketch_stream.run_key_profile_stream``) — so a
    recurring or stream-static join re-routes as the live profile
    evolves without touching either input at plan time."""
    from kafka_streams_spark.functions.partitioning import salted_join

    if key_a != key_b:
        if key_a in b.columns:
            raise ValueError(
                f"auto_join would rename {key_b!r} to {key_a!r} but b "
                f"already has a column {key_a!r}"
            )
        b = b.withColumnRenamed(key_b, key_a)
    overlap = (set(a.columns) & set(b.columns)) - {key_a}
    if overlap:
        raise ValueError(
            f"auto_join needs disjoint non-key columns; both sides have "
            f"{sorted(overlap)} — rename before joining"
        )

    # r9 (the posting-profile-consumer pattern): pre-built / stream-
    # maintained key_profile tables (run_key_profile_stream +
    # read_key_profile) replace the audit's own profiling scans — the
    # route then prices a stream-static join from live state with NO
    # access to the data at plan time. BOTH profiles must be given
    # (pricing one live side against a stale other is the bug this
    # all-or-nothing check prevents).
    if (profile_a is None) != (profile_b is None):
        raise ValueError("auto_join needs both profiles or neither")
    if profile_a is not None and profile_b is not None:
        from kafka_streams_spark.functions.partitioning import (
            materialize_shared,
        )

        row = join_size_from_profiles(
            materialize_shared(profile_a), materialize_shared(profile_b)
        ).collect()[0]
    else:
        row = join_size_audit(a, key_a, b, key_a).collect()[0]
    salt_ok = how in {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if row["n_rows_b"] <= broadcast_max_rows:
        route = "broadcast_b"
        joined = a.join(F.broadcast(b), key_a, how)
    elif how == "inner" and row["n_rows_a"] <= broadcast_max_rows:
        route = "broadcast_a"
        joined = b.join(F.broadcast(a), key_a, how)
    elif (
        salt_ok
        and row["top_key_share"] >= skew_share
        and row["n_rows_b"] * salt_buckets <= row["n_rows_a"]
    ):
        route = "salted"
        joined = salted_join(a, b, [key_a], salt_buckets=salt_buckets, how=how)
    else:
        route = "shuffle"
        joined = a.join(b, key_a, how)

    out_cols = (
        [key_a]
        + [c for c in a.columns if c != key_a]
        + [c for c in b.columns if c != key_a and c in joined.columns]
    )
    return joined.select(F.lit(route).alias("route"), *out_cols)


def key_profile(df: DataFrame, key_col: str) -> DataFrame:
    """The per-key COUNT profile: (k STRING — NULL group kept,
    cnt BIGINT). This is the persistable/streamable state behind
    :func:`join_size_from_profiles`: profile each table ONCE (its one
    groupBy shuffle), persist or maintain it live
    (``streaming/sketch_stream.run_key_profile_stream``), then price
    any join against it without touching the data again. Mergeable by
    grouped sum — counts are associative."""
    return df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def join_size_from_profiles(pa: DataFrame, pb: DataFrame) -> DataFrame:
    """The :func:`join_size_audit` read-off from two already-built
    :func:`key_profile` tables — the form that prices a join between
    a LIVE stream (profile maintained incrementally) and a static
    table, or between two persisted profiles, in O(distinct keys)
    without rescanning either input. Output schema identical to
    join_size_audit."""
    pa = pa.select(F.col("k"), F.col("cnt").alias("ca"))
    pb = pb.select(F.col("k"), F.col("cnt").alias("cb"))
    # no NULL filter needed: the equi-join itself never matches NULL
    # keys, and leaving the profiles unfiltered keeps both consumers'
    # subtrees identical
    contrib = pa.join(pb, "k").select(
        "k", (F.col("ca") * F.col("cb")).cast("bigint").alias("c")
    )
    joined = contrib.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("join_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_shared_keys"),
        F.max(F.struct(F.col("c"), F.col("k"))).alias("_top"),
    )
    ta = pa.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("bigint").alias("n_rows_a"),
        F.count(F.col("k")).cast("bigint").alias("n_keys_a"),
    )
    tb = pb.agg(
        F.coalesce(F.sum("cb"), F.lit(0)).cast("bigint").alias("n_rows_b"),
        F.count(F.col("k")).cast("bigint").alias("n_keys_b"),
    )
    return (
        ta.crossJoin(tb)
        .crossJoin(joined)
        .select(
            "n_rows_a",
            "n_rows_b",
            "n_keys_a",
            "n_keys_b",
            "n_shared_keys",
            "join_rows",
            F.when(F.col("join_rows") > 0, F.col("_top.k")).alias("top_key"),
            F.when(
                F.col("join_rows") > 0,
                F.col("_top.c").cast("double")
                / F.col("join_rows").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_key_share"),
        )
    )


def rank_sketch(
    df: DataFrame,
    value_col: str,
    hash_col: str,
    k: int = 1024,
) -> DataFrame:
    """Mergeable bounded-state RANK sketch for UNBOUNDED value ranges —
    the companion :func:`value_histogram` cannot be: the histogram's
    state is value_range/bin_width rows, which explodes (or needs a
    range guess) when the range is open-ended; this sketch's state is
    exactly ``k + 1`` rows whatever the values are.

    Design: a bottom-k hash sample (the KMV / theta-sketch family).
    Every non-NULL row gets ``h = int64(md5(hash_col)[:15])``; the
    sketch keeps the ``k`` hash-smallest (h, value) pairs — a uniform
    row sample selected by a DETERMINISTIC function of the data — plus
    one count row carrying exact ``n``. We ship this instead of a
    literal KLL compactor deliberately: KLL's randomized, buffer-order-
    dependent compaction cannot be made reproducible under Spark's
    nondeterministic Arrow batching, while bottom-k is a pure function
    of the row multiset — order-, batching-, and merge-shape-
    independent, so the streamed twin equals the batch sketch EXACTLY
    and the whole sketch is oracle-checkable (md5 reproduces in DuckDB;
    KLL internals are implementation-defined, the reason
    ``percentile_approx`` stays a rows-only path). Rank error is the
    sampling bound O(n/sqrt(k)) vs KLL's O(n/k) — the price of
    determinism, budgeted by raising k (state is 16 bytes/row).

    ``hash_col`` must uniquely identify a row (a key column); duplicate
    keys would bias the sample. Plan shape: one map-only projection,
    one TakeOrderedAndProject (per-partition heap of k, driver merge of
    k*partitions rows — never a global sort), one 1-row count
    aggregate. Merging two sketches = bottom-k of the sample union +
    summed counts (:func:`rank_sketch_merge`); streamed twin:
    ``streaming/sketch_stream.run_rank_sketch_stream``.

    Output: k rows (h bigint, value double, n NULL) + 1 count row
    (h NULL, value NULL, n bigint).
    """
    # hash_col NULLs are filtered too: md5(NULL) is NULL, and an
    # h=NULL sample row would (a) collide with the count-row sentinel
    # (rank_sketch_merge would misclassify it) and (b) sort NULLS
    # FIRST in Spark vs NULLS LAST in DuckDB — cross-engine divergence
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(hash_col).isNotNull()
    ).select(
        _kmv_hash(F.col(hash_col)).alias("h"),
        F.col(value_col).cast("double").alias("value"),
    )
    sample = vals.orderBy("h", "value").limit(int(k)).select(
        "h", "value", F.lit(None).cast("bigint").alias("n")
    )
    count_row = vals.agg(
        F.lit(None).cast("bigint").alias("h"),
        F.lit(None).cast("double").alias("value"),
        F.count("*").cast("bigint").alias("n"),
    )
    return sample.unionAll(count_row)


def rank_sketch_merge(sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Merge any number of :func:`rank_sketch` tables (their rows
    unioned into one DataFrame): bottom-k over the combined samples +
    summed counts. Associative and order-independent — merge(merge(a,b),c)
    == merge(a,b,c) — because min-k selection and addition both are;
    this is what lets per-batch streamed deltas equal the one-shot
    batch sketch bit-for-bit."""
    samples = sketches.filter(F.col("h").isNotNull())
    merged_sample = samples.orderBy("h", "value").limit(int(k)).select(
        "h", "value", F.lit(None).cast("bigint").alias("n")
    )
    merged_count = sketches.filter(F.col("h").isNull()).agg(
        F.lit(None).cast("bigint").alias("h"),
        F.lit(None).cast("double").alias("value"),
        F.sum("n").cast("bigint").alias("n"),
    )
    return merged_sample.unionAll(merged_count)


def rank_sketch_grouped(
    df: DataFrame,
    value_col: str,
    hash_col: str,
    group_cols: list[str],
    k: int = 1024,
) -> DataFrame:
    """Per-group (stratified) :func:`rank_sketch` — the rank-sketch
    family's analog of `length_histogram_by_source` vs
    `price_histogram`: one bounded sketch PER STRATUM, so per-source /
    per-language quantiles come from <= k rows per group with no range
    grid. Same determinism argument as the global form (md5 bottom-k
    is a pure function of the row multiset), so fully oracle-checkable
    and mergeable by :func:`rank_sketch_grouped_merge`.

    Plan shape: one scan; the per-group bottom-k compiles to
    WindowGroupLimit (pre-exchange k-row heaps per partition per
    group — never a global sort), plus one per-group count aggregate
    sharing the scan.

    Output per group: k sample rows (groups..., h, value, n NULL) +
    1 count row (groups..., h NULL, value NULL, n BIGINT)."""
    from pyspark.sql import Window

    groups = list(group_cols)
    # hash_col NULLs filtered for the same sentinel-collision /
    # NULLS-FIRST-vs-LAST reasons as the global rank_sketch
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(hash_col).isNotNull()
    ).select(
        *groups,
        _kmv_hash(F.col(hash_col)).alias("h"),
        F.col(value_col).cast("double").alias("value"),
    )
    w = Window.partitionBy(*groups).orderBy("h", "value")
    sample = (
        vals.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(k))
        .select(*groups, "h", "value", F.lit(None).cast("bigint").alias("n"))
    )
    counts = vals.groupBy(*groups).agg(
        F.lit(None).cast("bigint").alias("h"),
        F.lit(None).cast("double").alias("value"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return sample.unionAll(counts)


def rank_sketch_grouped_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 1024
) -> DataFrame:
    """Merge unioned :func:`rank_sketch_grouped` tables: per-group
    bottom-k over the combined samples + per-group summed counts.
    Associative and order-independent for the same reason as the
    global merge."""
    from pyspark.sql import Window

    groups = list(group_cols)
    w = Window.partitionBy(*groups).orderBy("h", "value")
    merged_sample = (
        sketches.filter(F.col("h").isNotNull())
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(k))
        .select(*groups, "h", "value", F.lit(None).cast("bigint").alias("n"))
    )
    merged_count = (
        sketches.filter(F.col("h").isNull())
        .groupBy(*groups)
        .agg(
            F.lit(None).cast("bigint").alias("h"),
            F.lit(None).cast("double").alias("value"),
            F.sum("n").cast("bigint").alias("n"),
        )
    )
    return merged_sample.unionAll(merged_count)


def rank_sketch_grouped_quantiles(
    sketch: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Per-group quantile estimates read off a
    :func:`rank_sketch_grouped`: within each group the sample is a
    uniform hash-selected subset, so the q-quantile estimate is the
    sample value at rank ``clamp(ceil(q*k'), 1, k')`` by value order
    (k' = that group's sample size). Every window here is PARTITIONED
    by the groups — no bounded-table whitelist entry needed.

    Output: (group_cols..., q DOUBLE, est DOUBLE)."""
    from pyspark.sql import Window

    groups = list(group_cols)
    samples = sketch.filter(F.col("h").isNotNull())
    kp = samples.groupBy(*groups).agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
    ranked = samples.withColumn(
        "_r", F.row_number().over(Window.partitionBy(*groups).orderBy("value", "h"))
    ).join(F.broadcast(kp), groups)
    qdf = ranked.select(
        *groups,
        "value",
        "_r",
        "_k",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.least(
        F.col("_k"), F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_k")))
    )
    return (
        qdf.filter(F.col("_r") >= rank)
        .groupBy(*groups, "q")
        .agg(F.min("value").alias("est"))
    )


def _kmv_hash(col) -> "F.Column":
    """int64 in [0, 2^60): first 15 hex chars of md5 — the shared
    deterministic hash of the bottom-k sketch family (same mapping as
    :func:`rank_sketch`), chosen because DuckDB reproduces it exactly
    so every sketch in the family is hash-checkable, not rows-only."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )


# KMV distinct estimate from a bottom-k sample: exact below k, else
# (k-1) / (h_k / 2^60). The numerator (k-1)*2^60 is exactly
# representable in a double for any practical k (k-1 contributes the
# only significant bits), and IEEE division + floor reproduce
# bit-for-bit across engines — the reason the estimate itself can sit
# in a hash-checked contract.
def _kmv_estimate(kk, hk, k: int):
    c = float((k - 1) * (1 << 60))
    return (
        F.when(kk < F.lit(int(k)), kk)
        .otherwise(F.floor(F.lit(c) / hk))
        .cast("bigint")
    )


def distinct_kmv(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Deterministic distinct-count estimate per group — the
    oracle-checkable companion to HLL++ ``approx_count_distinct``
    (the `approx_users_by_type` contract): HLL's register internals
    are implementation-defined, so that contract can only be checked
    rows-only; this KMV (k-minimum-values) estimator is a pure
    function of the row multiset — md5 bottom-k selection reproduces
    exactly in DuckDB, so estimate VALUES are differentially checked.

    State per group is k rows (vs HLL's constant registers) — the
    trade is checkability and mergeability-by-union for a k× larger
    (but still tiny and bounded) sketch. Exact below k distinct keys;
    above, the classic unbiased KMV read-off est = (k-1)/u_k with
    u_k = h_k/2^60, relative error ~1/sqrt(k-2).

    Plan shape: one distinct over (group, h) — map-side partial dedup,
    one shuffle of distinct hashes — then a per-group bottom-k via
    ``row_number`` (Spark's WindowGroupLimit pushes the <= k filter
    into per-partition heaps before the exchange, so only k rows per
    group per partition shuffle) and a per-group 1-row read-off.
    Groups whose key is entirely NULL emit no row (SQL COUNT DISTINCT
    over nothing — mirrored by the oracle).

    Output: (group_cols..., n_distinct_est BIGINT, sample_k BIGINT).
    """
    groups = list(group_cols or [])
    return kmv_read_off(kmv_state(df, key_col, groups, k), groups, k)


def _kmv_bottomk(hashed: DataFrame, groups: list[str], k: int) -> DataFrame:
    """Per-group bottom-k of already-hashed distinct (groups..., h)
    rows. With groups: row_number + filter (WindowGroupLimit pushes the
    <= k cut into pre-exchange per-partition heaps); without:
    orderBy+limit (TakeOrderedAndProject — no global sort)."""
    from pyspark.sql import Window

    if groups:
        w = Window.partitionBy(*groups).orderBy("h")
        return (
            hashed.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= int(k))
            .drop("_r")
        )
    return hashed.orderBy("h").limit(int(k))


def kmv_state(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """The persistable KMV state: per-group bottom-k md5 hashes of the
    distinct keys — <= k rows per group regardless of input size, and a
    pure function of the row multiset (no randomness, no order
    dependence). Mergeable by :func:`kmv_state_merge`; read off with
    :func:`kmv_read_off`. Output: (group_cols..., h BIGINT)."""
    groups = list(group_cols or [])
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, _kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    return _kmv_bottomk(hashed, groups, k)


def kmv_state_merge(
    states: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Merge a union of :func:`kmv_state` partials back to <= k rows
    per group. Associative and order-independent (bottom-k of a union
    of bottom-ks == bottom-k of the union — any hash in the union's
    bottom-k has < k union hashes below it, hence < k of its own
    partial's hashes below it), so merged state equals the one-shot
    state of all rows, bit-for-bit — the property that makes the
    streamed twin (:func:`~kafka_streams_spark.streaming.sketch_stream.
    run_kmv_stream`) exactly equal to the batch sketch."""
    groups = list(group_cols or [])
    return _kmv_bottomk(states.select(*groups, "h").distinct(), groups, k)


def kmv_read_off(
    state: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Distinct-count read-off of a :func:`kmv_state` table: exact
    sample count below k, else the (k-1)/u_k estimate. Output:
    (group_cols..., n_distinct_est BIGINT, sample_k BIGINT)."""
    groups = list(group_cols or [])
    agg = state.groupBy(*groups).agg(
        F.count("*").cast("bigint").alias("kk"), F.max("h").alias("hk")
    )
    return agg.select(
        *groups,
        _kmv_estimate(F.col("kk"), F.col("hk"), k).alias("n_distinct_est"),
        F.col("kk").alias("sample_k"),
    )


def kmv_set_sketch(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """The persistable k-row set sketch: bottom-k md5 hashes of the
    distinct keys. This is the 100 TB form of set comparison — sketch
    each corpus snapshot ONCE (one scan + one distinct shuffle), persist
    the k-row table, then answer any pairwise overlap/Jaccard/distinct
    question between snapshots in O(k) from the sketches alone
    (:func:`kmv_overlap`), where the exact :func:`~kafka_streams_spark.
    operators.text.corpus_overlap` must re-scan both corpora per pair.

    Output: <= k rows (h BIGINT), ascending by construction."""
    return kmv_state(df, key_col, None, k)


def kmv_overlap(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """Union size / intersection size / Jaccard estimates from two
    :func:`kmv_set_sketch` tables (both built with the same ``k``).

    Correctness of the composition: the bottom-k of A∪B is a subset of
    bottom-k(A) ∪ bottom-k(B) (any hash among the k smallest of the
    union has < k union hashes below it, hence < k of A's hashes below
    it — so it is in A's bottom-k whenever it is in A at all), so
    membership flags read off the two sketches are exact within the
    union sample, and rho = |sample ∩ A ∩ B| / |sample| is the standard
    KMV Jaccard estimator. All arithmetic is IEEE double on both
    engines — the whole 1-row result is hash-checked, not rows-only.

    Empty ∪ empty follows the corpus_overlap / token_set_jaccard
    convention: Jaccard 1.0, sizes 0.

    Output 1 row: (n_union_est BIGINT, n_shared_est BIGINT,
    jaccard_est DOUBLE, sample_k BIGINT)."""
    a = sketch_a.select("h", F.lit(True).alias("in_a"))
    b = sketch_b.select("h", F.lit(True).alias("in_b"))
    u = a.join(b, "h", "full_outer").select(
        "h",
        F.coalesce("in_a", F.lit(False)).alias("in_a"),
        F.coalesce("in_b", F.lit(False)).alias("in_b"),
    )
    s = u.orderBy("h").limit(int(k))
    agg = s.agg(
        F.count("*").cast("bigint").alias("kk"),
        F.max("h").alias("hk"),
        F.coalesce(
            F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_both"),
    )
    union_est = _kmv_estimate(F.col("kk"), F.col("hk"), k)
    jacc = F.when(F.col("kk") == 0, F.lit(1.0)).otherwise(
        F.col("n_both").cast("double") / F.col("kk").cast("double")
    )
    return agg.select(
        union_est.alias("n_union_est"),
        F.floor(
            F.when(F.col("kk") == 0, F.lit(0.0)).otherwise(
                F.col("n_both").cast("double")
                * union_est.cast("double")
                / F.col("kk").cast("double")
            )
        )
        .cast("bigint")
        .alias("n_shared_est"),
        jacc.alias("jaccard_est"),
        F.col("kk").alias("sample_k"),
    )


def corpus_overlap_kmv(
    a: DataFrame, b: DataFrame, n: int = 1, k: int = 256, text_col: str = "text"
) -> DataFrame:
    """Constant-state twin of :func:`~kafka_streams_spark.operators.
    text.corpus_overlap`: vocabulary overlap between two corpus slices
    estimated from two k-row KMV sketches of the token sets instead of
    a full-outer join of the complete distinct-gram tables. At 100 TB
    the exact form's join shuffles every distinct gram of both sides
    every time two snapshots are compared; this form reduces each side
    to k rows after its one distinct shuffle — and the sketches are
    exactly what :func:`kmv_set_sketch` persists, so N snapshots need
    N sketch builds, not N^2 corpus joins.

    Output 1 row: (n_union_est, n_shared_est BIGINT, jaccard_est
    DOUBLE, sample_k BIGINT)."""
    from kafka_streams_spark.operators.dedup import tokens, word_shingles

    def side(df: DataFrame) -> DataFrame:
        grams = (
            tokens(F.col(text_col))
            if n == 1
            else word_shingles(F.col(text_col), n)
        )
        return df.select(F.explode(grams).alias("gram"))

    return kmv_overlap(
        kmv_set_sketch(side(a), "gram", k), kmv_set_sketch(side(b), "gram", k), k
    )


def rank_sketch_quantiles(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates read off a :func:`rank_sketch`: the sample is
    a uniform (hash-selected) subset of the rows, so the q-quantile
    estimate is the sample value at rank ``clamp(ceil(q*k'), 1, k')``
    by value order (k' = sample size, = min(k, n)). The ranking window
    runs over the SAMPLE — <= k rows by construction, the documented
    bounded-table exception to the no-global-window rule (histogram
    bucket-table class).

    Output: (q DOUBLE, est DOUBLE)."""
    from pyspark.sql import Window

    samples = sketch.filter(F.col("h").isNotNull())
    kp = samples.agg(F.count("*").cast("bigint").alias("_k"))
    ranked = samples.withColumn(
        # global-window-bounded(k): input is the KMV sketch register —
        # at most k retained (value, h) rows, never the data
        "_r", F.row_number().over(Window.orderBy("value", "h"))
    ).crossJoin(F.broadcast(kp))
    qdf = ranked.select(
        "value",
        "_r",
        "_k",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.least(
        F.col("_k"), F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_k")))
    )
    return (
        qdf.filter(F.col("_r") >= rank)
        .groupBy("q")
        .agg(F.min("value").alias("est"))
    )
