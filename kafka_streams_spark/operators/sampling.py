"""Deterministic sampling and shard-packing operators for training-data
pipelines.

Both operators are reproducibility-first: re-running the pipeline on the
same corpus yields byte-identical output — no RNG state, no
arrival-order dependence, no partition-count dependence. That property
is what makes 100 TB corpus builds auditable (a re-run after a cluster
failure must produce the same training set), and it is exactly what
`df.sample()` does NOT give you (seeded per-partition RNG: the sample
changes when partitioning changes).

Capability lineage: north-star scope from BASELINE.json (the reference
has no sampling/sharding surface); the same role as hash-based document
selection and shard assignment in public LLM-corpus pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_256: int = 32,
) -> DataFrame:
    """Deterministic content-hash sample: keep rows whose md5(id) falls
    below a threshold — rate ``rate_256``/256.

    The predicate compares the first two hex chars of md5(cast(id as
    string)) lexicographically against the threshold byte; lowercase hex
    strings order identically to their numeric values, so the same
    predicate is expressible in ANSI SQL verbatim (DuckDB oracle) with
    no bit-twiddling functions required. md5 is engine-portable (Spark
    and DuckDB emit identical lowercase hex); xxhash64 would be faster
    but is Spark-only and therefore un-oracle-able.

    Scale shape: a narrow filter on a projected hash — pushdown-friendly,
    no shuffle, and stable under repartitioning (unlike ``df.sample``).
    Membership is decided per id, so the sample composes across tables:
    joining two hash-sampled tables on the id keeps referential
    integrity (same ids survive on both sides).
    """
    if not 0 < rate_256 <= 256:
        raise ValueError("rate_256 must be in (0, 256]")
    if rate_256 == 256:
        # format(256,'02x') is the 3-char '100'; comparing the 2-char
        # prefix against it lexicographically would keep only buckets
        # '00'..'10' (~17/256) instead of everything.
        return df
    threshold = format(rate_256, "02x")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.filter(bucket < F.lit(threshold))


def uniform_unit(col: Column | str) -> Column:
    """Deterministic uniform-[0,1) value per id: the first 8 hex chars of
    md5(id) as an integer over 16^8. Engine-portable (md5 + conv are
    ANSI-expressible; DuckDB twin uses the same arithmetic), partition-
    invariant, and reproducible — the sampling primitive every operator
    here builds on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))


def temperature_mix(
    docs: DataFrame,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-flattened source mixing — the standard LLM-corpus
    recipe for up-weighting small/high-quality sources: target share of
    stratum s ∝ (n_s)^(1/T). T=1 keeps natural proportions; T→∞ gives
    uniform shares. Implemented as *downsampling only* (no replication,
    so the output is a subset and stays deduplicated): the keep rate
    ``rate_s = (n_s/n_min)^(1/T - 1)`` anchors the smallest stratum at
    1.0; with the negative exponent every larger stratum downsamples
    toward the flattened share (post-mix counts ∝ n_s^(1/T)).

    Shape: one tiny per-stratum count aggregate broadcast back (no
    driver-side collect), then a deterministic per-row hash predicate
    (:func:`uniform_unit`) — partition-invariant, reproducible, and
    pushdown-friendly. One narrow shuffle for the counts; the corpus
    itself never shuffles.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("_n_s"))
    n_min = counts.agg(F.min("_n_s").alias("_n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        stratum_col,
        # rounded to 9 dp: pow() is not IEEE-correctly-rounded, so the
        # last ulp may differ across engines; rounding pins the boundary
        # so the keep predicate is bit-identical in Spark and the oracle
        F.round(
            F.least(
                F.lit(1.0),
                F.pow(F.col("_n_s") / F.col("_n_min"), F.lit(1.0 / temperature - 1.0)),
            ),
            9,
        ).alias("_keep_rate"),
    )
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .filter(uniform_unit(id_col) < F.col("_keep_rate"))
        .drop("_keep_rate")
    )


def pack_token_shards(
    docs: DataFrame,
    budget: int = 4000,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
) -> DataFrame:
    """Assign documents to contiguous training shards of ~``budget``
    tokens each, per stratum.

    Greedy contiguous packing in deterministic (stratum, id) order:
    ``shard_id = (cumulative_tokens_before_doc) div budget``. A shard
    may overshoot the budget by at most one document — the standard
    sequence-packing compromise (splitting documents across shards is
    the tokenizer's job, not the planner's). Token counts use the
    BPE-ish regex segmentation (`text.bpe_ish_count`) — the same budget
    currency as the curation pipeline.

    One shuffle (hash on stratum) + one in-partition running sum — the
    same cost shape as any windowed cumsum. Skew note: strata are
    corpus sources; if one source dominates, the window partition is
    that source's full doc list — at 100 TB, pre-split hot strata by a
    salt on a higher-level grouping (e.g. crawl snapshot) before
    packing, or pack per (source, date) instead.
    """
    from kafka_streams_spark.operators.text import bpe_ish_count

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_tokens = bpe_ish_count(F.col(text_col)).alias("n_tokens")
    with_cum = docs.select(
        F.col(id_col), F.col(stratum_col), n_tokens
    ).withColumn("_cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        id_col,
        stratum_col,
        "n_tokens",
        F.expr(f"(_cum - n_tokens) div {budget}").alias("shard_id"),
    )
