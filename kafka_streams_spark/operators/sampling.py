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
