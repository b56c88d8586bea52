"""Unit pins for the round-3 sampling/ordering operators:
stratified_sample, upsample_epochs, shuffle_shards, ngram_counts.

The common property under test is determinism under repartitioning —
the reason these exist instead of df.sample()/rand().
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_spark.operators.sampling import (
    shuffle_shards,
    stratified_sample,
    upsample_epochs,
)
from kafka_streams_spark.operators.text import ngram_counts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", ["en", "de", "zh"][i % 3], f"tok{i} tok{i+1} common")
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")


def test_stratified_rate_one_keeps_all_rate_zero_drops(spark, docs):
    out = stratified_sample(docs, {"en": 1.0, "de": 0.0}, stratum_col="lang")
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "de" not in langs
    n_en = docs.filter("lang = 'en'").count()
    assert out.filter("lang = 'en'").count() == n_en  # rate 1.0 → everything


def test_stratified_sample_partition_invariant(spark, docs):
    ids = lambda df: sorted(r.doc_id for r in df.select("doc_id").collect())
    a = stratified_sample(docs, {"en": 0.5}, stratum_col="lang")
    b = stratified_sample(docs.repartition(13), {"en": 0.5}, stratum_col="lang")
    assert ids(a) == ids(b) and 0 < len(ids(a)) < docs.count()


def test_upsample_integer_epochs_exact_copies(spark, docs):
    out = upsample_epochs(docs, {"src0": 2.0, "src1": 0.0})
    per_src = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src["src0"] == 2 * counts["src0"]
    assert "src1" not in per_src          # zero epochs drops the stratum
    assert per_src["src2"] == counts["src2"]  # default 1.0


def test_upsample_fractional_epochs_bounded_and_indexed(spark, docs):
    out = upsample_epochs(docs, {"src0": 1.5})
    n0 = docs.filter("source = 'src0'").count()
    got = out.filter("source = 'src0'").count()
    assert n0 < got < 2 * n0              # strictly between 1x and 2x
    # copy_idx is 1..n per doc — no gaps, no duplicates
    bad = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("copy_idx").alias("mx"))
        .filter("n != mx")
        .count()
    )
    assert bad == 0


def test_shuffle_shards_is_a_permutation(spark, docs):
    out = shuffle_shards(docs, n_shards=4)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # per shard: positions are exactly 1..shard_size
    per = out.groupBy("shard_id").agg(
        F.count("*").alias("n"), F.min("shard_pos").alias("lo"), F.max("shard_pos").alias("hi")
    )
    assert per.filter("lo != 1 OR hi != n").count() == 0
    # deterministic under repartitioning
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, shuffle_shards(docs.repartition(17), n_shards=4).collect()))
    assert a == b


def test_ngram_counts_golden(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    got = {(r.gram, r.n_occurrences) for r in ngram_counts(df, n=2, k=10).collect()}
    assert got == {("a b", 2), ("b c", 1)}  # 1-token doc contributes nothing


def test_corpus_stats_golden(spark):
    from kafka_streams_spark.operators.text import corpus_stats

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "d")], "doc_id long, text string"
    )
    r = corpus_stats(df).collect()[0]
    assert (r.n_docs, r.n_tokens, r.n_distinct_tokens, r.n_hapax, r.top_token_freq) \
        == (3, 6, 4, 2, 2)  # hapax: c, d; top: a or b at 2


def test_pack_sequences_exact_coverage_and_lengths(spark, sf_dir):
    """Every document's slices cover it exactly once, and every sequence
    except each stratum's last holds exactly seq_len tokens."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.sampling import pack_sequences
    from kafka_streams_spark.operators.text import bpe_ish_count
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    L = 512
    out = pack_sequences(docs, seq_len=L)
    # per-doc coverage: slices sum to the doc's token count
    per_doc = out.groupBy("doc_id").agg(F.sum("n_tokens_in_seq").alias("got"))
    truth = docs.select(
        "doc_id", bpe_ish_count(F.col("text")).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    bad = per_doc.join(truth, "doc_id").filter(F.col("got") != F.col("n"))
    assert bad.count() == 0
    # per-sequence fullness: all but the last per stratum == L
    per_seq = out.groupBy("source", "seq_id").agg(
        F.sum("n_tokens_in_seq").alias("tok")
    )
    last = per_seq.groupBy("source").agg(F.max("seq_id").alias("last_seq"))
    partial = (
        per_seq.join(last, "source")
        .filter((F.col("seq_id") != F.col("last_seq")) & (F.col("tok") != L))
    )
    assert partial.count() == 0
    # slices stay inside their sequence
    assert out.filter(F.col("seq_off") + F.col("n_tokens_in_seq") > L).count() == 0
    # partition invariance
    out2 = pack_sequences(docs.repartition(19), seq_len=L)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_samplers_independent_of_split_and_each_other(spark):
    """r10 review fix (verified failure): all samplers and the split
    rule used to read the same md5(id) slice, so a rate-0.1 sample
    followed by assign_splits left the TRAIN split EMPTY (every
    surviving id had first byte < 0x1a) and chained samplers kept
    min(r1, r2) instead of r1*r2. With per-operator salts, a sampled
    corpus splits in roughly the published 5/5/90 proportions and two
    different samplers compose multiplicatively."""
    from kafka_streams_spark.operators.sampling import (
        assign_splits,
        hash_sample,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "en") for i in range(20000)], "doc_id bigint, lang string"
    )
    sampled = stratified_sample(docs, {}, default_rate=0.1)
    n = sampled.count()
    assert 1600 <= n <= 2400  # ~10%
    splits = {
        r["split"]: r["cnt"]
        for r in assign_splits(sampled)
        .groupBy("split")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # the old correlated hashes gave {train: 0}; salted, train carries
    # ~90% and test/val ~5% each of the SAMPLE
    assert splits.get("train", 0) > 0.8 * n
    assert 0 < splits.get("test", 0) < 0.12 * n
    assert 0 < splits.get("val", 0) < 0.12 * n

    # two different samplers compose ~multiplicatively (was min(r1,r2))
    both = hash_sample(sampled, rate_256=64)  # 25% of the 10% sample
    m = both.count()
    assert 0.15 * n <= m <= 0.35 * n

    # and the same sampler applied twice is idempotent (same salt, same
    # predicate — the subset property is deliberate and documented)
    again = stratified_sample(sampled, {}, default_rate=0.1)
    assert again.count() == n


def test_temperature_mix_null_stratum_and_t_below_one(spark):
    """r10 review fixes: a NULL stratum is a real group — it must ride
    its own keep rate (the old equi-join silently dropped every
    NULL-stratum row AFTER its count had contaminated the n_min
    anchor) — and T < 1 raises instead of silently no-opping (the
    positive exponent clamps every rate to 1)."""
    import pytest

    from kafka_streams_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(4000)]
    rows += [(10_000 + i, None) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mix(docs, temperature=2.0)
    by = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # NULL is the smallest stratum -> anchor, keep rate 1.0: all 10 rows
    # survive; 'big' downsamples toward sqrt(n_s * n_min)
    assert by.get(None) == 10
    assert 0 < by["big"] < 4000

    with pytest.raises(ValueError, match="temperature must be >= 1"):
        temperature_mix(docs, temperature=0.5)


def test_pack_token_shards_rejects_zero_budget(spark):
    """r10 review fix: budget=0 used to produce NULL shard ids for the
    whole corpus (div 0 in default mode) with no error."""
    import pytest

    from kafka_streams_spark.operators.sampling import pack_token_shards

    docs = spark.createDataFrame(
        [(1, "s", "a b c")], "doc_id bigint, source string, text string"
    )
    with pytest.raises(ValueError, match="budget must be >= 1"):
        pack_token_shards(docs, budget=0)
