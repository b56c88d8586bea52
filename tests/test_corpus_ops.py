"""Round-4 corpus operators: deterministic splits, weighted reservoir
sampling, distribution drift, robust outlier gating, and the fuzzy
incremental dedup gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# ---------------------------------------------------------------------------
# assign_splits
# ---------------------------------------------------------------------------


def test_assign_splits_partition_of_corpus(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import assign_splits
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = assign_splits(docs, test_256=13, val_256=26)
    n = docs.count()
    assert out.count() == n
    by_split = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by_split) <= {"train", "val", "test"}
    assert sum(by_split.values()) == n
    # ~5% each with generous tolerance on a small corpus
    assert by_split["test"] < 0.15 * n
    assert by_split["val"] < 0.15 * n
    # stable under repartitioning
    out2 = assign_splits(docs.repartition(13), test_256=13, val_256=26)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_leakage_safe_splits_cluster_atomic_and_singleton_equal(spark, sf_dir):
    """r9: every duplicate cluster must land in exactly ONE split
    (the property the operator exists for), and docs in NO cluster must
    get the identical assignment plain assign_splits gives (same rule,
    same key — so adopting the leakage-safe form never reshuffles the
    unclustered majority of the corpus)."""
    from kafka_streams_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )
    from kafka_streams_spark.operators.sampling import (
        assign_splits,
        leakage_safe_splits,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    clusters = duplicate_clusters(
        minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5_32")
    )
    out = leakage_safe_splits(docs, clusters)
    assert out.count() == docs.count()

    # cluster atomicity: one distinct split per split_key, and every
    # clustered doc's split_key is its cluster id
    multi = (
        out.groupBy("split_key")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert multi.count() == 0
    joined = out.join(
        clusters.withColumnRenamed("node", "doc_id"), "doc_id"
    )
    assert joined.filter(F.col("split_key") != F.col("cluster_id")).count() == 0
    assert joined.count() > 0  # the corpus really has clusters to test

    # singleton equality with plain assign_splits
    plain = assign_splits(docs).withColumnRenamed("split", "plain_split")
    singles = out.join(
        clusters.withColumnRenamed("node", "doc_id"), "doc_id", "left_anti"
    ).join(plain, "doc_id")
    assert singles.filter(F.col("split") != F.col("plain_split")).count() == 0


def test_cap_per_group_deterministic_membership(spark):
    """r9: the cap keeps the md5-rank winners — a stable SET, not
    'first N in arrival order'. Groups under the cap pass through
    whole; the kept subset is invariant to row order and partitioning;
    max_rows=0 empties; NULL groups cap as one group."""
    from kafka_streams_spark.operators.sampling import cap_per_group

    rows = [(i, "big" if i % 3 else None, f"t{i}") for i in range(1, 31)]
    rows += [(100 + i, "small", "u") for i in range(3)]
    docs = _docs(spark, rows)
    out = cap_per_group(docs, "source", max_rows=5)
    sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"big": 5, None: 5, "small": 3}
    kept = sorted(r["doc_id"] for r in out.collect())
    shuffled = cap_per_group(
        docs.orderBy(F.desc("doc_id")).repartition(7), "source", max_rows=5
    )
    assert sorted(r["doc_id"] for r in shuffled.collect()) == kept
    assert cap_per_group(docs, "source", max_rows=0).count() == 0
    with pytest.raises(ValueError):
        cap_per_group(docs, "source", max_rows=-1)


def test_assign_splits_validates_bounds(spark):
    from kafka_streams_spark.operators.sampling import assign_splits

    d = _docs(spark, [(1, "s", "x")])
    with pytest.raises(ValueError):
        assign_splits(d, test_256=30, val_256=20)
    with pytest.raises(ValueError):
        assign_splits(d, test_256=-1, val_256=20)


# ---------------------------------------------------------------------------
# reservoir_sample
# ---------------------------------------------------------------------------


def test_reservoir_two_phase_equals_single_window(spark, sf_dir):
    """The salted two-phase top-k must equal the plain one-window top-k."""
    from kafka_streams_spark.operators.sampling import reservoir_sample, uniform_unit
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = reservoir_sample(docs, k=20, stratum_col="lang", weight_col="n_chars")
    # naive single-window reference
    pr = F.round(
        F.pow(
            uniform_unit("doc_id", "reservoir"),
            F.lit(1.0) / F.col("n_chars").cast("double"),
        ),
        9,
    )
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.col("doc_id"))
    ref = (
        docs.select("doc_id", "lang", pr.alias("priority"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 20)
    )
    assert out.exceptAll(ref).count() == 0 and ref.exceptAll(out).count() == 0


def test_reservoir_unweighted_and_partition_invariant(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import reservoir_sample
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = reservoir_sample(docs, k=10, stratum_col="source")
    b = reservoir_sample(docs.repartition(17), k=10, stratum_col="source")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # k per stratum, rk dense from 1
    per = a.groupBy("source").agg(F.count("*").alias("n"), F.min("rk").alias("lo"), F.max("rk").alias("hi"))
    for r in per.collect():
        assert r["n"] == 10 and r["lo"] == 1 and r["hi"] == 10


def test_reservoir_weight_bias(spark):
    """With extreme weights, the heavy rows must win the reservoir."""
    from kafka_streams_spark.operators.sampling import reservoir_sample

    rows = [(i, "s", "x", 1_000_000 if i < 5 else 1) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, text string, w bigint")
    out = reservoir_sample(d, k=5, stratum_col="source", weight_col="w")
    got = {r["doc_id"] for r in out.collect()}
    # u^(1/1e6) ~ 1 for the heavy rows; u^(1/1) = u < 1 for the light ones
    assert got == {0, 1, 2, 3, 4}


# ---------------------------------------------------------------------------
# corpus_drift
# ---------------------------------------------------------------------------


def test_corpus_drift_identical_sides_zero(spark):
    from kafka_streams_spark.operators.text import corpus_drift

    d = _docs(spark, [(1, "s", "a b c"), (2, "s", "c d")])
    row = corpus_drift(d, d).collect()[0]
    assert row["tvd"] == 0.0
    assert row["n_tokens_a"] == row["n_tokens_b"] == 5
    assert row["vocab_a"] == row["vocab_b"] == row["shared_vocab"] == 4


def test_corpus_drift_disjoint_vocab_is_one(spark):
    from kafka_streams_spark.operators.text import corpus_drift

    a = _docs(spark, [(1, "s", "a a b")])
    b = _docs(spark, [(2, "s", "x y z z")])
    row = corpus_drift(a, b).collect()[0]
    assert row["tvd"] == 1.0
    assert row["shared_vocab"] == 0


def test_corpus_drift_known_value(spark):
    """A: {a:2, b:2} T=4; B: {a:1, b:3} T=4.
    TVD = 0.5*(|2/4-1/4| + |2/4-3/4|) = 0.25."""
    from kafka_streams_spark.operators.text import corpus_drift

    a = _docs(spark, [(1, "s", "a a b b")])
    b = _docs(spark, [(2, "s", "a b b b")])
    row = corpus_drift(a, b).collect()[0]
    assert row["tvd"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# length_outliers
# ---------------------------------------------------------------------------


def test_length_outliers_flags_only_the_tail(spark):
    from kafka_streams_spark.operators.text import length_outliers

    # nine values near 100 and one at 10000: med=100, MAD small
    rows = [(i, "s", "x", 100 + i) for i in range(9)] + [(9, "s", "x", 10_000)]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, text string, n_chars bigint")
    out = length_outliers(d, k=3.0).collect()
    assert {r["doc_id"] for r in out} == {9}
    r = out[0]
    assert r["med"] == pytest.approx(104.5)  # mean of 104 and 105
    # deviations from 104.5: .5,1.5,...,4.5 and 9895.5 → MAD = 2.5
    assert r["mad"] == pytest.approx(2.5)


def test_length_outliers_zero_mad_degenerate(spark):
    """All-equal stratum: MAD=0, so ANY deviation is an outlier and the
    equal rows themselves are not flagged."""
    from kafka_streams_spark.operators.text import length_outliers

    rows = [(i, "s", "x", 50) for i in range(5)] + [(9, "s", "x", 51)]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, text string, n_chars bigint")
    out = length_outliers(d, k=3.0).collect()
    assert {r["doc_id"] for r in out} == {9}


# ---------------------------------------------------------------------------
# dedup_incremental_fuzzy
# ---------------------------------------------------------------------------


def _fuzzy_rows():
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and often"
    return base, near


def test_fuzzy_incremental_drops_near_dup_of_existing(spark):
    from kafka_streams_spark.operators.dedup import dedup_incremental_fuzzy

    base, near = _fuzzy_rows()
    existing = _docs(spark, [(1, "s", base)])
    new = _docs(spark, [(10, "s", near), (11, "s", "completely different words here entirely")])
    for hash_fn in ("crc32", "md5_32"):
        out = dedup_incremental_fuzzy(
            new, existing, threshold=0.5, hash_fn=hash_fn
        )
        assert {r["doc_id"] for r in out.collect()} == {11}


def test_pairs_incremental_precomputed_new_bands_identical(spark):
    """r10: a caller that already banded the delta (the streaming split
    assigner) passes new_bands= — the pair output must be IDENTICAL to
    the self-computed path, for both hash functions."""
    from kafka_streams_spark.operators.dedup import (
        _banded_keys,
        minhash_pairs_incremental,
        minhash_signatures,
    )

    base, near = _fuzzy_rows()
    existing = _docs(spark, [(1, "s", base), (2, "s", "other corpus text")])
    new = _docs(
        spark,
        [(10, "s", near), (11, "s", "completely different words here")],
    )
    for hash_fn in ("crc32", "md5_32"):
        want = {
            (r["new_id"], r["ex_id"])
            for r in minhash_pairs_incremental(
                new, existing, threshold=0.5, hash_fn=hash_fn
            ).collect()
        }
        pre = _banded_keys(
            minhash_signatures(new, "doc_id", "text", 64, 3, hash_fn),
            "doc_id", 64, 32, hash_fn,
        )
        got = {
            (r["new_id"], r["ex_id"])
            for r in minhash_pairs_incremental(
                new, existing, threshold=0.5, hash_fn=hash_fn,
                new_bands=pre,
            ).collect()
        }
        assert got == want and want == {(10, 1)}


def test_fuzzy_incremental_ignores_new_new_pairs(spark):
    """Near-dups WITHIN the increment are out of scope by contract —
    both survive the gate (minhash_near_duplicates handles them)."""
    from kafka_streams_spark.operators.dedup import dedup_incremental_fuzzy

    base, near = _fuzzy_rows()
    existing = _docs(spark, [(1, "s", "unrelated corpus content entirely elsewhere")])
    new = _docs(spark, [(10, "s", base), (11, "s", near)])
    out = dedup_incremental_fuzzy(new, existing, threshold=0.5)
    assert {r["doc_id"] for r in out.collect()} == {10, 11}


def test_fuzzy_incremental_exact_dup_also_dropped(spark):
    from kafka_streams_spark.operators.dedup import dedup_incremental_fuzzy

    base, _ = _fuzzy_rows()
    existing = _docs(spark, [(1, "s", base)])
    new = _docs(spark, [(10, "s", base)])
    assert dedup_incremental_fuzzy(new, existing, threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# quality_calibrated
# ---------------------------------------------------------------------------


def test_quality_calibrated_rank_properties(spark, sf_dir):
    from kafka_streams_spark.operators.text import quality_calibrated
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = quality_calibrated(docs)
    stats = out.groupBy("source").agg(
        F.min("pct_rank").alias("lo"), F.max("pct_rank").alias("hi"),
        F.count("*").alias("n"),
    )
    for r in stats.collect():
        assert r["lo"] == 0.0
        assert r["hi"] == (1.0 if r["n"] > 1 else 0.0)
    # higher quality never maps to a lower rank within a source
    a = out.alias("a")
    b = out.alias("b")
    inversions = (
        a.join(b, (F.col("a.source") == F.col("b.source"))
               & (F.col("a.quality") > F.col("b.quality"))
               & (F.col("a.pct_rank") < F.col("b.pct_rank")))
        .count()
    )
    assert inversions == 0


def test_quality_calibrated_partition_invariant(spark, sf_dir):
    from kafka_streams_spark.operators.text import quality_calibrated
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    x = quality_calibrated(docs)
    y = quality_calibrated(docs.repartition(11))
    assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0


# ---------------------------------------------------------------------------
# truncate_embeddings
# ---------------------------------------------------------------------------


def test_truncate_embeddings_prefix_unit_norm(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import truncate_embeddings
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    out = truncate_embeddings(embs, dim=16)
    checked = out.select(
        F.size("unit").alias("d"),
        F.aggregate("unit", F.lit(0.0), lambda acc, v: acc + v * v).alias("sq"),
    )
    row = checked.agg(
        F.min("d"), F.max("d"), F.min("sq"), F.max("sq")
    ).collect()[0]
    assert row[0] == row[1] == 16
    # unit norm within the 6-dp component rounding budget
    assert abs(row[2] - 1.0) < 1e-3 and abs(row[3] - 1.0) < 1e-3


def test_truncate_full_dim_equals_normalize(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import (
        normalize_vectors,
        truncate_embeddings,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    t = truncate_embeddings(embs, dim=64)
    n = normalize_vectors(embs)
    assert t.exceptAll(n).count() == 0 and n.exceptAll(t).count() == 0


def test_truncate_validates_dim(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import truncate_embeddings
    from kafka_streams_spark.sources.testdata import load_table

    with pytest.raises(ValueError):
        truncate_embeddings(load_table(spark, sf_dir, "embeddings"), dim=0)


# ---------------------------------------------------------------------------
# curate_increment
# ---------------------------------------------------------------------------


def test_curate_increment_equals_manual_composition(spark, sf_dir):
    """The fused pipeline must equal running its three stages by hand."""
    from pyspark.sql import functions as F2

    from kafka_streams_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_fuzzy,
    )
    from kafka_streams_spark.operators.pipelines import curate_corpus, curate_increment
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F2.substring(F2.md5(F2.col("doc_id").cast("string")), 1, 2)
    new, ex = docs.filter(bucket >= "20"), docs.filter(bucket < "20")
    fused = curate_increment(new, ex, jaccard_threshold=0.5, hash_fn="md5_32")
    manual = curate_corpus(
        dedup_incremental_fuzzy(
            dedup_incremental(new, ex), ex, threshold=0.5, hash_fn="md5_32"
        )
    )
    assert fused.exceptAll(manual).count() == 0
    assert manual.exceptAll(fused).count() == 0


def test_curate_increment_drops_near_dup_despite_quality(spark):
    """A high-quality increment doc that near-duplicates the existing
    corpus must still be dropped — the membership gates run BEFORE the
    quality gates."""
    from kafka_streams_spark.operators.pipelines import curate_increment

    good = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the forest where it finds a quiet place to rest."
    )
    near = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the forest where it finds a quiet place to sleep."
    )
    existing = _docs(spark, [(1, "s", good)])
    new = _docs(spark, [(10, "s", near), (11, "s",
        "completely different sentences speak of the sea and of the "
        "mountains that rise in the distant north beyond all maps.")])
    out = curate_increment(new, existing, jaccard_threshold=0.5)
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_assign_splits_boundary_256(spark):
    """A 256 boundary means the whole range: val_256=256 leaves no
    train rows (the 3-char hex '100' must not silently break the
    2-char lexicographic compare)."""
    from kafka_streams_spark.operators.sampling import assign_splits

    d = _docs(spark, [(i, "s", "x") for i in range(64)])
    out = assign_splits(d, test_256=13, val_256=256)
    splits = {r["split"] for r in out.collect()}
    assert "train" not in splits and "val" in splits
    all_test = assign_splits(d, test_256=256, val_256=256)
    assert {r["split"] for r in all_test.collect()} == {"test"}


def test_fuzzy_incremental_with_persisted_signature_index(spark, sf_dir, tmp_path):
    """Gating against a persisted signature table must equal
    recomputing signatures from the existing corpus's text."""
    from kafka_streams_spark.operators.dedup import (
        dedup_incremental_fuzzy,
        read_minhash_index,
        write_minhash_index,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    new, ex = docs.filter(bucket >= "20"), docs.filter(bucket < "20")
    idx_path = str(tmp_path / "minhash_idx")
    write_minhash_index(ex, idx_path, hash_fn="md5_32")
    via_index = dedup_incremental_fuzzy(
        new, ex, threshold=0.5, hash_fn="md5_32",
        existing_sig=read_minhash_index(spark, idx_path),
    )
    recomputed = dedup_incremental_fuzzy(new, ex, threshold=0.5, hash_fn="md5_32")
    assert via_index.exceptAll(recomputed).count() == 0
    assert recomputed.exceptAll(via_index).count() == 0


# ---------------------------------------------------------------------------
# substring_overlap_pairs
# ---------------------------------------------------------------------------


def test_substring_overlap_detects_long_shared_span(spark):
    """Two docs sharing a >= k+window-1 (8) token span must pair (the
    winnowing guarantee); docs with no shared span must not."""
    from kafka_streams_spark.operators.text import substring_overlap_pairs

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    d = _docs(spark, [
        (1, "s", "intro words then " + span + " and a tail"),
        (2, "s", span + " with a different ending entirely"),
        (3, "s", "nothing in common with the others at all here"),
    ])
    out = substring_overlap_pairs(d, min_shared=1)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_substring_overlap_max_bucket_drops_boilerplate(spark):
    """A span shared by MANY docs is boilerplate: max_bucket excludes
    its fingerprints from pair expansion, while a rare pair survives."""
    from kafka_streams_spark.operators.text import substring_overlap_pairs

    boiler = "this site uses cookies to improve your experience okay"
    rare = "one singular sentence appearing in exactly two documents yes"
    rows = [(i, "s", boiler + f" filler{i} pad pad") for i in range(10)]
    rows += [(100, "s", rare), (101, "s", rare + " trailing")]
    d = _docs(spark, rows)
    out = substring_overlap_pairs(d, min_shared=1, max_bucket=5)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), pairs


# ---------------------------------------------------------------------------
# normalize_text / decontaminate_exact
# ---------------------------------------------------------------------------


def test_normalize_text_canon(spark):
    from kafka_streams_spark.operators.text import normalize_text

    # includes U+000B: Java \s covers it but RE2 does not — the pinned
    # explicit class must collapse it on both engines
    d = _docs(spark, [(1, "s", "  Hello\t\tWORLD \n new\x0b\r\nlines  ")])
    got = normalize_text(d).collect()[0]["norm_text"]
    assert got == "hello world new lines"


def test_decontaminate_exact_flags_verbatim_containment(spark):
    from kafka_streams_spark.operators.text import decontaminate_exact

    bench = spark.createDataFrame(
        [("the secret benchmark passage",)], "text string"
    )
    d = _docs(spark, [
        (1, "s", "prefix text the secret benchmark passage suffix text"),
        (2, "s", "the secret benchmark paraphrase entirely reworded"),
        (3, "s", "nothing related at all"),
    ])
    out = {r["doc_id"]: (r["n_bench_hits"], r["contaminated"])
           for r in decontaminate_exact(d, bench).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_minhash_index_rejects_parameter_mismatch(spark, sf_dir, tmp_path):
    """An index built with one hash_fn must not silently no-op when the
    gate is called with another — the metadata check raises."""
    from kafka_streams_spark.operators.dedup import (
        dedup_incremental_fuzzy,
        read_minhash_index,
        write_minhash_index,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    new, ex = docs.filter(bucket >= "20"), docs.filter(bucket < "20")
    idx = str(tmp_path / "idx_crc")
    write_minhash_index(ex, idx, hash_fn="crc32")
    with pytest.raises(ValueError, match="hash_fn"):
        dedup_incremental_fuzzy(
            new, ex, hash_fn="md5_32",
            existing_sig=read_minhash_index(spark, idx),
        )


def test_minhash_index_rejects_sig_version_mismatch(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The index stamps the signature-DERIVATION version, not just its
    parameters (r13): an index persisted before a derivation change
    carries the old tag and a newer reader must refuse it — matching
    parameters would otherwise accept signatures whose band keys never
    collide (silent every-duplicate-readmitted no-op). An index with
    NO tag (pre-r13) is accepted as documented legacy."""
    from kafka_streams_spark.operators import dedup
    from kafka_streams_spark.operators.dedup import (
        dedup_incremental_fuzzy,
        read_minhash_index,
        write_minhash_index,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    new, ex = docs.filter(bucket >= "20"), docs.filter(bucket < "20")
    idx = str(tmp_path / "idx_v1")
    write_minhash_index(ex, idx, hash_fn="md5_32")
    monkeypatch.setattr(
        dedup, "MINHASH_SIG_VERSION", dedup.MINHASH_SIG_VERSION + 1
    )
    with pytest.raises(ValueError, match="sig_version"):
        dedup_incremental_fuzzy(
            new, ex, hash_fn="md5_32",
            existing_sig=read_minhash_index(spark, idx),
        )


# ---------------------------------------------------------------------------
# dedup_incremental_bloom
# ---------------------------------------------------------------------------


def _split_docs(spark, sf_dir, at="40"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.filter(bucket < at), docs.filter(bucket >= at)


def test_bloom_equals_exact_incremental(spark, sf_dir):
    """Bloom filters have no false negatives, so the gated form is
    bit-identical to the plain anti-join — at any bitmap size, even an
    absurdly small one where nearly everything is a false positive."""
    from kafka_streams_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    existing, new = _split_docs(spark, sf_dir)
    want = sorted(r["doc_id"] for r in dedup_incremental(new, existing).collect())
    for m_bits in (1 << 8, 1 << 14):  # saturated and realistic
        got = sorted(
            r["doc_id"]
            for r in dedup_incremental_bloom(new, existing, m_bits=m_bits).collect()
        )
        assert got == want


def test_bloom_bitmap_is_bounded_words(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import bloom_bitmap

    existing, _ = _split_docs(spark, sf_dir)
    m_bits = 1 << 14
    bm = bloom_bitmap(existing, m_bits=m_bits).collect()
    assert len(bm) <= m_bits // 64
    assert all(0 <= r["word_idx"] < m_bits // 64 for r in bm)


def test_bloom_gate_prunes_the_anti_join_input(spark):
    """The point of the gate: rows missing any probe bit never reach the
    exact membership join. With a disjoint increment and a roomy bitmap,
    (nearly) the whole increment is definite-new."""
    from kafka_streams_spark.operators.dedup import bloom_bitmap, _bloom_pos

    existing = _docs(spark, [(i, "s", f"existing text number {i}") for i in range(50)])
    new = _docs(spark, [(100 + i, "s", f"unseen text number {i}") for i in range(50)])
    m_bits, k = 1 << 14, 4
    bm = {r["word_idx"]: r["word"] for r in bloom_bitmap(existing, m_bits=m_bits, k=k).collect()}
    probes = new.select(
        "doc_id",
        *[_bloom_pos(F.md5(F.col("text")), j, m_bits).alias(f"p{j}") for j in range(k)],
    ).collect()
    passing = sum(
        1
        for r in probes
        if all((bm.get(r[f"p{j}"] >> 6, 0) >> (r[f"p{j}"] % 64)) & 1 for j in range(k))
    )
    # FP rate at this load is ~1e-9; every disjoint row should short-circuit.
    assert passing == 0


def test_bloom_true_duplicates_always_pass(spark):
    from kafka_streams_spark.operators.dedup import dedup_incremental_bloom

    existing = _docs(spark, [(1, "s", "shared payload"), (2, "s", "other corpus text")])
    new = _docs(
        spark,
        [(10, "s", "shared payload"), (11, "s", "novel payload"), (12, "s", "novel payload")],
    )
    out = sorted(r["doc_id"] for r in dedup_incremental_bloom(new, existing, m_bits=1 << 10).collect())
    # 10 is a true dup of the corpus; 12 loses the in-increment window to 11.
    assert out == [11]


# ---------------------------------------------------------------------------
# dsir_logratio
# ---------------------------------------------------------------------------


def test_dsir_target_equals_base_is_zero(spark):
    """When the target IS the base corpus, every bucket has t_b == r_b
    and T == R, so each contribution — and the sum — is exactly 0."""
    from kafka_streams_spark.operators.text import dsir_logratio

    docs = _docs(spark, [(i, "s", f"alpha beta gamma delta {i}") for i in range(8)])
    out = dsir_logratio(docs, docs).collect()
    assert len(out) == 8
    assert all(r["logratio"] == 0.0 for r in out)


def test_dsir_short_docs_have_no_features(spark):
    from kafka_streams_spark.operators.text import dsir_logratio

    docs = _docs(spark, [(1, "s", "solo"), (2, "s", "two tokens here")])
    out = {r["doc_id"]: r["n_features"] for r in dsir_logratio(docs, docs).collect()}
    assert out == {2: 2}  # bigrams only; the 1-token doc drops out


def test_dsir_ranks_target_like_docs_higher(spark):
    from kafka_streams_spark.operators.text import dsir_logratio

    target_text = "quick brown fox jumps over lazy dog again and again"
    other_text = "stock market closed lower on heavy trading volume today"
    docs = _docs(
        spark,
        [(i, "s", target_text) for i in range(5)]
        + [(10 + i, "s", other_text) for i in range(5)],
    )
    target = _docs(spark, [(100, "t", target_text)])
    got = {r["doc_id"]: r["logratio"] for r in dsir_logratio(docs, target).collect()}
    assert got[0] > got[10]


def test_dsir_validates_params(spark):
    from kafka_streams_spark.operators.text import dsir_logratio

    docs = _docs(spark, [(1, "s", "a b c")])
    with pytest.raises(ValueError, match="n must"):
        dsir_logratio(docs, docs, n=0)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logratio(docs, docs, n_buckets=1)


# ---------------------------------------------------------------------------
# keyword_search_bm25
# ---------------------------------------------------------------------------


def test_bm25_ranks_matching_docs_first(spark):
    from kafka_streams_spark.operators.text import keyword_search_bm25

    docs = _docs(
        spark,
        [
            (1, "s", "spark spark spark streaming engine"),
            (2, "s", "spark appears once in this much longer document about other things"),
            (3, "s", "nothing relevant whatsoever in here"),
        ],
    )
    out = keyword_search_bm25(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1  # higher tf, shorter doc
    assert 3 not in ids  # no term match → no row


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    from kafka_streams_spark.operators.text import keyword_search_bm25

    # 'common' is in every doc (df=N → tiny idf); 'rare' in one.
    docs = _docs(
        spark,
        [(i, "s", "common filler words here") for i in range(9)]
        + [(9, "s", "common rare words here")],
    )
    out = {r["doc_id"]: r["score"] for r in keyword_search_bm25(docs, ["common", "rare"], k=10).collect()}
    assert out[9] > max(v for i, v in out.items() if i != 9)


def test_bm25_k_limits_and_validates(spark):
    from kafka_streams_spark.operators.text import keyword_search_bm25

    docs = _docs(spark, [(i, "s", f"term filler {i}") for i in range(5)])
    assert keyword_search_bm25(docs, ["term"], k=3).count() == 3
    with pytest.raises(ValueError, match="query_terms"):
        keyword_search_bm25(docs, [])
    with pytest.raises(ValueError, match="k must"):
        keyword_search_bm25(docs, ["term"], k=0)


def test_bm25_query_terms_lowercased(spark):
    from kafka_streams_spark.operators.text import keyword_search_bm25

    docs = _docs(spark, [(1, "s", "Spark On Mixed Case")])
    assert keyword_search_bm25(docs, ["SPARK"], k=5).count() == 1


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    """A 4-token doc verbatim inside a 40-token doc: containment = 1.0
    from the short side while Jaccard is ~0.1 — the case the asymmetric
    metric exists for."""
    from kafka_streams_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta"
    long = short + " " + " ".join(f"tok{i}" for i in range(36))
    docs = _docs(spark, [(1, "s", short), (2, "s", long)])
    cont = containment_pairs(docs, n=1, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in cont] == [(1, 2, 1.0)]
    assert ngram_jaccard_pairs(docs, n=1, threshold=0.5).count() == 0


def test_containment_blocked_respects_block(spark):
    from kafka_streams_spark.operators.dedup import containment_pairs

    docs = _docs(
        spark,
        [(1, "a", "same words here"), (2, "b", "same words here"), (3, "a", "same words here")],
    )
    out = {(r["id_a"], r["id_b"]) for r in containment_pairs(docs, block_col="source").collect()}
    assert out == {(1, 3)}  # cross-source pair (1,2) never joins


def test_containment_symmetric_on_equal_sets(spark):
    from kafka_streams_spark.operators.dedup import containment_pairs

    docs = _docs(spark, [(1, "s", "x y z"), (2, "s", "z y x")])
    out = containment_pairs(docs, threshold=0.99).collect()
    assert len(out) == 1 and out[0]["containment"] == 1.0


# ---------------------------------------------------------------------------
# lm_bigram_score
# ---------------------------------------------------------------------------


def test_lm_bigram_penalizes_scrambled_order(spark):
    """Docs with corpus-typical bigrams score higher than a doc whose
    tokens are corpus-plausible but order-scrambled — the separation the
    unigram model cannot make."""
    from kafka_streams_spark.operators.text import lm_bigram_score, lm_unigram_score

    fluent = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy fox brown jumps the"
    docs = _docs(
        spark,
        [(i, "s", fluent) for i in range(6)] + [(10, "s", scrambled)],
    )
    bi = {r["doc_id"]: r["avg_logprob"] for r in lm_bigram_score(docs).collect()}
    uni = {r["doc_id"]: r["avg_logprob"] for r in lm_unigram_score(docs).collect()}
    assert bi[0] > bi[10]
    assert abs(uni[0] - uni[10]) < 1e-9  # same bag of tokens → same unigram score


def test_lm_bigram_short_docs_drop(spark):
    from kafka_streams_spark.operators.text import lm_bigram_score

    docs = _docs(spark, [(1, "s", "solo"), (2, "s", "two words")])
    out = {r["doc_id"]: r["n_bigrams"] for r in lm_bigram_score(docs).collect()}
    assert out == {2: 1}


def test_oov_rate_crafted(spark):
    """Top-V vocab with deterministic (count desc, token asc) tiebreak;
    OOV = tokens outside it; empty docs keep a zero row."""
    from kafka_streams_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),
            (2, "b c d"),
            (3, "   "),
            (4, "A d e"),
        ],
        ["doc_id", "text"],
    )
    # counts: a=4 (incl. lowercased A), b=3, c=2, d=2, e=1
    # V=2 -> vocab {a, b}; V=3 tiebreak at count 2 -> c before d
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate(docs, vocab_size=2).collect()
    }
    assert got2 == {1: (6, 1), 2: (3, 2), 3: (0, 0), 4: (3, 2)}
    got3 = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate(docs, vocab_size=3).collect()
    }
    assert got3 == {1: (6, 0), 2: (3, 1), 3: (0, 0), 4: (3, 2)}


def test_dedup_normalized_collapses_case_and_whitespace(spark):
    """Case/indentation/line-wrap variants share one group; winner is
    min id; distinct normalized texts stay separate."""
    import hashlib

    from kafka_streams_spark.operators.text import dedup_normalized

    docs = spark.createDataFrame(
        [
            (10, "Hello   World"),
            (3, "hello world"),
            (7, "hello\n\tworld "),
            (5, "goodbye world"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["norm_hash"]: (r["keep_id"], r["dup_count"]) for r in dedup_normalized(docs).collect()}
    h = lambda s: hashlib.sha256(s.encode()).hexdigest()
    assert rows == {h("hello world"): (3, 3), h("goodbye world"): (5, 1)}


def test_oov_rate_with_persisted_vocab(spark, tmp_path):
    """write_vocab -> read_vocab -> oov_rate(vocab=...) equals the
    inline-vocab run; a vocab_size mismatch is rejected loudly."""
    import pytest

    from kafka_streams_spark.operators.text import (
        oov_rate,
        read_vocab,
        write_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d"), (3, "   "), (4, "A d e")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "vocab")
    write_vocab(docs, path, vocab_size=2)

    v = read_vocab(spark, path, expect_vocab_size=2)
    assert sorted(r["tok"] for r in v.collect()) == ["a", "b"]

    inline = sorted(map(tuple, oov_rate(docs, vocab_size=2).collect()))
    persisted = sorted(map(tuple, oov_rate(docs, vocab=v).collect()))
    assert inline == persisted

    with pytest.raises(ValueError, match="vocab_size"):
        read_vocab(spark, path, expect_vocab_size=500)


def test_badword_filter_token_level_membership(spark):
    """Token membership, not substring: 'classic' must not trip a
    blocklist entry 'ass'; real token hits count occurrences."""
    from kafka_streams_spark.operators.text import badword_filter

    docs = spark.createDataFrame(
        [
            (1, "a classic essay"),        # substring-only: clean
            (2, "an ASS appears"),         # case-folded token hit
            (3, "ass and ass again"),      # two occurrences
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_badwords"], r["drop"])
        for r in badword_filter(docs, badwords=["ass"]).collect()
    }
    assert got == {1: (0, False), 2: (1, True), 3: (2, True), 4: (0, False)}


def test_corpus_diff_all_statuses(spark):
    """added / removed / changed / unchanged each classified from
    crafted versions."""
    from kafka_streams_spark.operators.pipelines import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "goes away")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_scorecard_counts_gates(spark):
    """Gate counts follow the individual gate operators on a crafted
    frame (cross-checked per gate, not hand-computed)."""
    from kafka_streams_spark.operators.pipelines import corpus_scorecard
    from kafka_streams_spark.operators.text import (
        badword_filter,
        c4_clean,
        gopher_quality,
        pii_scan,
    )

    docs = spark.createDataFrame(
        [
            (1, "the and of to in is that a " * 10 + "sentence ends here."),
            (2, "short"),
            (3, "contact me@example.com for the badword files."),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    r = corpus_scorecard(docs).collect()[0]
    assert r["n_docs"] == 4
    assert r["n_gopher_pass"] == gopher_quality(docs).filter("passes_gopher").count()
    assert r["n_c4_pass"] == c4_clean(docs).count()
    assert r["n_badword_free"] == badword_filter(docs).filter("NOT drop").count()
    assert r["n_pii_free"] == pii_scan(docs).filter("NOT has_pii").count()


# ---------------------------------------------------------------------------
# remove_boilerplate (frequency-threshold line stripping)
# ---------------------------------------------------------------------------


def test_remove_boilerplate_strips_frequent_lines_everywhere(spark):
    """A line in >= min_docs distinct docs vanishes from ALL docs
    (including its first occurrence — the policy difference from
    dedup_lines); infrequent lines survive in order; repeats WITHIN one
    doc don't make a line boilerplate."""
    from kafka_streams_spark.operators.text import remove_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\ncookie banner"),
            (2, "cookie banner\nreal content two"),
            (3, "unique line\nunique line\nother"),
            (4, "   \n\nreal content four"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_boilerplate(docs, min_docs=2).collect()
    }
    assert got[1] == ("real content one", 1, 2)
    assert got[2] == ("real content two", 1, 1)
    # 'unique line' twice in doc 3 only → 1 distinct doc → kept
    assert got[3] == ("unique line\nunique line\nother", 3, 0)
    assert got[4] == ("real content four", 1, 0)


def test_remove_boilerplate_keeps_fully_stripped_and_empty_docs(spark):
    """Doc count is stable: fully-stripped docs and empty docs keep a
    row with empty text — gates drop docs, this operator only edits."""
    from kafka_streams_spark.operators.text import remove_boilerplate

    docs = spark.createDataFrame(
        [(1, "spam\nspam"), (2, "spam"), (3, ""), (4, "keep me")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_boilerplate(docs, min_docs=2).collect()
    }
    assert got[1] == ("", 0, 2)
    assert got[2] == ("", 0, 1)
    assert got[3] == ("", 0, 0)
    assert got[4] == ("keep me", 1, 0)
    assert len(got) == 4


def test_remove_boilerplate_identity_when_nothing_fires(spark, sf_dir):
    """When no line crosses the threshold the operator must be a
    bit-exact reconstruction identity (split → flag → regroup loses
    nothing) — the property the sf0.01 oracle gate rides on."""
    from kafka_streams_spark.operators.text import remove_boilerplate
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_boilerplate(docs, min_docs=10**9).select("doc_id", "text")
    assert out.exceptAll(docs).count() == 0
    assert docs.exceptAll(out).count() == 0


def test_remove_boilerplate_matches_python_model_random(spark):
    """Randomized corpora (shared + unique + blank lines, within-doc
    repeats) against a pure-Python model of the stated semantics."""
    import random

    from kafka_streams_spark.operators.text import remove_boilerplate

    rng = random.Random(42)
    pool = [f"shared-{i}" for i in range(5)] + ["", "   "]
    for trial in range(3):
        docs = []
        for d in range(12):
            n = rng.randint(0, 6)
            lines = [
                rng.choice(pool) if rng.random() < 0.5 else f"uniq-{d}-{j}"
                for j in range(n)
            ]
            docs.append((d, "\n".join(lines)))
        min_docs = rng.choice([2, 3])
        # model
        from collections import defaultdict

        df_count: dict[str, set] = defaultdict(set)
        for d, text in docs:
            for ln in text.split("\n"):
                if ln.strip() != "":
                    df_count[ln].add(d)
        boiler = {ln for ln, s in df_count.items() if len(s) >= min_docs}
        want = {}
        for d, text in docs:
            kept = [
                ln
                for ln in text.split("\n")
                if ln.strip() != "" and ln not in boiler
            ]
            removed = sum(
                1 for ln in text.split("\n") if ln.strip() != "" and ln in boiler
            )
            want[d] = ("\n".join(kept), len(kept), removed)
        sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
            for r in remove_boilerplate(sdf, min_docs=min_docs).collect()
        }
        assert got == want, (trial, min_docs)


def test_collocations_pmi_crafted(spark):
    """A fixed phrase must out-PMI a frequent-but-independent pair, and
    pmi must match the Python model exactly at 6 dp."""
    import math

    from kafka_streams_spark.operators.text import collocations

    # "new york" always together; "the cat" both frequent but also
    # apart; pairs below min_count drop.
    rows = [(i, "new york is big and the cat sat on the mat") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {(r["tok_a"], r["tok_b"]): (r["n_pair"], r["pmi"])
           for r in collocations(docs, top_k=50, min_count=5).collect()}
    assert ("new", "york") in out
    # model
    text = "new york is big and the cat sat on the mat".split()
    from collections import Counter

    uni = Counter(t for _ in range(6) for t in text)
    big = Counter((a, b) for _ in range(6) for a, b in zip(text, text[1:]))
    big = {p: n for p, n in big.items() if n >= 5}
    T, TP = sum(uni.values()), sum(big.values())
    for p, n in big.items():
        want = round(math.log((n / TP) / ((uni[p[0]] / T) * (uni[p[1]] / T))), 6)
        assert out[p] == (n, want), p
    # the always-together pair beats the independent frequent pair
    assert out[("new", "york")][1] > out[("the", "cat")][1]


def test_readability_model_and_edges(spark):
    """Flesch components vs a Python model; empty doc and
    no-punctuation doc hit the min-1 guards."""
    import math
    import re

    from kafka_streams_spark.operators.text import readability_scores

    rows = [
        (1, "The cat sat. The dog ran!"),
        (2, "supercalifragilistic expialidocious"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        n_words = len(toks)
        n_sent = max(1, len(re.findall(r"[.!?]+", text)))
        n_syl = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks)
        flesch = round(
            206.835 - 1.015 * (max(n_words, 1) / n_sent) - 84.6 * (n_syl / max(n_words, 1)),
            6,
        )
        r = got[doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            n_words,
            n_sent,
            n_syl,
        ), doc_id
        assert abs(r["flesch"] - flesch) < 1e-9, doc_id


def test_compression_ratio_matches_zlib_and_orders_entropy(spark):
    """Bit-equality with direct zlib; repetitive text compresses far
    below random-ish text; empty doc reports NULL ratio."""
    import zlib

    from kafka_streams_spark.operators.text import compression_ratio

    rep = "spam and eggs " * 200
    rand = " ".join(f"u{i * 2654435761 % 99991}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, rep), (2, rand), (3, "")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for doc_id, text in [(1, rep), (2, rand)]:
        raw = text.encode()
        comp = zlib.compress(raw, 6)
        r = got[doc_id]
        assert (r["n_bytes"], r["n_compressed"]) == (len(raw), len(comp))
        assert abs(r["ratio"] - round(len(comp) / len(raw), 6)) < 1e-12
    assert got[1]["ratio"] < 0.1 < got[2]["ratio"]
    assert got[3]["ratio"] is None and got[3]["n_bytes"] == 0


def test_corpus_diff_null_text_statuses(spark):
    """NULL text is in-contract (round-7 advice fix): presence flags —
    not the md5 digest, which is NULL for NULL text — decide
    added/removed, and digests compare null-safely for
    changed/unchanged."""
    from kafka_streams_spark.operators.pipelines import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "real"), (4, None)],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (3, None), (5, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",  # NULL == NULL null-safely
        2: "removed",    # NULL-text doc only in old (was 'added' pre-fix)
        3: "changed",    # real -> NULL
        4: "removed",
        5: "added",      # NULL-text doc only in new
    }


def test_remove_boilerplate_null_text_keeps_row(spark):
    """NULL-text docs keep their output row with 0 kept / 0 removed
    (round-7 advice fix): split(NULL) is NULL and posexplode of NULL
    emits nothing, so the text is coalesced to '' before the split —
    the doc-count-stability contract holds for NULL too."""
    from kafka_streams_spark.operators.text import remove_boilerplate

    docs = spark.createDataFrame(
        [(1, "spam"), (2, "spam"), (3, None), (4, "keep me")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_boilerplate(docs, min_docs=2).collect()
    }
    assert got[3] == ("", 0, 0)
    assert len(got) == 4


def test_ws_ascii_inline_copies_match_reference():
    """The Arrow closures carry self-contained inline copies of the
    _WS_ASCII whitespace pattern (launch-dir independence, the
    _fake_decode convention); this pin fails if any copy drifts from
    the reference definition — a drifted copy would silently tokenize
    differently from the `tokens` expression and the DuckDB oracles."""
    import re
    from pathlib import Path

    from kafka_streams_spark.operators import dedup

    assert dedup._WS_ASCII == r"[ \t\n\x0b\x0c\r]+"
    assert dedup._ws_split("a\xa0b  c\td") == ["a\xa0b", "c", "d"]
    root = Path(dedup.__file__).resolve().parent
    for fname in ("dedup.py", "text.py", "tokenizer.py"):
        src = (root / fname).read_text()
        inline = re.findall(r'_re\.compile\(r"(\[[^"]+\]\+)"\)', src)
        assert inline, f"{fname}: expected at least one inline copy"
        for pat in inline:
            assert pat == dedup._WS_ASCII, (fname, pat)


def test_arrow_and_expr_shinglers_agree_on_unicode_whitespace(spark):
    """The r8 divergence find, pinned: word_shingles (Arrow) and
    word_shingles_expr (Java \\s+) must tokenize unicode-whitespace
    text IDENTICALLY — bare str.split() split \\xa0/\\u2009 and the two
    forms disagreed on which shingles exist."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.dedup import (
        word_shingles,
        word_shingles_expr,
    )

    df = spark.createDataFrame(
        [(1, "foo\xa0bar baz"), (2, "a b c"), (3, "x \t y"), (4, None)],
        "id bigint, text string",
    )
    rows = df.select(
        word_shingles(F.col("text"), 2).alias("arrow"),
        word_shingles_expr(F.col("text"), 2).alias("expr"),
    ).collect()
    for r in rows:
        assert r["arrow"] == r["expr"], (r["arrow"], r["expr"])


def test_no_dialect_sensitive_tokenization_constructs():
    """r8 dialect lint: the round's three real divergences were all
    'same literal, different dialect' bugs — Python str.split()/strip()
    (unicode whitespace), RE2 \\s (no \\x0b) vs Java \\s, DuckDB bare
    trim (unicode spaces) vs Spark trim (ASCII space). This lint makes
    the class unwriteable:

    - engine operator/streaming closures may not call bare .split() or
      .strip() on text (use the _WS_ASCII class);
    - oracle SQL may not use \\s in a regex (use _WS_RE2 / an explicit
      class);
    - oracle SQL may not call bare trim/ltrim/rtrim on data (name the
      character set, e.g. trim(x, ' ')).
    """
    import re
    from pathlib import Path

    import kafka_streams_spark as pkg

    root = Path(pkg.__file__).resolve().parent
    bad: list[str] = []

    for sub in ("operators", "streaming"):
        for f in sorted((root / sub).glob("*.py")):
            for i, line in enumerate(f.read_text().splitlines(), 1):
                code = line.split("#", 1)[0]
                if "``" in line or line.lstrip().startswith(("#", "-")):
                    continue  # prose
                if re.search(r"\.split\(\)", code) or re.search(
                    r"\.strip\(\)", code
                ):
                    bad.append(f"{sub}/{f.name}:{i}: {line.strip()}")

    osrc = (root / "oracles.py").read_text()
    for i, line in enumerate(osrc.splitlines(), 1):
        if line.lstrip().startswith("#") or "-- " in line:
            continue  # python/sql comments
        if "_WS_RE2 = " in line:
            continue  # the blessed definition (explicit class, no \s)
        # \s inside a regex literal handed to DuckDB
        if re.search(r"""(regexp_|split_regex)[^\n]*\\+s""", line):
            bad.append(f"oracles.py:{i}: {line.strip()}")
        # bare trim on data (allow explicit sets and Python .strip()
        # of SQL-text constants)
        if re.search(r"(?<![a-z_.])(l|r)?trim\((?![^()]*,)[^()]*\)", line):
            if ".strip()" not in line:
                bad.append(f"oracles.py:{i}: {line.strip()}")

    assert not bad, "dialect-sensitive constructs:\n" + "\n".join(bad)


def test_leakage_safe_splits_incremental_rules(spark):
    """r9 incremental form, all four rules on a crafted delta:
    adoption from the min-id existing member, cross-split merge
    flagged, all-new cluster hash-keyed on the cluster id, and
    singleton new docs bit-identical to assign_splits."""
    from kafka_streams_spark.operators.sampling import (
        assign_splits,
        leakage_safe_splits_incremental,
        split_expr,
    )

    existing_splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train")], "doc_id bigint, split string"
    )
    # cluster 1: existing docs 1(train) + 2(test) bridged by new doc 10
    #   -> adopts doc 1's 'train', leak_conflict=true
    # cluster 3: existing doc 3(train) + new doc 11 -> adopts 'train',
    #   no conflict
    # cluster 20: new docs 20 + 21 only -> hash rule on cluster id 20
    # doc 30: unclustered new doc -> assign_splits rule on its own id
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 1), (3, 3), (11, 3), (20, 20), (21, 20)],
        "node bigint, cluster_id bigint",
    )
    new = spark.createDataFrame(
        [(10,), (11,), (20,), (21,), (30,)], "doc_id bigint"
    )
    out = {
        r["doc_id"]: (r["split"], r["leak_conflict"])
        for r in leakage_safe_splits_incremental(
            new, existing_splits, clusters
        ).collect()
    }
    hash_of = {
        r["doc_id"]: r["s"]
        for r in spark.createDataFrame([(20,), (30,)], "doc_id bigint")
        .select("doc_id", split_expr("doc_id").alias("s"))
        .collect()
    }
    assert out[10] == ("train", True)
    assert out[11] == ("train", False)
    assert out[20] == (hash_of[20], False) and out[21] == (hash_of[20], False)
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            spark.createDataFrame([(30,)], "doc_id bigint")
        ).collect()
    }
    assert out[30] == (plain[30], False) and plain[30] == hash_of[30]


def test_twin_blind_null_and_blank_semantics(spark):
    """r10 twin-blind review pins (flaws both engines shared):

    - dedup_lines keeps content-less docs (text='', n_lines=0) instead
      of silently deleting them mid-pipeline;
    - the incremental dedup family hashes NULL text as '' so two
      contentless docs dedupe the same way whether they arrive in one
      batch or across batches (the old join-NULL vs groupBy-NULL mix
      made the verdict depend on batch position);
    - decontaminate_exact ignores empty benchmark rows (contains(x,'')
      is true for every doc — one blank suite row used to flag the
      entire corpus contaminated);
    - cms_token_estimates lowercases terms (the sketched stream is
      lowercased, so 'Paris' probed collision noise with exact=0)."""
    from kafka_streams_spark.operators.dedup import dedup_incremental
    from kafka_streams_spark.operators.text import (
        cms_token_estimates,
        decontaminate_exact,
        dedup_lines,
    )

    schema = "doc_id bigint, source string, text string"
    docs = spark.createDataFrame(
        [(1, "s", "keep me\nshared line"), (2, "s", None), (3, "s", "  \n ")],
        schema,
    )
    out = {r["doc_id"]: (r["text"], r["n_lines"]) for r in dedup_lines(docs).collect()}
    assert out[2] == ("", 0) and out[3] == ("", 0)  # kept, not deleted
    assert out[1][1] == 2

    existing = spark.createDataFrame([(10, "s", None)], schema)
    delta = spark.createDataFrame([(11, "s", None), (12, "s", None)], schema)
    fresh = dedup_incremental(delta, existing)
    # NULL text == '' content: already in the corpus -> whole delta drops
    assert fresh.count() == 0
    empty_existing = spark.createDataFrame([], schema)
    first = dedup_incremental(delta, empty_existing)
    assert [r["doc_id"] for r in first.collect()] == [11]  # min-id winner

    bench = spark.createDataFrame([("",), (None,), ("keep me",)], "text string")
    flagged = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_exact(docs, bench).collect()
    }
    assert flagged == {1: True, 2: False, 3: False}

    est = {
        r["token"]: (r["cms_count"], r["exact_count"])
        for r in cms_token_estimates(
            spark.createDataFrame([(1, "s", "paris paris rome")], schema),
            ["Paris", "rome"],
        ).collect()
    }
    assert est["paris"][1] == 2 and est["rome"][1] == 1


def test_duplicate_clusters_local_dispatch_equals_distributed(spark, sf_dir):
    """r11 small-graph dispatch: below ``local_threshold`` canonical
    edges the components are solved with driver-side union-find (the
    edge count is already on the driver for the fixpoint seed); above
    it the distributed star loop runs. Both paths must emit the
    identical (node, cluster_id) table — min-reachable-id labeling,
    self-pair singletons, string ids (Python code-point order ==
    Spark's UTF-8 binary order) — pinned here by forcing the
    distributed path with local_threshold=0."""
    from kafka_streams_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5_32")
    fast = sorted(map(tuple, duplicate_clusters(pairs).collect()))
    slow = sorted(
        map(tuple, duplicate_clusters(pairs, local_threshold=0).collect())
    )
    assert fast == slow and len(fast) > 0

    # string ids + a self-pair singleton + a chain
    srows = [
        ("d", "b"), ("b", "a"), ("x", "y"), ("lonely", "lonely"),
    ]
    spairs = spark.createDataFrame(srows, "id_a string, id_b string")
    sfast = sorted(map(tuple, duplicate_clusters(spairs).collect()))
    sslow = sorted(
        map(tuple, duplicate_clusters(spairs, local_threshold=0).collect())
    )
    assert sfast == sslow
    assert sfast == [
        ("a", "a"), ("b", "a"), ("d", "a"),
        ("lonely", "lonely"),
        ("x", "x"), ("y", "x"),
    ]
