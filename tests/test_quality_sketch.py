"""Round-4 quality gates and sketches: Gopher rules, C4 cleaning,
count-min sketch, SemDeDup semantic dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spark.plans import audit
from kafka_streams_spark.sources.testdata import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# c4_clean — crafted docs exercise the rules the testdata contract can't
# (terminal punctuation, javascript lines, lorem ipsum / brace drops)
# ---------------------------------------------------------------------------


def test_c4_clean_line_rules(spark):
    from kafka_streams_spark.operators.text import c4_clean

    doc = "\n".join(
        [
            "This is a good sentence.",  # kept
            "Too short.",  # < 3 words
            "no terminal punctuation on this line",  # no .!?"
            "This line mentions JavaScript explicitly.",  # token drop
            "Another perfectly fine line!",  # kept
            '  He said "stop."  ',  # kept (quote terminal, trimmed)
        ]
    )
    out = c4_clean(_docs(spark, [(1, doc)])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 6
    assert r["n_lines_kept"] == 3
    assert r["text_clean"] == (
        "This is a good sentence.\nAnother perfectly fine line!\n"
        '  He said "stop."  '
    )


def test_c4_clean_document_drops(spark):
    from kafka_streams_spark.operators.text import c4_clean

    rows = [
        (1, "A clean document sentence."),
        (2, "Contains Lorem Ipsum dolor sit amet."),  # dropped (case-insens)
        (3, "Some code { return 1; } in the text."),  # dropped (brace)
        (4, "no punctuation at all here"),  # kept doc, 0 kept lines → out
    ]
    out = c4_clean(_docs(spark, rows))
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_c4_clean_is_map_only(spark, sf_dir):
    from kafka_streams_spark.operators.text import c4_clean

    a = audit(c4_clean(load_table(spark, sf_dir, "documents")))
    assert a.num_exchanges == 0, a.plan
    assert a.num_scans == 1


# ---------------------------------------------------------------------------
# gopher_quality
# ---------------------------------------------------------------------------


def test_gopher_rules_fire_individually(spark):
    from kafka_streams_spark.operators.text import gopher_quality

    good = "the quick brown fox jumps over a lazy dog and " * 8  # 80 words
    rows = [
        (1, good),
        (2, "the of and to"),  # too few words
        (3, "### " * 60 + good),  # symbol ratio
        (4, "\n".join(["- bullet item the a of"] * 10)),  # bullets (and len)
        (5, ("zz1 " * 60) + "the a"),  # alpha ok (zz1 has letters)
        (6, ("123 456 789 " * 30) + "the a of"),  # alpha ratio fails
    ]
    out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, rows)).collect()}
    assert out[1]["passes_gopher"]
    assert not out[2]["passes_gopher"] and out[2]["n_words"] == 4
    assert not out[3]["passes_gopher"] and out[3]["symbol_ratio"] > 0.1
    assert not out[4]["passes_gopher"] and out[4]["bullet_line_ratio"] == 1.0
    assert not out[6]["passes_gopher"] and out[6]["alpha_word_ratio"] < 0.8
    # mean word length: all non-ws chars / words
    assert abs(out[2]["mean_word_len"] - (len("theofandto") / 4)) < 1e-12


def test_gopher_is_map_only(spark, sf_dir):
    from kafka_streams_spark.operators.text import gopher_quality

    a = audit(gopher_quality(load_table(spark, sf_dir, "documents")))
    assert a.num_exchanges == 0, a.plan


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_estimate_dominates_exact_count(spark, sf_dir):
    """The CMS guarantee: est ≥ exact for EVERY token, tight for hot
    tokens when w ≫ vocab."""
    from kafka_streams_spark.operators.dedup import tokens
    from kafka_streams_spark.operators.text import cms_token_estimates

    docs = load_table(spark, sf_dir, "documents")
    vocab = [
        r["t"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .distinct()
        .collect()
    ]
    out = cms_token_estimates(docs, vocab + ["absent-token"], d=4, w=512).collect()
    assert len(out) == len(vocab) + 1
    for r in out:
        assert r["cms_count"] >= r["exact_count"], r
    # the absent token may collide but must report exact 0
    absent = [r for r in out if r["token"] == "absent-token"][0]
    assert absent["exact_count"] == 0


def test_cms_sketch_merges_by_addition(spark, sf_dir):
    """Sketch of the whole corpus == per-(row,bucket) sum of the two
    half-corpus sketches — the mergeability that makes CMS a per-shard
    summary at 100 TB."""
    from kafka_streams_spark.operators.text import cms_token_sketch

    docs = load_table(spark, sf_dir, "documents")
    whole = cms_token_sketch(docs, d=3, w=128)
    half_a = cms_token_sketch(docs.filter(F.col("doc_id") % 2 == 0), d=3, w=128)
    half_b = cms_token_sketch(docs.filter(F.col("doc_id") % 2 == 1), d=3, w=128)
    merged = (
        half_a.unionByName(half_b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_cms_sketch_single_shuffle_bounded_output(spark, sf_dir):
    from kafka_streams_spark.operators.text import cms_token_sketch

    sk = cms_token_sketch(load_table(spark, sf_dir, "documents"), d=4, w=64)
    a = audit(sk)
    # one HASH exchange — the (row_idx, bucket) aggregation shuffle.
    # The r15 spread() floor adds a round-robin REPARTITION_BY_NUM
    # widening exchange on the serial scan input (a no-op at real
    # scale), which num_hash_exchanges deliberately excludes; any
    # non-widening extra exchange still fails the pin.
    assert a.num_hash_exchanges == 1, a.plan
    assert a.num_exchanges - a.num_hash_exchanges <= 1, a.plan
    assert a.has_partial_aggregation, a.plan  # map-side combine to ≤ d·w rows
    assert sk.count() <= 4 * 64


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def test_semdedup_survivors_complement_dropped(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import (
        exact_pairs_cosine,
        semdedup,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    survivors = {r["vec_id"] for r in semdedup(embs, threshold=0.3).collect()}
    pairs = exact_pairs_cosine(embs, 0.3, block_col="label").collect()
    dropped = {r["id_b"] for r in pairs}
    all_ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
    assert survivors == all_ids - dropped
    # min-id vector of every cell always survives
    min_ids = {
        r["m"]
        for r in embs.groupBy("label").agg(F.min("vec_id").alias("m")).collect()
    }
    assert min_ids <= survivors


# ---------------------------------------------------------------------------
# minhash_jaccard_estimate
# ---------------------------------------------------------------------------


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = minhash_jaccard_estimate(docs, hash_fn="md5_32").collect()
    assert rows, "banding should produce candidates on the testdata"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["abs_err"] == abs(r["est_jaccard"] - r["jaccard"])
    # k=64 ⇒ stderr ≤ √(.25/64) ≈ 0.0625; mean |err| must be well inside
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.12, mean_err
    # exactly the candidate pairs the banding produces — no more, no less
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, hash_fn="md5_32").collect()
    }
    assert {(r["id_a"], r["id_b"]) for r in rows} == cands


# ---------------------------------------------------------------------------
# hashed_bow_embedding
# ---------------------------------------------------------------------------


def test_hashed_bow_unit_norm_and_stability(spark, sf_dir):
    import math

    from kafka_streams_spark.operators.text import hashed_bow_embedding

    docs = load_table(spark, sf_dir, "documents")
    out = hashed_bow_embedding(docs, dim=32)
    rows = out.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    for r in rows[:50]:
        nrm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert nrm == 0.0 or abs(nrm - 1.0) < 1e-9
    # partition-invariant (pure hash arithmetic, no nondeterminism)
    again = hashed_bow_embedding(docs.repartition(17), dim=32)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_hashed_bow_composes_with_similarity_ops(spark, sf_dir):
    """The output schema matches the embeddings table, so the whole
    similarity family runs on text docs with no model in the loop."""
    from kafka_streams_spark.operators.similarity import exact_pairs_cosine
    from kafka_streams_spark.operators.text import hashed_bow_embedding

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_bow_embedding(docs, dim=32).withColumnRenamed("doc_id", "vec_id")
    pairs = exact_pairs_cosine(emb, threshold=0.9)
    assert pairs.columns == ["id_a", "id_b", "cosine_sim"]
    pairs.count()  # runs end-to-end


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------


def test_zipf_fit_closed_form_matches_numpy(spark):
    import numpy as np

    from kafka_streams_spark.operators.text import zipf_fit

    # one doc per token occurrence: freqs 8,4,2,1 → known rank/freq line
    rows = [(i, w) for i, w in enumerate(
        ["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"]
    )]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = zipf_fit(docs, k=10).collect()[0]
    x = np.log10(np.arange(1, 5))
    y = np.log10(np.array([8.0, 4.0, 2.0, 1.0]))
    slope, intercept = np.polyfit(x, y, 1)
    assert out["n_ranked_tokens"] == 4
    assert abs(out["slope"] - round(slope, 6)) <= 1e-6
    assert abs(out["intercept"] - round(intercept, 6)) <= 1e-6


def test_zipf_fit_negative_slope_on_testdata(spark, sf_dir):
    from kafka_streams_spark.operators.text import zipf_fit

    out = zipf_fit(load_table(spark, sf_dir, "documents"), k=100).collect()[0]
    assert out["slope"] < 0, out


# ---------------------------------------------------------------------------
# split_sentences
# ---------------------------------------------------------------------------


def test_split_sentences_rules(spark):
    from kafka_streams_spark.operators.text import split_sentences

    rows = [
        (1, "First sentence. Second one!  Third?No space... and last"),
        (2, "no terminal punct at all"),
        (3, "..."),  # only punctuation → no sentences
    ]
    out = split_sentences(_docs(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    assert by_doc[1] == [
        (0, "First sentence."),
        (1, "Second one!"),
        (2, "Third?"),
        (3, "No space..."),
        (4, "and last"),
    ]
    assert by_doc[2] == [(0, "no terminal punct at all")]
    assert 3 not in by_doc


def test_split_sentences_is_map_only(spark, sf_dir):
    from kafka_streams_spark.operators.text import split_sentences

    a = audit(split_sentences(load_table(spark, sf_dir, "documents")))
    assert a.num_exchanges == 0, a.plan


# ---------------------------------------------------------------------------
# token_budget_mix
# ---------------------------------------------------------------------------


def test_token_budget_mix_hits_budget_shares(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import token_budget_mix
    from kafka_streams_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    shares = {"src1": 0.5, "src2": 0.5}
    out = token_budget_mix(docs, shares, budget_tokens=2000)
    got = {
        r["source"]: r["tok"]
        for r in out.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("tok"))
        .collect()
    }
    # whitelist: only the named strata survive
    assert set(got) <= set(shares)
    # each stratum lands within sampling noise of budget·share (the
    # expectation); generous band for the small corpus
    for s, tok in got.items():
        assert 0.4 * 1000 < tok < 2.0 * 1000, (s, tok)


def test_token_budget_mix_caps_rate_at_one(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import token_budget_mix

    docs = load_table(spark, sf_dir, "documents")
    n_src1 = docs.filter(F.col("source") == "src1").count()
    # absurd budget → rate 1.0 → the whole stratum survives
    out = token_budget_mix(docs, {"src1": 1.0}, budget_tokens=10**9)
    assert out.count() == n_src1


def test_token_budget_mix_validates(spark, sf_dir):
    import pytest

    from kafka_streams_spark.operators.sampling import token_budget_mix

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        token_budget_mix(docs, {"src1": 1.5}, budget_tokens=100)
    with pytest.raises(ValueError):
        token_budget_mix(docs, {"src1": 0.5}, budget_tokens=0)


# ---------------------------------------------------------------------------
# ccnet_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_equal_thirds_ordered(spark, sf_dir):
    from kafka_streams_spark.operators.text import ccnet_buckets

    out = ccnet_buckets(load_table(spark, sf_dir, "documents")).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rows:
            sizes[r["bucket"]] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # every head score ≥ every tail score within the language
        heads = [r["avg_logprob"] for r in rows if r["bucket"] == "head"]
        tails = [r["avg_logprob"] for r in rows if r["bucket"] == "tail"]
        if heads and tails:
            assert min(heads) >= max(tails), lang


# ---------------------------------------------------------------------------
# weighted_jaccard_pairs
# ---------------------------------------------------------------------------


def test_weighted_jaccard_downweights_boilerplate(spark):
    from kafka_streams_spark.operators.dedup import weighted_jaccard_pairs

    # 'footer' appears in EVERY doc → w=log10(4/4)=0; docs 1,2 share the
    # rare pair (aardvark, quux); docs 3,4 overlap ONLY on boilerplate.
    rows = [
        (1, "aardvark quux footer alpha"),
        (2, "aardvark quux footer beta"),
        (3, "gamma delta footer"),
        (4, "epsilon zeta footer"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        (r["id_a"], r["id_b"]): r["weighted_jaccard"]
        for r in weighted_jaccard_pairs(docs, n=1, threshold=1e-9).collect()
    }
    # hand-check: w(aardvark)=w(quux)=log10(2), w(alpha)=w(beta)=log10(4),
    # w(footer)=0 → wj = 2·log10(2) / (2·log10(2) + 2·log10(4)) = 1/3
    assert abs(out[(1, 2)] - round(1 / 3, 6)) <= 1e-6
    # boilerplate-only overlap scores exactly 0 (weight of 'footer' is 0)
    assert out.get((3, 4), 0.0) == 0.0


def test_weighted_jaccard_bounded_and_symmetric_inputs(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import weighted_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    rows = weighted_jaccard_pairs(
        docs, n=1, threshold=0.2, block_col="source"
    ).collect()
    assert rows
    for r in rows[:200]:
        assert 0.0 <= r["weighted_jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]


# ---------------------------------------------------------------------------
# knn over hashed-BoW text embeddings (the composition contract)
# ---------------------------------------------------------------------------


def test_knn_text_self_is_rank_one(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import knn_batch_to_ids
    from kafka_streams_spark.operators.text import hashed_bow_embedding

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_bow_embedding(docs, dim=64).withColumnRenamed("doc_id", "vec_id")
    out = knn_batch_to_ids(emb, query_ids=[0], k=5).orderBy("rank").collect()
    assert out[0]["vec_id"] == 0 and out[0]["cosine_sim"] == 1.0
    sims = [r["cosine_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_token_budget_mix_zero_token_stratum_survives(spark):
    from kafka_streams_spark.operators.sampling import token_budget_mix

    docs = spark.createDataFrame(
        [(1, "", "empty"), (2, "", "empty"), (3, "some words here", "full")],
        "doc_id bigint, text string, source string",
    )
    out = token_budget_mix(docs, {"empty": 0.5, "full": 0.5}, budget_tokens=100)
    # zero-token stratum keeps everything (rate 1), no ANSI error
    assert {r["doc_id"] for r in out.filter(F.col("source") == "empty").collect()} == {1, 2}


def test_zipf_fit_single_token_slope_null(spark):
    from kafka_streams_spark.operators.text import zipf_fit

    docs = spark.createDataFrame(
        [(1, "same same same")], "doc_id bigint, text string"
    )
    row = zipf_fit(docs, k=10).collect()[0]
    assert row["n_ranked_tokens"] == 1 and row["slope"] is None


def test_semdedup_over_learned_kmeans_cells(spark, sf_dir):
    """The paper's actual configuration: k-means cluster ids as the
    cells. semdedup must compose with build_ivf_index's `cell` column
    and obey the same survivor rule per cell."""
    from kafka_streams_spark.operators.similarity import (
        build_ivf_index,
        exact_pairs_cosine,
        semdedup,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    indexed, _ = build_ivf_index(embs, n_cells=4)
    survivors = {
        r["vec_id"]
        for r in semdedup(indexed, threshold=0.3, cell_col="cell").collect()
    }
    dropped = {
        r["id_b"]
        for r in exact_pairs_cosine(indexed, 0.3, block_col="cell").collect()
    }
    all_ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
    assert survivors == all_ids - dropped
    assert survivors and dropped  # non-trivial at sf0.001+


# ---------------------------------------------------------------------------
# value histogram (mergeable quantile sketch)
# ---------------------------------------------------------------------------


def test_value_histogram_floor_buckets_and_null_excluded(spark):
    """Negative values land in their FLOOR bucket (not truncation toward
    zero) and NULLs are excluded — the two edge rules the oracle mirrors
    with the non-negative-remainder form."""
    from kafka_streams_spark.operators.profiling import value_histogram

    df = spark.createDataFrame(
        [(-7.5,), (-0.01,), (0.0,), (999.99,), (1000.0,), (None,)], "v double"
    )
    got = {
        r["bucket"]: r["counter"]
        for r in value_histogram(df, "v", bin_width_cents=100_000).collect()
    }
    # cents: -750, -1, 0, 99999, 100000 → buckets -1, -1, 0, 0, 1
    assert got == {-1: 2, 0: 2, 1: 1}


def test_value_histogram_merges_by_addition(spark, sf_dir):
    """Sketch of A ∪ B == per-bucket sum of sketch(A) + sketch(B) — the
    mergeability that makes it the per-shard distribution summary."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.profiling import value_histogram
    from kafka_streams_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 != 0)
    merged = (
        value_histogram(a, "o_totalprice")
        .unionAll(value_histogram(b, "o_totalprice"))
        .groupBy("bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    whole = value_histogram(orders, "o_totalprice")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_histogram_quantiles_within_one_bin_of_exact(spark, sf_dir):
    """The sketch estimate must sit within one bin width above the exact
    rank quantile (upper-edge convention: est ≥ exact > est − bin)."""
    from kafka_streams_spark.operators.profiling import (
        histogram_quantiles,
        value_histogram,
    )
    from kafka_streams_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    bw = 1_000_000  # 10 000.00 in value units
    h = value_histogram(orders, "o_totalprice", bin_width_cents=bw)
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = {r["q"]: r["est"] for r in histogram_quantiles(h, qs, bin_width_cents=bw).collect()}
    import math

    vals = sorted(r["o_totalprice"] for r in orders.select("o_totalprice").collect())
    n = len(vals)
    for q in qs:
        exact = vals[max(1, math.ceil(q * n)) - 1]
        assert est[q] >= exact, (q, est[q], exact)
        assert est[q] - bw / 100.0 <= exact, (q, est[q], exact)


def test_value_histogram_single_shuffle_bounded_output(spark, sf_dir):
    """Plan shape: one exchange (the bucket aggregation), map-side
    partial combine before it; output rows bounded by range/bin."""
    from kafka_streams_spark.operators.profiling import value_histogram
    from kafka_streams_spark.sources.testdata import load_table

    h = value_histogram(load_table(spark, sf_dir, "orders"), "o_totalprice")
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert h.count() <= 520  # ~500k value range / 1000.00 default bin


def test_histogram_quantiles_match_rank_model_random(spark):
    """Random values (negatives, duplicates, exact bin edges) — the
    sketch quantile must equal the model computed from the same
    histogram rule: upper edge of the first bucket whose cumulative
    count reaches ceil(q·n)."""
    import math
    import random

    from kafka_streams_spark.operators.profiling import (
        histogram_quantiles,
        value_histogram,
    )

    rng = random.Random(7)
    for trial in range(3):
        vals = [
            round(rng.uniform(-50, 50), 2) for _ in range(rng.randint(1, 300))
        ] + [10.0, -10.0, 0.0]  # exact edges
        bw = rng.choice([500, 1000])  # cents
        qs = [0.1, 0.5, 0.9]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = {
            r["q"]: r["est"]
            for r in histogram_quantiles(
                value_histogram(df, "v", bin_width_cents=bw), qs, bin_width_cents=bw
            ).collect()
        }
        # model
        def bucket(v: float) -> int:
            c = math.floor(v * 100 + 0.5)
            return (c - (c % bw if c % bw >= 0 else c % bw)) // bw if c >= 0 else -((-c + bw - 1) // bw) if c % bw else c // bw

        # simpler: python floor division IS floor
        def bucket(v: float) -> int:  # noqa: F811
            return math.floor(v * 100 + 0.5) // bw

        from collections import Counter

        cnt = Counter(bucket(v) for v in vals)
        n = len(vals)
        for q in qs:
            rank = max(1, math.ceil(q * n))
            cum = 0
            for b in sorted(cnt):
                cum += cnt[b]
                if cum >= rank:
                    assert got[q] == (b + 1) * bw / 100.0, (trial, q, got[q], b)
                    break


def test_stratified_histogram_sums_to_global(spark, sf_dir):
    """Per-stratum histograms on the shared grid sum (over strata) to
    the global histogram — the cross-stratum mergeability the shared
    grid exists for."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.profiling import value_histogram
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").cast("double").alias("n_chars")
    )
    strat = value_histogram(
        docs, "n_chars", bin_width_cents=6400, group_cols=["source"]
    )
    summed = strat.groupBy("bucket").agg(F.sum("counter").alias("counter"))
    whole = value_histogram(docs, "n_chars", bin_width_cents=6400)
    assert sorted(map(tuple, summed.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_stratified_quantiles_match_per_group_rank_model(spark, sf_dir):
    """Per-stratum sketch quantiles == the rank model applied within
    each stratum independently."""
    import math

    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.profiling import (
        histogram_quantiles_by_group,
        value_histogram,
    )
    from kafka_streams_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").cast("double").alias("n_chars")
    )
    bw = 6400
    h = value_histogram(docs, "n_chars", bin_width_cents=bw, group_cols=["source"])
    got = {
        (r["source"], r["q"]): r["est"]
        for r in histogram_quantiles_by_group(
            h, [0.5, 0.9], ["source"], bin_width_cents=bw
        ).collect()
    }
    rows = docs.collect()
    by_src: dict[str, list[float]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    from collections import Counter

    for src, vals in by_src.items():
        cnt = Counter(math.floor(v * 100 + 0.5) // bw for v in vals)
        n = len(vals)
        for q in (0.5, 0.9):
            rank = max(1, math.ceil(q * n))
            cum = 0
            for b in sorted(cnt):
                cum += cnt[b]
                if cum >= rank:
                    assert got[(src, q)] == (b + 1) * bw / 100.0, (src, q)
                    break
