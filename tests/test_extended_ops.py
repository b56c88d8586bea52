"""Property tests for the extended operator library (dedup, similarity,
text, multimodal) at sf0.001 — the behaviors the DuckDB oracle can't pin:
LSH recall vs exact ground truth, stub gating, schema shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_rows,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from kafka_streams_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    sample_video_frames,
    synthesize_media,
)
from kafka_streams_spark.operators.similarity import (
    build_lsh_index,
    knn_brute_force,
    knn_lsh,
)
from kafka_streams_spark.operators.text import language_id, quality_score


# Caches MUST unpersist on module teardown: the SparkSession is
# session-scoped, and a live cached relation substitutes itself into any
# LATER test's plan that matches (full-width InMemoryRelation replaces
# the pruned file scan) — observed breaking a column-pruning plan pin
# in a different test file.
@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_dedup_exact_synthetic(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z"), (4, "a b c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["text"]: (r["keep_id"], r["dup_count"]) for r in dedup_exact(df, ["text"], "doc_id").collect()}
    assert got == {"a b c": (1, 3), "x y z": (3, 1)}
    survivors = {r["doc_id"] for r in dedup_exact_rows(df, ["text"], "doc_id").collect()}
    assert survivors == {1, 3}


def test_minhash_recall_vs_exact(docs):
    """LSH banding must recover the high-jaccard (≥0.5 on 3-gram shingles)
    ground-truth pairs — recall 100% on the planted near-dups."""
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert truth, "testdata should contain at least one planted near-dup pair"
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, threshold=0.5
        ).collect()
    }
    assert truth <= found
    cands = minhash_lsh_candidates(docs).count()
    assert cands < docs.count() ** 2 / 4  # candidates ≪ full pair space


def test_simhash_synthetic_and_bound(spark, docs):
    # synthetic: docs with disjoint vocab, one near-identical pair (one
    # token changed out of 40) — simhash must pair exactly those two.
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    other = " ".join(f"zzz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    pairs = simhash_near_duplicates(df, max_hamming=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    # real data: every reported pair respects the hamming bound, and
    # hamming-0 (identical token multiset) pairs are always found
    found = simhash_near_duplicates(docs, max_hamming=3).collect()
    assert found and all(r["hamming"] <= 3 for r in found)
    assert {(r["id_a"], r["id_b"]) for r in found if r["hamming"] == 0}


def test_simhash_md5_pigeonhole_exact(docs):
    """The md5_60 contract path: pigeonhole LSH must equal brute-force
    all-pairs hamming filtering (exactness claim the DuckDB oracle also
    relies on), including the uneven-chunk-width coverage at bits=60."""
    from kafka_streams_spark.operators.dedup import simhash_expr

    lsh = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_duplicates(docs, max_hamming=3, hash_fn="md5_60").collect()
    }
    sigs = simhash_expr(docs, hash_fn="md5_60").alias("a")
    b = sigs.alias("b")
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in sigs.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert lsh == brute and brute


def test_knn_lsh_recall(embs):
    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(embs, qvec, k=10).collect()]
    indexed, planes = build_lsh_index(embs, dim=64, n_planes=6)
    approx = [
        r["vec_id"]
        for r in knn_lsh(
            indexed, planes, qvec, k=10, multiprobe_hamming=2
        ).collect()
    ]
    assert exact[0] == 0 and approx[0] == 0  # self-match first
    # multi-probe LSH on 500 vectors should keep decent overlap with exact
    assert len(set(exact) & set(approx)) >= 3


def test_knn_ivf_recall(embs):
    from kafka_streams_spark.operators.similarity import build_ivf_index, knn_ivf

    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(embs, qvec, k=10).collect()]
    indexed, centroids = build_ivf_index(embs, n_cells=8)
    approx = [
        r["vec_id"] for r in knn_ivf(indexed, centroids, qvec, k=10, n_probe=3).collect()
    ]
    assert approx[0] == 0  # self-match comes back first
    assert len(set(exact) & set(approx)) >= 4  # learned cells: decent recall


def test_winnowing_guarantee(spark):
    """Two docs sharing a ≥ k+window-1 token run must share a fingerprint;
    disjoint-vocab docs must not."""
    from kafka_streams_spark.operators.text import winnowing_fingerprint

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token run
    df = spark.createDataFrame(
        [
            (1, f"intro words {shared} closing remarks"),
            (2, f"other opening {shared} different end"),
            (3, "completely unrelated vocabulary entirely distinct terms"),
        ],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in winnowing_fingerprint(df).collect()}
    assert fps[1] & fps[2], "shared run must produce a shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_text_scores_bounded(docs):
    q = quality_score(docs)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0
    langs = {r["lang_guess"] for r in language_id(docs).collect()}
    assert langs <= {"en", "es", "de", "fr", "und"}


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, 50)
    feats = extract_image_features(media, codec="fake")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(1 <= r["width"] <= 1024 and 1 <= r["height"] <= 1024 for r in rows)
    assert all(len(r["feature_hex"]) == 16 for r in rows)
    frames = sample_video_frames(media, every_nth=10, codec="fake")
    per_media = frames.groupBy("media_id").count().collect()
    # 78-byte payloads -> ceil(78/10) = 8 frames (r10: the tail is a frame)
    assert all(r["count"] == 8 for r in per_media)


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_prefix_jaccard_matches_blocked(docs):
    """ngram_jaccard_pairs_prefix (AllPairs prefix filtering) must be
    output-identical to the blocked all-pairs formulation."""
    from kafka_streams_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    def norm(df):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
        )

    blocked = norm(ngram_jaccard_pairs(docs, n=1, threshold=0.7, block_col="source"))
    prefix = norm(ngram_jaccard_pairs_prefix(docs, n=1, threshold=0.7, block_col="source"))
    assert blocked == prefix and blocked


def test_jaccard_auto_dispatch(docs):
    """The engine, not the caller, picks blocked vs prefix — and a
    too-large block forces prefix regardless of density (the 100 TB
    quadratic-death guard). Output is identical either way."""
    from kafka_streams_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_auto,
        ngram_jaccard_pairs_prefix,
    )

    def norm(df):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
        )

    # dense unigram space within small blocks -> blocked form
    auto = norm(ngram_jaccard_pairs_auto(docs, n=1, threshold=0.7, block_col="source"))
    assert auto == norm(ngram_jaccard_pairs(docs, n=1, threshold=0.7, block_col="source"))
    assert auto

    # same corpus but a 10-row block cap: blocked is forbidden, prefix
    # must be chosen, and the output must not change
    guarded = norm(
        ngram_jaccard_pairs_auto(
            docs, n=1, threshold=0.7, block_col="source", max_block_rows=10
        )
    )
    assert guarded == auto

    # sparse trigram space -> prefix form
    sparse = norm(ngram_jaccard_pairs_auto(docs, n=3, threshold=0.5, block_col="source"))
    assert sparse == norm(
        ngram_jaccard_pairs_prefix(docs, n=3, threshold=0.5, block_col="source")
    )


def test_minhash_md5_arrow_equals_expr(docs):
    """md5_32 signatures from the Arrow pass must equal the expression
    twin's bit-for-bit — the equality the DuckDB minhash oracle also
    relies on (hashlib.md5 hexdigest == F.md5 == DuckDB md5, identical
    affine coeffs and prime)."""
    from kafka_streams_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_expr,
    )

    arrow = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_signatures(docs, num_hashes=16, hash_fn="md5_32").collect()
    }
    expr = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_signatures_expr(docs, num_hashes=16, hash_fn="md5_32").collect()
    }
    assert arrow == expr and arrow


def test_simhash_md5_arrow_equals_expr(docs):
    """The contract's Arrow md5_60 signatures must equal the expression
    twin's bit-for-bit (hashlib.md5 hexdigest == F.md5 == DuckDB md5),
    including dropping empty-token docs like explode/unnest do."""
    from kafka_streams_spark.operators.dedup import simhash, simhash_expr

    arrow = {r["doc_id"]: r["simhash"] for r in simhash(docs, hash_fn="md5_60").collect()}
    expr = {r["doc_id"]: r["simhash"] for r in simhash_expr(docs, hash_fn="md5_60").collect()}
    assert arrow == expr and arrow


def test_dedup_lines_semantics(spark):
    """C4-style line dedup: the first (doc, pos) occurrence of a
    repeated line survives, later ones drop; blank lines are stripped;
    a doc made entirely of later duplicates disappears."""
    from kafka_streams_spark.operators.text import dedup_lines

    rows = [
        (1, "keep me\nCOOKIE BANNER\nunique one"),
        (2, "COOKIE BANNER\nanother line\n\n  "),
        (3, "COOKIE BANNER"),
        (4, "COOKIE BANNER\nkeep me"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "keep me\nCOOKIE BANNER\nunique one"
    assert out[2]["text"] == "another line" and out[2]["n_lines"] == 1
    assert 3 not in out  # every line was a later duplicate
    assert 4 not in out  # "COOKIE BANNER" first in doc 1, "keep me" first in doc 1


def test_lm_unigram_score_semantics(spark):
    """Perplexity-proxy sanity: a doc of corpus-common tokens scores
    higher (less negative) than a doc of hapax junk; n_tokens counts
    occurrences; empty docs drop out."""
    from kafka_streams_spark.operators.text import lm_unigram_score

    rows = [
        (1, "the the the cat cat"),
        (2, "the cat sat"),
        (3, "zqx jkw vvb pqm"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lm_unigram_score(df).collect()}
    assert set(out) == {1, 2, 3}  # empty doc dropped
    assert out[1]["n_tokens"] == 5 and out[3]["n_tokens"] == 4
    assert out[1]["avg_logprob"] > out[3]["avg_logprob"]
    assert all(r["avg_logprob"] < 0 for r in out.values())


def test_no_zero_norm_embeddings(embs):
    """Contract precondition: the cosine operators map zero-norm vectors
    to similarity 0, but the DuckDB oracles call list_cosine_similarity
    directly, which yields an arbitrary value on a zero vector. The
    engines agree only while no zero-norm embedding exists — fail loudly
    here if testdata generation ever ships one."""
    from kafka_streams_spark.functions.vectors import l2_norm

    assert embs.filter(l2_norm(F.col("embedding")) == 0).count() == 0


def test_benchmark_cosine_empty_bench_rejected(embs):
    from kafka_streams_spark.operators.similarity import max_benchmark_cosine_arrow

    with pytest.raises(ValueError, match="non-empty"):
        max_benchmark_cosine_arrow(embs, [])


def test_jaccard_bitset_matches_blocked(docs):
    """The bitset form (dense-small-vocab fast path) must be
    output-identical to the blocked array form — same integer ∩/∪,
    same doubles — and must refuse oversized vocabularies."""
    from kafka_streams_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_bitset,
    )

    def norm(df):
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
        )

    bitset = norm(ngram_jaccard_pairs_bitset(docs, n=1, threshold=0.7, block_col="source"))
    blocked = norm(ngram_jaccard_pairs(docs, n=1, threshold=0.7, block_col="source"))
    assert bitset == blocked and bitset

    # no block column: full corpus self-join path
    b2 = norm(ngram_jaccard_pairs_bitset(docs, n=1, threshold=0.9))
    assert b2 == norm(ngram_jaccard_pairs(docs, n=1, threshold=0.9))

    with pytest.raises(ValueError, match="max_vocab"):
        ngram_jaccard_pairs_bitset(docs, n=2, threshold=0.5, max_vocab=16)


def test_jaccard_dispatch_rule():
    """The routing itself: dense+small -> blocked; oversized block ->
    prefix even when dense; sparse -> prefix."""
    from kafka_streams_spark.operators.dedup import jaccard_dispatch_choice

    # sf0.1-unigram-shaped stats: 620 vocab, ~1600 mean posting, small blocks
    assert jaccard_dispatch_choice(1300, 1_000_000, 620) == "blocked"
    # same density but one dominant block: the quadratic-death guard wins
    assert jaccard_dispatch_choice(1_000_000, 1_000_000, 620) == "prefix"
    # sf0.1-bigram-shaped stats: mean posting ~7
    assert jaccard_dispatch_choice(1300, 2_000_000, 300_000) == "prefix"


def test_curate_corpus_semantics(spark):
    """Gates and dedup behave: low-quality, PII-bearing, and duplicate
    docs are dropped; the min-id duplicate survives."""
    from kafka_streams_spark.operators.pipelines import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and runs far away. "
        "it is a fine day in the park and everyone enjoys that sunshine."
    )
    rows = [
        (1, good, "a"),
        (2, good, "a"),                       # exact dup of 1 -> dropped
        (3, "short text", "a"),               # fails length gate
        (4, good + " mail me at x@y.com", "a"),  # PII -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curate_corpus(df)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1}
    row = out.collect()[0]
    assert row["quality"] >= 0.75 and row["n_tokens_bpe"] > 0


def test_duplicate_clusters(spark):
    """Min-label propagation: chain, triangle, and a 2-node island must
    resolve to min-id clusters; convergence needs diameter rounds."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), triangle 10-11-12, island 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_curate_corpus_fuzzy_semantics(spark):
    """Near-dup (not byte-identical) docs collapse to the min-id
    representative before the gates run."""
    from kafka_streams_spark.operators.pipelines import curate_corpus_fuzzy

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away. "
        "it is a fine day in the park and everyone enjoys that sunshine."
    )
    other = (
        "a completely different story unfolds in the city where the old "
        "trains still run and people gather to watch them pass, and it is "
        "said that the station clock has kept perfect time for a century."
    )
    near = base + " extra"  # high token-Jaccard vs base, different bytes
    rows = [(1, base, "a"), (2, near, "a"), (3, other, "b")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["doc_id"] for r in curate_corpus_fuzzy(df, jaccard_threshold=0.8).collect()}
    assert got == {1, 3}  # 2 clustered under 1; 3 unrelated, survives


def test_hash_sample_deterministic_and_partition_invariant(spark):
    """Same ids survive regardless of partitioning (the property
    df.sample lacks); rate lands near rate_256/256."""
    from kafka_streams_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in hash_sample(df, rate_256=32).collect()}
    kept2 = {
        r["doc_id"] for r in hash_sample(df.repartition(7), rate_256=32).collect()
    }
    assert kept1 == kept2
    assert 0.08 < len(kept1) / 2000 < 0.17  # 32/256 = 12.5% ± slack


def test_pack_token_shards_budget(spark):
    """Shards are contiguous in id order per stratum; every shard except
    the last stays under budget + one document's overshoot."""
    from kafka_streams_spark.operators.sampling import pack_token_shards

    rows = [(i, "w " * (i % 7 + 1), "s") for i in range(1, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = pack_token_shards(df, budget=10).orderBy("doc_id").collect()
    # shard ids non-decreasing in doc order
    shards = [r["shard_id"] for r in out]
    assert shards == sorted(shards)
    # exclusive-cumsum rule: doc starts a new shard only when the tokens
    # before it cross the next budget boundary
    cum = 0
    for r in out:
        assert r["shard_id"] == cum // 10
        cum += r["n_tokens"]


def test_domain_stats(spark):
    """Domain extraction + per-domain doc/url counts (the sf corpus has
    no URLs, so the oracle row-match there is vacuous — this pins the
    actual semantics)."""
    from kafka_streams_spark.operators.text import domain_stats

    rows = [
        (1, "see https://Example.com/a and https://example.com/b", "s"),
        (2, "ref http://example.com/path plus https://other.org/x", "s"),
        (3, "no links here", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["domain"]: (r["n_docs"], r["n_urls"]) for r in domain_stats(df).collect()}
    assert got == {"example.com": (2, 3), "other.org": (1, 1)}


def test_decontaminate_flags_ngram_leaks(spark):
    """A training doc sharing a word 3-gram with the benchmark is
    flagged with the DISTINCT overlap count; clean docs survive with
    n_overlap=0; docs shorter than n words match as whole-doc shingles."""
    from kafka_streams_spark.operators.pipelines import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "short one")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "a tale of the quick brown fox at dawn"),  # shares 2 shingles
            (2, "completely unrelated text entirely here"),
            (3, "short one"),  # <3 words -> whole-doc shingle matches bench doc 101
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(train, bench, n=3).collect()
    }
    # doc 1 shares "the quick brown" and "quick brown fox"
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir, docs):
    """The benchmark n-gram set must broadcast — shuffling the exploded
    training corpus to meet a tiny eval suite would be the scale bug."""
    from kafka_streams_spark.operators.pipelines import decontaminate
    from kafka_streams_spark.plans.audit import audit

    out = decontaminate(docs, docs.limit(20), n=3)
    a = audit(out)
    assert "BroadcastHashJoin" in a.join_strategies, a.join_strategies


def test_quantization_roundtrip_error_bounded(spark, embs):
    """Dequantized values must sit within half a quantization step
    (range/254/2, plus float slack) of the originals, per dimension."""
    from kafka_streams_spark.operators.similarity import (
        dequantize,
        quantization_params,
        quantize_embeddings,
    )

    params = quantization_params(embs)
    q = quantize_embeddings(embs, params)
    deq = dequantize(q, params)
    joined = (
        embs.select("vec_id", "embedding")
        .join(deq, "vec_id")
        .select(
            F.max(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        "approx",
                        lambda x, a: F.abs(x.cast("double") - a),
                    ),
                    F.lit(0.0),
                    lambda acc, e: F.greatest(acc, e),
                )
            ).alias("max_err")
        )
        .head()
    )
    p = params.head()
    max_step = max(r / 254.0 / 2.0 for r in p["ranges"])
    assert joined["max_err"] <= max_step * 1.001


def test_quantized_knn_recall(spark, embs):
    """Cosine top-10 over per-vector symmetric int8 codes must recover
    ≥9/10 of the exact float top-10 — the uniform per-vector scale
    cancels in cosine, so only rounding error remains. (The per-dim
    AFFINE codes are the storage path; their offsets distort angles and
    they must be dequantized before any cosine.)"""
    from kafka_streams_spark.functions.vectors import cosine_similarity
    from kafka_streams_spark.operators.similarity import (
        knn_brute_force,
        quantize_embeddings_symmetric,
    )

    exact = {
        r["vec_id"]
        for r in knn_brute_force(
            embs, [float(x) for x in embs.head()["embedding"]], k=10
        ).collect()
    }
    q = quantize_embeddings_symmetric(embs).withColumn(
        "codes", F.transform("codes", lambda c: c.cast("double"))
    )
    qvec = [float(x) for x in q.filter(F.col("vec_id") == embs.head()["vec_id"]).head()["codes"]]
    approx = (
        q.select(
            "vec_id",
            cosine_similarity(
                F.col("codes"), F.array(*[F.lit(v) for v in qvec])
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )
    got = {r["vec_id"] for r in approx.collect()}
    assert len(exact & got) >= 9, (exact, got)

def test_hash_sample_rate_256_keeps_everything(spark):
    """rate_256=256 must keep 100% of rows (format(256,'02x') is the
    3-char '100' — lexicographic compare against a 2-char prefix would
    keep ~17/256 instead)."""
    from kafka_streams_spark.operators.sampling import hash_sample

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, rate_256=256).count() == 500


def test_hash_sample_rate_256_still_drops_null_ids(spark):
    """The documented 'NULL ids are dropped' contract must hold at the
    boundary rate too (r10 advice): every other rate rejects NULL ids
    via the NULL-md5 predicate, so the 256 early-return path must
    filter them explicitly or referential integrity across two sampled
    tables breaks discontinuously at rate 256."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.sampling import hash_sample

    df = spark.range(0, 100).select(
        F.when(F.col("id") < 90, F.col("id")).alias("doc_id")
    )
    assert hash_sample(df, rate_256=256).count() == 90
    # and the filtered rows are exactly the NULL-id ones
    assert (
        hash_sample(df, rate_256=256).filter(F.col("doc_id").isNull()).count()
        == 0
    )


def test_asof_join_preserves_null_payload_of_matched_row(spark):
    """A NULL payload field on the most recent matching right row must
    surface as NULL — not be skipped in favor of a stale older value
    (DuckDB ASOF JOIN semantics)."""
    from kafka_streams_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 100), ("k", 300)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 50, "old", 1), ("k", 200, None, 2)],
        "key string, ts long, label string, version int",
    )
    out = {
        r["ts"]: (r["label_asof"], r["version_asof"])
        for r in asof_join(left, right, "key", "ts", ["label", "version"]).collect()
    }
    assert out[100] == ("old", 1)
    # ts=300's most recent right row (ts=200) has label NULL: keep it NULL
    assert out[300] == (None, 2)


def test_asof_join_no_prior_row_is_all_null(spark):
    from kafka_streams_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 50, "future")], "key string, ts long, label string"
    )
    row = asof_join(left, right, "key", "ts", ["label"]).collect()[0]
    assert row["label_asof"] is None

def test_knn_to_id_variants_match_driver_side_twins(embs):
    """The collect-free to_id variants (query vector via broadcast
    single-row join, probe set in-plan) must return exactly the same
    rows as the literal-vector forms they replace."""
    from kafka_streams_spark.operators.similarity import (
        build_ivf_index,
        build_lsh_index,
        knn_ivf,
        knn_ivf_to_id,
        knn_lsh,
        knn_lsh_to_id,
    )

    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]

    indexed, planes = build_lsh_index(embs, dim=64, n_planes=6)
    lit_lsh = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in knn_lsh(indexed, planes, qvec, k=10, multiprobe_hamming=2).collect()
    ]
    to_id_lsh = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in knn_lsh_to_id(indexed, 0, k=10, multiprobe_hamming=2).collect()
    ]
    assert lit_lsh == to_id_lsh

    indexed, centroids = build_ivf_index(embs, n_cells=8)
    lit_ivf = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in knn_ivf(indexed, centroids, qvec, k=10, n_probe=3).collect()
    ]
    to_id_ivf = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in knn_ivf_to_id(indexed, centroids, 0, k=10, n_probe=3).collect()
    ]
    assert lit_ivf == to_id_ivf


def test_lsh_cluster_composition_recall(embs):
    """The registered 100 TB composition (LSH near-dup pairs -> connected
    components) must recover most of the exact blocked composition's
    duplicate structure: every LSH cluster edge set is a subset of the
    exact pair graph (no false merges at equal threshold), and recall of
    exact pairs stays high."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters
    from kafka_streams_spark.operators.similarity import (
        embedding_near_duplicates,
        exact_pairs_cosine,
    )

    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in exact_pairs_cosine(embs, threshold=0.3).collect()
    }
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            embs, threshold=0.3, n_planes=4, n_tables=8
        ).collect()
    }
    assert exact_pairs, "testdata should contain near-dup embedding pairs"
    assert lsh_pairs <= exact_pairs  # exact verify: no false positives
    assert len(lsh_pairs) / len(exact_pairs) >= 0.5  # bucketing recall

    clusters = duplicate_clusters(
        embedding_near_duplicates(
            embs, threshold=0.3, n_planes=4, n_tables=8
        ).select("id_a", "id_b")
    ).collect()
    by_node = {r["node"]: r["cluster_id"] for r in clusters}
    # every LSH pair ends up co-clustered
    assert all(by_node[a] == by_node[b] for a, b in lsh_pairs)

def test_audio_features_and_resize_plumbing(spark):
    """Audio twin + binary->binary resize: schema shapes, determinism,
    real-codec gating."""
    import pytest

    from kafka_streams_spark.operators.multimodal import (
        decode_audio,
        extract_audio_features,
        resize_images,
    )

    media = synthesize_media(spark, 50)
    feats = extract_audio_features(media, codec="fake").collect()
    assert len(feats) == 50
    for r in feats:
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert r["duration_ms"] == r["n_samples"] * 1000 // r["sample_rate"]
        assert len(r["loudness_hex"]) == 16
    # deterministic across runs
    again = extract_audio_features(media, codec="fake").collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))

    resized = resize_images(media, max_dim=256, codec="fake").collect()
    assert len(resized) == 50
    for r in resized:
        assert 1 <= r["width"] <= 256 and 1 <= r["height"] <= 256
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 32

    with pytest.raises(NotImplementedError):
        decode_audio(b"x")
    with pytest.raises(NotImplementedError):
        extract_audio_features(media, codec="real")

def test_temperature_mix_flattens_skewed_strata(spark):
    """Sizes 100 vs 400 at T=2: the small stratum is kept whole, the big
    one downsamples toward 400·sqrt(100/400) = 200 (hash-uniform, so
    within binomial noise); T=1 is the identity; output is
    deterministic and a subset."""
    import pytest

    from kafka_streams_spark.operators.sampling import temperature_mix

    rows = [(i, "small") for i in range(100)] + [(1000 + i, "big") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    out = temperature_mix(df, temperature=2.0)
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["small"] == 100
    assert 150 <= by_src["big"] <= 250  # expect ~200

    again = temperature_mix(df, temperature=2.0)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    assert temperature_mix(df, temperature=1.0).count() == 500
    with pytest.raises(ValueError):
        temperature_mix(df, temperature=0)


def test_chunk_documents_windows(spark):
    """Chunk boundaries: stride = chunk - overlap; last chunk is the
    remainder; short and empty docs yield exactly one chunk."""
    from kafka_streams_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert out[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in out
    assert out[(2, 0)] == ("a b", 2)
    assert out[(3, 0)] == ("", 0)
    # every token index is covered by some chunk
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


@pytest.mark.parametrize("seed,threshold", [(1, 0.5), (2, 0.3), (3, 0.8)])
def test_prefix_jaccard_randomized_equivalence(spark, seed, threshold):
    """Randomized prefix-vs-blocked equivalence, exercising the AllPairs
    LENGTH filter's boundary: docs of wildly different sizes (1..40
    tokens) over a tiny vocabulary produce many pairs sitting exactly on
    t·max(|a|,|b|) = min(|a|,|b|) — a wrongly-strict filter drops them."""
    import random

    from kafka_streams_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def norm(out):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in out.collect()
        )

    blocked = norm(ngram_jaccard_pairs(df, n=1, threshold=threshold))
    prefix = norm(ngram_jaccard_pairs_prefix(df, n=1, threshold=threshold))
    assert blocked == prefix
    assert blocked  # non-vacuous: the tiny vocabulary guarantees matches


def test_knn_ivf_label_recall_and_probe_pruning(embs):
    """Label-cell IVF: self-match first (the query's own label is always
    the rank-1 probe), candidates restricted to exactly n_probe labels,
    decent overlap with brute-force exact."""
    from kafka_streams_spark.operators.similarity import (
        knn_brute_force,
        knn_ivf_label_to_id,
    )

    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(embs, qvec, k=10).collect()]
    approx = [
        r["vec_id"] for r in knn_ivf_label_to_id(embs, query_id=0, k=10, n_probe=3).collect()
    ]
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 3
    # returned ids live in at most n_probe distinct labels
    got_labels = (
        embs.filter(F.col("vec_id").isin(approx)).select("label").distinct().count()
    )
    assert got_labels <= 3


def test_knn_ivf_label_full_probe_equals_exact(embs):
    """Probing every cell degenerates to exact brute force."""
    from kafka_streams_spark.operators.similarity import (
        knn_brute_force,
        knn_ivf_label_to_id,
    )

    n_labels = embs.select("label").distinct().count()
    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(embs, qvec, k=10).collect()]
    full = [
        r["vec_id"]
        for r in knn_ivf_label_to_id(embs, query_id=0, k=10, n_probe=n_labels).collect()
    ]
    assert full == exact


def test_knn_ivf_label_validates_n_probe(embs):
    from kafka_streams_spark.operators.similarity import knn_ivf_label_to_id

    with pytest.raises(ValueError, match="n_probe"):
        knn_ivf_label_to_id(embs, query_id=0, n_probe=0)

def test_simhash_radius_zero_is_exact_signature_dedup(spark):
    """max_hamming=0 makes the single pigeonhole chunk the FULL 64-bit
    signature — a legitimate exact-signature dedup call that used to
    die at plan construction ((1 << 64) - 1 does not fit a long
    literal; r7 self-review find). Width-64 chunks take the signature
    whole, no mask."""
    from kafka_streams_spark.operators.dedup import simhash_near_duplicates

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zeta")],
        "doc_id bigint, text string",
    )
    out = simhash_near_duplicates(docs, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]

def test_asof_null_timestamp_and_duplicate_ts_rules(spark):
    """r7 review wave 4 (verified by execution before the fix): a
    NULL-ts right row sorted NULLS FIRST and its payload was carried
    into every left row as a phantom 'earliest prior' match, and
    duplicate (key, ts) right rows resolved partition-order-
    dependently. Rules now: NULL-ts right rows never match; NULL-ts
    left rows get the no-match NULL; duplicate-(key, ts) ties resolve
    to the LARGEST payload struct (mirrored in the DuckDB oracle)."""
    from kafka_streams_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 5), ("k", None)], "key string, ts bigint")
    right = spark.createDataFrame(
        [("k", None, "X"), ("k", 10, "Y"), ("k", 3, "Z")],
        "key string, ts bigint, payload string",
    )
    out = {
        r["ts"]: r["payload_asof"]
        for r in asof_join(
            left, right, key="key", ts="ts", payload_cols=["payload"]
        ).collect()
    }
    assert out == {5: "Z", None: None}

    l2 = spark.createDataFrame([("k", 7)], "key string, ts bigint")
    r2 = spark.createDataFrame(
        [("k", 5, "X"), ("k", 5, "Y")], "key string, ts bigint, payload string"
    )
    got = asof_join(l2, r2, key="key", ts="ts", payload_cols=["payload"]).collect()
    assert [(r["ts"], r["payload_asof"]) for r in got] == [(7, "Y")]

def test_fake_codec_inline_copies_match_reference(spark):
    """The mapInPandas closures carry self-contained inline copies of
    _fake_decode (required for launch-dir independence); this pin makes
    drift between a closure and the reference definition loud (r7
    review wave 4: the reference was otherwise dead code)."""
    from kafka_streams_spark.operators.multimodal import (
        _fake_decode,
        extract_image_features,
    )

    payloads = [b"\x00\x01media-a", b"frame-xyz", b""]
    media = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id bigint, payload binary"
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["feature_hex"])
        for r in extract_image_features(media).collect()
    }
    for i, p in enumerate(payloads):
        ref = _fake_decode(p)
        assert got[i] == (ref["width"], ref["height"], ref["feature_hex"])


def test_ann_degenerate_inputs_quarantined(spark):
    """r10 twin-blind review pins for the ANN family: NULL embeddings
    and NaN-component vectors are quarantined at every entry point —
    without it the expression/Arrow twins disagreed (Spark: NaN sorts
    first under desc, NaN >= t is true; numpy: NaN sorts last,
    compares false), greedy k-center re-picked the same rows
    (np.minimum(x, NaN) destroys the masks), NULL signatures filled the
    hamming shortlist, and the PQ trainers crashed on a NULL sample
    row. A written LSH index carries a planes fingerprint so querying
    it with the wrong planes raises instead of scanning random buckets."""
    import pytest

    from kafka_streams_spark.operators.similarity import (
        binarize_embeddings,
        build_lsh_index,
        kcenter_select,
        knn_batch_arrow,
        knn_batch_to_ids,
        knn_from_index,
        max_benchmark_cosine,
        pq_train_codebooks,
        random_hyperplanes,
        write_lsh_index,
    )

    nan = float("nan")
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, None),
        (5, [nan, 1.0, 0.0]),
    ]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    exp = knn_batch_to_ids(embs, [1], k=5)
    arr = knn_batch_arrow(embs, {1: [1.0, 0.0, 0.0]}, k=5)
    got_e = [(r["vec_id"], r["rank"]) for r in exp.orderBy("rank").collect()]
    got_a = [(r["vec_id"], r["rank"]) for r in arr.orderBy("rank").collect()]
    assert got_e == got_a  # the pinned twin equality now holds with NaN rows
    assert all(v not in (4, 5) for v, _ in got_e)

    picks = kcenter_select(embs, k=3).collect()
    assert len({r["vec_id"] for r in picks}) == 3  # distinct picks
    assert all(r["vec_id"] not in (4, 5) for r in picks)

    flags = {
        r["vec_id"]: r["contaminated"]
        for r in max_benchmark_cosine(embs, embs.filter("vec_id = 1")).collect()
    }
    assert 5 not in flags and flags[1] is True

    sigs = binarize_embeddings(embs, bits=3)
    assert {r["vec_id"] for r in sigs.collect()} == {1, 2, 3}

    # the r11 array_max quarantine form must keep the exists-HOF's
    # exact semantics on its two divergent inputs: empty arrays and
    # all-NULL-component arrays stay KEPT (array_max gives NULL there,
    # and only a real NaN component may quarantine), while a NaN
    # hiding beside NULL components is still dropped
    from kafka_streams_spark.operators.similarity import finite_vectors

    edge = spark.createDataFrame(
        [
            (10, []),
            (11, [None, None]),
            (12, [None, float("nan")]),
            (13, [1.0, None]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    kept = {r["vec_id"] for r in finite_vectors(edge, "embedding").collect()}
    assert kept == {10, 11, 13}

    books = pq_train_codebooks(embs, m=3, k=2, sample_size=5)
    assert len(books) == 3  # trained despite NULL/NaN rows in the sample

    with pytest.raises(ValueError, match="NaN"):
        knn_batch_arrow(embs, {1: [nan, 0.0, 0.0]}, k=2).collect()


def test_lsh_index_planes_fingerprint_gate(spark, tmp_path):
    from kafka_streams_spark.operators.similarity import (
        build_lsh_index,
        knn_from_index,
        random_hyperplanes,
        write_lsh_index,
    )
    import pytest

    embs = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    )
    indexed, planes = build_lsh_index(embs, dim=3, n_planes=4, seed=7)
    path = str(tmp_path / "lsh")
    write_lsh_index(indexed, path, planes=planes)
    ok = knn_from_index(spark, path, planes, [1.0, 0.5, 1.0], k=3)
    assert ok.count() == 3
    wrong = random_hyperplanes(3, 4, seed=42)
    with pytest.raises(ValueError, match="mismatched parameters"):
        knn_from_index(spark, path, wrong, [1.0, 0.5, 1.0], k=3)


def test_video_frames_cover_payload_tail(spark):
    """r10 review fix: floor dropped the last len % every_nth bytes, so
    distinct payloads sharing a prefix emitted identical frame sets."""
    from kafka_streams_spark.operators.multimodal import sample_video_frames

    media = spark.createDataFrame(
        [(1, bytearray(b"0123456789ABCDE")), (2, bytearray(b"0123456789")),
         (3, None)],
        "media_id bigint, payload binary",
    )
    out = sample_video_frames(media, every_nth=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_md5"])
    assert len(by_id[1]) == 2  # the 5-byte tail is a frame
    assert len(by_id[2]) == 1
    assert by_id[1][0] == by_id[2][0] and by_id[1] != by_id[2]
    assert 3 not in by_id  # NULL payload quarantined, not a worker crash
