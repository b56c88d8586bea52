"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (and
the §2.5 north-star extensions) as (spark, sf_dir) -> DataFrame
callables; ``oracle_sql()`` gives each one's DuckDB twin (see
kafka_streams_spark/oracles.py for the cross-engine determinism rules).
Reference-parity operators run against `events` shaped as payments
(FIXTURES.md §5); extended operators use documents/embeddings. Every
DETERMINISTIC pipeline is oracle-checked — including the LSH family,
whose contract paths use md5-derived hashes / literal seed-42
hyperplanes that DuckDB reproduces bit-for-bit; only genuinely
non-reproducible ops (HLL++ sketches, the learned KMeans IVF index)
are registered without oracles (rows-only check, as the contract
allows for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_spark.sources.testdata import load_table, payments_from_events

    return payments_from_events(load_table(spark, sf_dir, "events"))


def _merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_spark.operators.payments import route_and_convert

    return route_and_convert(_payments(spark, sf_dir))


def _docs(spark, sf_dir):
    from kafka_streams_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    from kafka_streams_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# payments pipeline (reference parity, SURVEY.md §2.1)
# --------------------------------------------------------------------------


def _q_filter_rails(spark, sf_dir):
    from kafka_streams_spark.operators.payments import filter_supported_rails

    return filter_supported_rails(_payments(spark, sf_dir))


def _q_branch_gbp(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_currency

    return branch_by_currency(_q_filter_rails(spark, sf_dir))[0]


def _q_branch_usd(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_currency

    return branch_by_currency(_q_filter_rails(spark, sf_dir))[1]


def _q_fx_convert(spark, sf_dir):
    from kafka_streams_spark.operators.payments import fx_convert_usd_to_gbp

    return fx_convert_usd_to_gbp(_q_branch_usd(spark, sf_dir))


def _q_rails_foo(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_rails

    return branch_by_rails(_merged(spark, sf_dir))[0]


def _q_rails_bar(spark, sf_dir):
    from kafka_streams_spark.operators.payments import branch_by_rails

    return branch_by_rails(_merged(spark, sf_dir))[1]


def _q_balances(spark, sf_dir):
    from kafka_streams_spark.operators.payments import account_balances

    return account_balances(_merged(spark, sf_dir))


# --------------------------------------------------------------------------
# text / dedup / similarity / multimodal
# --------------------------------------------------------------------------


def _q_doc_stats(spark, sf_dir):
    from kafka_streams_spark.operators.text import doc_stats

    return doc_stats(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    from kafka_streams_spark.operators.text import quality_score

    return quality_score(_docs(spark, sf_dir))


def _q_dedup_lines(spark, sf_dir):
    from kafka_streams_spark.operators.text import dedup_lines

    return dedup_lines(_docs(spark, sf_dir))


def _q_lm_unigram(spark, sf_dir):
    from kafka_streams_spark.operators.text import lm_unigram_score

    return lm_unigram_score(_docs(spark, sf_dir))


def _q_language_id(spark, sf_dir):
    from kafka_streams_spark.operators.text import language_id

    return language_id(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    from kafka_streams_spark.operators.text import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir), ["text"], "doc_id")


def _q_dedup_exact_rows(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import dedup_exact_rows

    return dedup_exact_rows(_docs(spark, sf_dir), ["text"], "doc_id")


def _q_token_jaccard(spark, sf_dir):
    # Engine-chosen physical form: auto-dispatch applies the measured
    # blocked↔prefix rule from cheap corpus stats (max block rows,
    # mean posting-list length) — on THIS corpus unigrams are a dense
    # shingle space (620-token vocabulary, mean posting ≈ 1600) inside
    # small blocks, so the dispatcher picks the blocked join; a
    # too-large block would force prefix regardless. The prefix twin is
    # separately registered (dedup_token_jaccard_prefix) against the
    # same oracle.
    from kafka_streams_spark.operators.dedup import ngram_jaccard_pairs_auto

    return ngram_jaccard_pairs_auto(
        _docs(spark, sf_dir), n=1, threshold=0.8, block_col="source"
    )


def _q_token_jaccard_prefix(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(
        _docs(spark, sf_dir), n=1, threshold=0.8, block_col="source"
    )


def _q_ngram_jaccard(spark, sf_dir):
    # Bigrams are sparse (~620^2 potential shingles): the prefix-filtered
    # AllPairs form wins here (7.9 s vs 11.2 s at sf0.1) and is the
    # 100 TB path — candidates from rare-shingle posting lists, exact
    # verify on candidates only.
    from kafka_streams_spark.operators.dedup import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(
        _docs(spark, sf_dir), n=2, threshold=0.5, block_col="source"
    )


def _q_minhash_nd(spark, sf_dir):
    # md5_32 shingle hash + concat band keys: deterministic banding that
    # DuckDB reproduces end-to-end, so this LSH contract is
    # oracle-checked (was rows-only). crc32 stays the default fast path
    # on the operator API.
    from kafka_streams_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_docs(spark, sf_dir), threshold=0.5, hash_fn="md5_32")


def _q_simhash_nd(spark, sf_dir):
    # md5_60 signature hash: DuckDB reproduces it bit-for-bit, so this
    # contract is oracle-checked (pigeonhole bucketing is exact — no
    # false negatives — so LSH output == the oracle's all-pairs filter).
    # blake2b stays the default fast path on the operator API.
    from kafka_streams_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3, hash_fn="md5_60")


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components -> (node, cluster_id).
    Pairs come from the embedding exact near-dup query (itself
    oracle-checked); the oracle reproduces the fixpoint with a recursive
    CTE, so the iterative Spark loop is value-checked end-to-end."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters
    from kafka_streams_spark.operators.similarity import exact_pairs_cosine

    pairs = exact_pairs_cosine(_embs(spark, sf_dir), threshold=0.3, block_col="label")
    return duplicate_clusters(pairs)


def _q_knn_vec0(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import knn_to_id

    return knn_to_id(_embs(spark, sf_dir), query_id=0, k=10)


def _q_knn_ivf_vec0(spark, sf_dir):
    # Collect-free: query vector and probe-cell choice are in-plan
    # (broadcast single-row join), no .head() pre-action. The KMeans fit
    # inside build_ivf_index is the one legitimate action (training).
    # Rows-only, but floor-asserted: recall@10 >= 3 vs the exact twin
    # (tests/test_learned_floors.py — the HLL 3·rsd pattern).
    from kafka_streams_spark.operators.similarity import build_ivf_index, knn_ivf_to_id

    indexed, centroids = build_ivf_index(_embs(spark, sf_dir), n_cells=16)
    return knn_ivf_to_id(indexed, centroids, query_id=0, k=10, n_probe=2)


def _q_winnowing(spark, sf_dir):
    # md5_60 hash so the DuckDB oracle reproduces the fingerprints
    # bit-for-bit, exploded to scalar rows (the driver canonicalizer
    # cannot hash array cells — the r03 red row). xxhash64 stays the
    # default fast path on the operator API.
    from kafka_streams_spark.operators.text import winnowing_fingerprint

    fps = winnowing_fingerprint(_docs(spark, sf_dir), hash_fn="md5_60")
    return fps.select("doc_id", F.explode("fingerprints").alias("fingerprint"))


def _q_knn_ivf_label_vec0(spark, sf_dir):
    # Deterministic IVF: inverted lists = the existing `label` column,
    # centroids = per-label means (no KMeans fit, no training action) —
    # the oracle-checked twin of the learned-index knn_ivf_vec0.
    from kafka_streams_spark.operators.similarity import knn_ivf_label_to_id

    top = knn_ivf_label_to_id(_embs(spark, sf_dir), query_id=0, k=10, n_probe=2)
    return top.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q_knn_lsh_vec0(spark, sf_dir):
    # Collect-free: query vector + bucket come from the index itself via
    # a broadcast single-row join; probe set is a bit_count predicate.
    # Oracle-checked: seed-42 planes are literals in the DuckDB twin, so
    # buckets, probe set, and ranking are all reproducible. Measured
    # recall@10 vs exact on this corpus/config: 4/10 (knn_recall_vec0
    # audits exactly this) — the approximate contract is about the
    # bucketing mechanics; recall tuning is the audit's job.
    from kafka_streams_spark.operators.similarity import build_lsh_index, knn_lsh_to_id

    indexed, _planes = build_lsh_index(_embs(spark, sf_dir), dim=64, n_planes=6)
    top = knn_lsh_to_id(indexed, query_id=0, k=10, multiprobe_hamming=2)
    return top.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q_emb_near_dup(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import exact_pairs_cosine

    pairs = exact_pairs_cosine(_embs(spark, sf_dir), threshold=0.3, block_col="label")
    return pairs.select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q_emb_near_dup_lsh(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import embedding_near_duplicates

    # banded LSH: p=1-θ/π ≈ 0.6 at cosine 0.3 → 4 planes × 8 tables
    # gives ≥2/3 per-pair recall (1-(1-p^4)^8); verified exactly.
    # Oracle-checked: the seed-42 hyperplanes are embedded in the DuckDB
    # twin as literals, so the banded candidate set is reproducible.
    pairs = embedding_near_duplicates(
        _embs(spark, sf_dir), threshold=0.3, n_planes=4, n_tables=8
    )
    return pairs.select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q_dedup_clusters_lsh(spark, sf_dir):
    """The 100 TB dedup composition end-to-end: LSH-bucketed candidate
    pairs (no all-pairs join anywhere) -> connected components ->
    (node, cluster_id). Oracle-checked: deterministic seed-42 banding
    (planes embedded in the DuckDB twin) + the recursive-CTE fixpoint
    already proven on dedup_clusters; recall vs the exact blocked
    composition is additionally pinned in tests/test_extended_ops.py."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters
    from kafka_streams_spark.operators.similarity import embedding_near_duplicates

    pairs = embedding_near_duplicates(
        _embs(spark, sf_dir), threshold=0.3, n_planes=4, n_tables=8
    )
    return duplicate_clusters(pairs.select("id_a", "id_b"))


def _q_asof_purchase_click(spark, sf_dir):
    """For each purchase event: the user's most recent click at-or-before
    the purchase time (event enrichment via as-of join)."""
    from kafka_streams_spark.operators.asof import asof_join
    from kafka_streams_spark.sources.testdata import load_table

    # Times in µs on BOTH sides of the join: DuckDB reads the parquet
    # NANOS timestamps truncated to µs, so joining on raw ns here would
    # disagree with the oracle at sub-µs boundaries (and ns output values
    # would never hash-match).
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id").alias("click_id"), "value"
    )
    return asof_join(
        purchases, clicks, key="user_id", ts="ts_us", payload_cols=["click_id", "value"]
    )


def _q_pivot_events(spark, sf_dir):
    """Per-user event-type counts as a wide table (pivot)."""
    from kafka_streams_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "events")
    types = ["click", "purchase", "view", "signup", "error"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def _q_media_features(spark, sf_dir):
    from kafka_streams_spark.operators.multimodal import (
        extract_image_features,
        synthesize_media,
    )

    return extract_image_features(synthesize_media(spark, 200), codec="fake")


def _q_media_audio_features(spark, sf_dir):
    from kafka_streams_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_media,
    )

    return extract_audio_features(synthesize_media(spark, 200), codec="fake")


def _q_media_resize(spark, sf_dir):
    # payload is binary in the operator; the contract projection casts
    # it to string (the fake re-encode is ascii md5 hex) so the DuckDB
    # compare never canonicalizes raw bytes.
    from kafka_streams_spark.operators.multimodal import resize_images, synthesize_media

    out = resize_images(synthesize_media(spark, 200), max_dim=256, codec="fake")
    return out.select(
        "media_id", "width", "height", F.col("payload").cast("string").alias("payload_ascii")
    )


def _q_media_frames(spark, sf_dir):
    from kafka_streams_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media,
    )

    return sample_video_frames(synthesize_media(spark, 200), every_nth=10, codec="fake")


def _q_dsl_balances(spark, sf_dir):
    """The reference topology built through the Kafka Streams DSL facade
    (dsl.StreamsBuilder) instead of the direct operator functions — the
    driver oracle proves the facade is semantics-identical."""
    from kafka_streams_spark.dsl import StreamsBuilder
    from kafka_streams_spark.functions.numeric import java_round

    b = StreamsBuilder()
    stream = b.stream(_payments(spark, sf_dir), key="paymentId")
    routed = stream.filter(F.col("rails").isin("BANK_RAILS_FOO", "BANK_RAILS_BAR"))
    gbp, usd = routed.branch(F.col("currency") == "GBP", F.col("currency") == "USD")
    usd_fx = usd.map_values(
        amount=java_round(F.col("amount") * F.lit(0.8)), currency=F.lit("GBP")
    )
    merged = gbp.merge(usd_fx)
    table = merged.group_by(F.col("fromAccount"), "fromAccount_k").aggregate(
        F.sum("amount").alias("balance")
    )
    return table.df.withColumnRenamed("fromAccount_k", "fromAccount")


def _q_dsl_count(spark, sf_dir):
    """KGroupedStream.count through the DSL facade (SURVEY §2.4 name,
    r9 verdict item 5) on the reference topology's merged stream —
    payments per account, sharing the balances CTE chain so the oracle
    proves count over exactly the stream the balance fold consumes."""
    from kafka_streams_spark.dsl import StreamsBuilder
    from kafka_streams_spark.functions.numeric import java_round

    b = StreamsBuilder()
    stream = b.stream(_payments(spark, sf_dir), key="paymentId")
    routed = stream.filter(F.col("rails").isin("BANK_RAILS_FOO", "BANK_RAILS_BAR"))
    gbp, usd = routed.branch(F.col("currency") == "GBP", F.col("currency") == "USD")
    usd_fx = usd.map_values(
        amount=java_round(F.col("amount") * F.lit(0.8)), currency=F.lit("GBP")
    )
    merged = gbp.merge(usd_fx)
    table = merged.group_by(F.col("fromAccount"), "fromAccount_k").count(
        alias="n_payments"
    )
    return table.df.withColumnRenamed("fromAccount_k", "fromAccount")


def _q_dsl_reduce(spark, sf_dir):
    """KGroupedStream.reduce through the DSL facade — the value-typed
    fold (numeric: sum) over the merged stream; same oracle family as
    the aggregate/balances form, output column keeps the value's own
    name per reduce semantics."""
    from kafka_streams_spark.dsl import StreamsBuilder
    from kafka_streams_spark.functions.numeric import java_round

    b = StreamsBuilder()
    stream = b.stream(_payments(spark, sf_dir), key="paymentId")
    routed = stream.filter(F.col("rails").isin("BANK_RAILS_FOO", "BANK_RAILS_BAR"))
    gbp, usd = routed.branch(F.col("currency") == "GBP", F.col("currency") == "USD")
    usd_fx = usd.map_values(
        amount=java_round(F.col("amount") * F.lit(0.8)), currency=F.lit("GBP")
    )
    merged = gbp.merge(usd_fx)
    table = merged.group_by(F.col("fromAccount"), "fromAccount_k").reduce("amount")
    return table.df.withColumnRenamed("fromAccount_k", "fromAccount")


def _q_dsl_windowed_count(spark, sf_dir):
    """Windowed aggregation through the DSL facade (§2.4 windowed
    stores/aggregations), driver-checked: tumbling 1-hour event-time
    count via windowed_by(...).count() over the events table, projected
    to the epoch-hour grain so the oracle is the events_hourly shape.
    ts arrives as epoch-nanos long; `div` keeps the second/hour math in
    exact integer arithmetic (the events_hourly convention), and
    window_start is hour-aligned so unix_timestamp div 3600 is exact."""
    from kafka_streams_spark.catalog import load_table
    from kafka_streams_spark.dsl import StreamsBuilder

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_ts", F.expr("ts div 1000000000").cast("timestamp")
    )
    b = StreamsBuilder()
    t = (
        b.stream(e, key="event_type")
        .group_by_key()
        .windowed_by("ts_ts", "1 hour")
        .count(alias="n_events")
    )
    return t.df.select(
        F.expr("unix_timestamp(window_start) div 3600").alias("epoch_hour"),
        "event_type",
        "n_events",
    )


def _q_sql_balances(spark, sf_dir):
    """The balance query through the SQL surface (catalog views +
    spark.sql) — same oracle as the DataFrame and DSL forms, proving all
    three author the same Catalyst plan."""
    from kafka_streams_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT fromAccount, SUM(amount) AS balance "
        "FROM payments_merged GROUP BY fromAccount"
    )


def _q_curate_fuzzy(spark, sf_dir):
    from kafka_streams_spark.operators.pipelines import curate_corpus_fuzzy

    return curate_corpus_fuzzy(_docs(spark, sf_dir))


def _q_curate_corpus(spark, sf_dir):
    from kafka_streams_spark.operators.pipelines import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


def _q_decontaminate(spark, sf_dir):
    """Deterministic split of `documents` into a pseudo-benchmark (the
    md5-hash sample, ~6%) and a training remainder; flag remainder docs
    sharing any word 3-gram with the benchmark."""
    from kafka_streams_spark.operators.pipelines import decontaminate
    from kafka_streams_spark.operators.sampling import hash_sample, salted_id

    docs = _docs(spark, sf_dir)
    bench = hash_sample(docs, rate_256=16)
    # the training remainder is the COMPLEMENT of the benchmark sample,
    # so it must read the same salted hash hash_sample digests (r10:
    # samplers are salted per operator)
    bucket = F.substring(F.md5(salted_id("doc_id", "hash_sample")), 1, 2)
    train = docs.filter(bucket >= F.lit("10"))
    return decontaminate(train, bench, n=3)


def _q_tf_idf(spark, sf_dir):
    from kafka_streams_spark.operators.text import tf_idf_top_terms

    return tf_idf_top_terms(_docs(spark, sf_dir), k=3)


def _q_repetition_stats(spark, sf_dir):
    from kafka_streams_spark.operators.text import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _q_pii_scan(spark, sf_dir):
    from kafka_streams_spark.operators.text import pii_scan

    return pii_scan(_docs(spark, sf_dir))


# The four vector-valued contract queries emit EXPLODED scalar rows
# (id, pos, value) rather than array columns: the driver's canonicalizer
# sorts/hashes pandas cells, and Python lists are unhashable — array
# outputs can never hash-match. The operators themselves keep their
# array-returning API; posexplode is the contract-surface adapter.


def _q_label_centroids(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import label_centroids

    c = label_centroids(_embs(spark, sf_dir))
    return c.select(
        "label", "n_vecs", F.posexplode("centroid").alias("pos", "centroid_val")
    )


def _q_normalize_vectors(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import normalize_vectors

    n = normalize_vectors(_embs(spark, sf_dir))
    return n.select("vec_id", F.posexplode("unit").alias("pos", "unit_val"))


def _q_quantize(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import quantize_embeddings

    q = quantize_embeddings(_embs(spark, sf_dir))
    return q.select("vec_id", F.posexplode("codes").alias("pos", "code"))


def _q_quantize_sym(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import quantize_embeddings_symmetric

    q = quantize_embeddings_symmetric(_embs(spark, sf_dir))
    return q.select("vec_id", "scale", F.posexplode("codes").alias("pos", "code"))


def _q_top_tokens(spark, sf_dir):
    from kafka_streams_spark.operators.text import top_tokens

    return top_tokens(_docs(spark, sf_dir), k=20)


def _q_doc_length_buckets(spark, sf_dir):
    from kafka_streams_spark.operators.text import doc_length_buckets

    return doc_length_buckets(_docs(spark, sf_dir))


def _q_domain_stats(spark, sf_dir):
    from kafka_streams_spark.operators.text import domain_stats

    return domain_stats(_docs(spark, sf_dir))


def _q_hash_sample(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import hash_sample

    return hash_sample(_docs(spark, sf_dir), rate_256=32).select("doc_id", "source")


def _q_temperature_mix(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import temperature_mix

    return temperature_mix(_docs(spark, sf_dir), temperature=2.0).select(
        "doc_id", "source"
    )


def _q_chunk_documents(spark, sf_dir):
    from kafka_streams_spark.operators.text import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=16, overlap=4)


def _q_chunk_dup_stats(spark, sf_dir):
    from kafka_streams_spark.operators.text import chunk_dup_stats

    return chunk_dup_stats(_docs(spark, sf_dir), chunk_tokens=16)


def _q_events_attribution(spark, sf_dir):
    from kafka_streams_spark.operators.rangejoin import clicks_before_purchase
    from kafka_streams_spark.sources.testdata import load_table

    return clicks_before_purchase(load_table(spark, sf_dir, "events"))


def _q_profile_documents(spark, sf_dir):
    from kafka_streams_spark.operators.profiling import profile_columns

    return profile_columns(
        _docs(spark, sf_dir), ["doc_id", "lang", "source", "n_chars"], exact=True
    )


def _q_profile_documents_approx(spark, sf_dir):
    from kafka_streams_spark.operators.profiling import profile_columns

    return profile_columns(
        _docs(spark, sf_dir), ["doc_id", "lang", "source", "n_chars"], exact=False
    )


def _q_pack_shards(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import pack_token_shards

    return pack_token_shards(_docs(spark, sf_dir), budget=4000)


# Rates/epochs literals for the sampling contract queries — mirrored
# verbatim in the oracle CASE expressions; change BOTH or neither.
_STRAT_RATES = {"en": 0.5, "de": 1.0, "zh": 0.25}
_EPOCHS = {"src0": 2.5, "src1": 0.4, "src2": 0.0}


def _q_stratified_sample(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), _STRAT_RATES).select(
        "doc_id", "lang"
    )


def _q_upsample_epochs(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import upsample_epochs

    return upsample_epochs(_docs(spark, sf_dir), _EPOCHS)


def _q_shuffle_shards(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import shuffle_shards

    return shuffle_shards(_docs(spark, sf_dir), n_shards=8)


def _q_ngram_counts(spark, sf_dir):
    from kafka_streams_spark.operators.text import ngram_counts

    return ngram_counts(_docs(spark, sf_dir), n=2, k=30)


def _q_knn_batch(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import knn_batch_to_ids

    return knn_batch_to_ids(_embs(spark, sf_dir), query_ids=[0, 1, 2], k=10)


def _q_corpus_stats(spark, sf_dir):
    from kafka_streams_spark.operators.text import corpus_stats

    return corpus_stats(_docs(spark, sf_dir))


def _q_decontaminate_emb(spark, sf_dir):
    # Same bench/train split rule as decontaminate: vec_id md5-bucket
    # < '20' is the benchmark set. Contract runs the ARROW scale path
    # (benchmark matrix collected up front — eval suites are small by
    # construction — then one zero-exchange matmul map over the train
    # scan): 4.35 s -> 0.30 s at sf0.1 vs the expression form, equality
    # pinned in tests and by the unchanged oracle.
    from kafka_streams_spark.operators.similarity import (
        max_benchmark_cosine_arrow,
    )

    embs = _embs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2)
    bench_vecs = [
        list(r["embedding"])
        for r in embs.filter(bucket < "20").select("embedding").collect()
    ]
    train = embs.filter(bucket >= "20")
    return max_benchmark_cosine_arrow(train, bench_vecs, threshold=0.3)


def _q_pii_redact(spark, sf_dir):
    from kafka_streams_spark.operators.text import pii_redact

    return pii_redact(_docs(spark, sf_dir))


def _q_dedup_incremental(spark, sf_dir):
    # Same split as the decontaminate contract: md5-bucket < '20' plays
    # the "existing corpus", the rest is the increment.
    from kafka_streams_spark.operators.dedup import dedup_incremental

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    existing = docs.filter(bucket < "20")
    new = docs.filter(bucket >= "20")
    return dedup_incremental(new, existing).select("doc_id", "source")


def _q_dsir_logratio(spark, sf_dir):
    # Target distribution = the md5-bucket < '30' slice (plays the
    # "high-quality reference corpus"); base = the full corpus.
    from kafka_streams_spark.operators.text import dsir_logratio

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return dsir_logratio(docs, docs.filter(bucket < "30"))


def _q_lm_bigram(spark, sf_dir):
    from kafka_streams_spark.operators.text import lm_bigram_score

    return lm_bigram_score(_docs(spark, sf_dir))


def _q_containment_pairs(spark, sf_dir):
    # Asymmetric twin of dedup_token_jaccard: same source-blocked join,
    # containment = |A∩B| / min(|A|,|B|) instead of Jaccard.
    from kafka_streams_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), n=1, threshold=0.8, block_col="source"
    ).select("id_a", "id_b", F.round("containment", 6).alias("containment"))


def _q_bm25_search(spark, sf_dir):
    from kafka_streams_spark.operators.text import keyword_search_bm25

    return keyword_search_bm25(_docs(spark, sf_dir), ["spark", "join", "window"], k=20)


def _q_dedup_incremental_bloom(spark, sf_dir):
    # Distinct split from dedup_incremental ('40' vs '20') so the two
    # contract queries exercise different corpus shapes. Small bitmap
    # (2^14 bits) so the maybe-leg is non-trivially exercised at sf0.01.
    from kafka_streams_spark.operators.dedup import dedup_incremental_bloom

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    existing = docs.filter(bucket < "40")
    new = docs.filter(bucket >= "40")
    return dedup_incremental_bloom(new, existing, m_bits=1 << 14).select("doc_id", "source")


def _q_weighted_jaccard(spark, sf_dir):
    from kafka_streams_spark.operators.dedup import weighted_jaccard_pairs

    return weighted_jaccard_pairs(
        _docs(spark, sf_dir), n=1, threshold=0.2, block_col="source"
    )


def _q_weighted_jaccard_capped(spark, sf_dir):
    """The stop-shingle form (r8): identical machinery with max_df=350
    — high-df shingles leave the measure BEFORE weighting, bounding the
    pair stage to max_df^2 per shingle at any corpus size. The cap is
    corpus-relative in practice: 350 is ~70% of the sf0.01 correctness
    corpus (500 docs, a corpus-ubiquity cut) but only ~7% of the sf0.1
    bench corpus (5000 docs) — there it acts as a hard fan-out bound on
    the pair stage rather than a ubiquity filter (r9 advisor fix: size
    a production cap from the posting_pair_stats pre-flight at the
    actual corpus scale, not from this pinned contract constant).
    Oracle applies the same df cut."""
    from kafka_streams_spark.operators.dedup import weighted_jaccard_pairs

    return weighted_jaccard_pairs(
        _docs(spark, sf_dir), n=1, threshold=0.2, block_col="source",
        max_df=350,
    )


def _q_max_df_for_budget(spark, sf_dir):
    """Cap sizing from the measured profile (r9, advisor follow-up):
    the largest stop-shingle df cap whose surviving groups emit <= 500
    candidate pairs — same (n=1, block=source) profile as the
    weighted_jaccard contracts, so this 1-row read-off is how a
    production run would choose max_df instead of pinning 350."""
    from kafka_streams_spark.operators.dedup import (
        max_df_for_budget,
        posting_profile,
    )

    return max_df_for_budget(
        posting_profile(_docs(spark, sf_dir), n=1, block_col="source"), 500
    )


def _q_stop_band_cap(spark, sf_dir):
    """r10: the bands-occupancy pricing audit the streaming split
    assigner consults per micro-batch (the max_df_for_budget analog for
    banded candidate joins), as a batch contract: price the
    new×existing MinHash-band join (new = docs with md5 id bucket >=
    '80', the dedup_incremental split convention) and derive the
    stop-band occupancy cap for a 400-pair budget. Notably
    scale-sensitive: at sf0.001 the whole join fits (cap = max
    occupancy), at sf0.01 it does not (cap 1, everything priced out) —
    exactly the decision the audit exists to surface before the join
    runs."""
    from kafka_streams_spark.operators.dedup import (
        _banded_keys,
        band_pair_price,
        minhash_signatures,
        stop_band_cap_for_budget,
    )

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)

    def bands_of(d):
        return _banded_keys(
            minhash_signatures(d, "doc_id", "text", 64, 3, "md5_32"),
            "doc_id", 64, 32, "md5_32",
        )

    priced = band_pair_price(
        bands_of(docs.filter(bucket >= "80")),
        bands_of(docs.filter(bucket < "80")),
    )
    return stop_band_cap_for_budget(priced, 400)


def _q_posting_pair_stats(spark, sf_dir):
    """Pre-flight pricing of the weighted_jaccard contract's posting
    self-join (r8 sf1 spot-check follow-up): the exact candidate-pair
    count the (shingle, source)-clustered join will emit, from one
    linear aggregate — the lsh_bucket_stats convention applied to the
    posting-list pair family. Same (n=1, block=source) grouping as the
    weighted_jaccard contract, so this 1-row audit prices that query."""
    from kafka_streams_spark.operators.dedup import posting_pair_stats

    return posting_pair_stats(_docs(spark, sf_dir), n=1, block_col="source")


def _q_knn_text_vec0(spark, sf_dir):
    # The text→similarity bridge as one contract: feature-hash the
    # corpus, then the standard rounded-rank top-k around doc 0. The
    # oracle replays the whole chain (hash buckets → unit vectors →
    # knn's second normalize → pos-ORDERED dot sums, which match
    # Spark's sequential array folds bit-for-bit).
    from kafka_streams_spark.operators.similarity import knn_batch_to_ids
    from kafka_streams_spark.operators.text import hashed_bow_embedding

    from kafka_streams_spark.functions.partitioning import materialize_shared

    # knn consumes the embedding table on both the query and corpus
    # sides; materialize the hashed-BoW aggregation once (2.5 →
    # 2.0 s warm at sf0.1 — the multi-consumer-subtree rule).
    emb = materialize_shared(
        hashed_bow_embedding(_docs(spark, sf_dir), dim=64).withColumnRenamed(
            "doc_id", "vec_id"
        )
    )
    return knn_batch_to_ids(emb, query_ids=[0], k=10)


# token_budget_mix contract parameters — mirrored verbatim in the
# oracle SQL (kafka_streams_spark/oracles.py "token_budget_mix").
_MIX_SHARES = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
_MIX_BUDGET = 5000


def _q_token_budget_mix(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import token_budget_mix

    return token_budget_mix(
        _docs(spark, sf_dir), _MIX_SHARES, _MIX_BUDGET
    ).select("doc_id", "source")


def _q_split_sentences(spark, sf_dir):
    from kafka_streams_spark.operators.text import split_sentences

    return split_sentences(_docs(spark, sf_dir))


def _q_ccnet_buckets(spark, sf_dir):
    from kafka_streams_spark.operators.text import ccnet_buckets

    return ccnet_buckets(_docs(spark, sf_dir))


def _q_minhash_jaccard_est(spark, sf_dir):
    # md5_32 so the banding + estimate are DuckDB-reproducible; every
    # output value is an exact rational (matches/64, |A∩B|/|A∪B|), so
    # no rounding is applied.
    from kafka_streams_spark.operators.dedup import minhash_jaccard_estimate

    return minhash_jaccard_estimate(_docs(spark, sf_dir), hash_fn="md5_32")


def _q_hashed_bow(spark, sf_dir):
    # Array trap: posexplode to scalar rows; zero components dropped on
    # both sides (the oracle only materializes touched buckets).
    from kafka_streams_spark.operators.text import hashed_bow_embedding

    emb = hashed_bow_embedding(_docs(spark, sf_dir), dim=64)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("pos", "value")
    ).filter(F.col("value") != 0.0)


def _q_zipf_fit(spark, sf_dir):
    from kafka_streams_spark.operators.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), k=100)


def _q_gopher_quality(spark, sf_dir):
    from kafka_streams_spark.operators.text import gopher_quality

    return gopher_quality(_docs(spark, sf_dir))


def _q_c4_clean(spark, sf_dir):
    # Testdata docs are single-line with no terminal punctuation, so the
    # contract exercises the word-count rule (≥60 words keeps roughly
    # half the corpus); the punctuation/javascript/lorem-ipsum rules are
    # pinned by the crafted-docs unit test.
    from kafka_streams_spark.operators.text import c4_clean

    return c4_clean(
        _docs(spark, sf_dir), min_words_per_line=60, require_terminal_punct=False
    )


def _q_cms_sketch(spark, sf_dir):
    from kafka_streams_spark.operators.text import cms_token_sketch

    return cms_token_sketch(_docs(spark, sf_dir), d=4, w=256)


def _q_cms_estimates(spark, sf_dir):
    from kafka_streams_spark.operators.text import cms_token_estimates

    return cms_token_estimates(
        _docs(spark, sf_dir),
        ["the", "spark", "join", "window", "quantum"],
        d=4,
        w=256,
    )


def _q_semdedup(spark, sf_dir):
    # Same cell key + threshold as emb_near_dup_exact, so the two
    # contracts pin the pair stage and the survivor stage of the same
    # semantic-dedup composition.
    from kafka_streams_spark.operators.similarity import semdedup

    return semdedup(_embs(spark, sf_dir), threshold=0.3, cell_col="label")


def _q_assign_splits(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import assign_splits

    return assign_splits(_docs(spark, sf_dir), test_256=13, val_256=26)


def _q_cap_per_source(spark, sf_dir):
    """Per-domain document cap (r9): keep <= 30 docs per source, winners
    by md5(id) rank with id tiebreak — the kept SET is deterministic, so
    the oracle hash-checks membership, not just counts."""
    from kafka_streams_spark.operators.sampling import cap_per_group

    return cap_per_group(_docs(spark, sf_dir), "source", max_rows=30).select(
        "doc_id", "source"
    )


def _q_leakage_safe_splits(spark, sf_dir):
    """Leakage-safe train/val/test (r9): near-dup clusters (seed-42
    md5_32 MinHash banding -> connected components) move as one unit;
    singletons get the plain assign_splits assignment. The oracle
    replays banding + the recursive-CTE fixpoint + the md5-bucket CASE
    end-to-end."""
    from kafka_streams_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )
    from kafka_streams_spark.operators.sampling import leakage_safe_splits

    docs = _docs(spark, sf_dir)
    pairs = minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5_32")
    return leakage_safe_splits(docs, duplicate_clusters(pairs))


def _q_reservoir_sample(spark, sf_dir):
    # weighted by n_chars: longer documents more likely sampled, the
    # classic token-weighted inspection sample.
    from kafka_streams_spark.operators.sampling import reservoir_sample

    return reservoir_sample(
        _docs(spark, sf_dir), k=50, stratum_col="lang", weight_col="n_chars"
    )


def _q_corpus_drift(spark, sf_dir):
    # drift between the md5-bucket halves of the corpus — the same
    # deterministic split rule as decontaminate/dedup_incremental.
    from kafka_streams_spark.operators.text import corpus_drift

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return corpus_drift(docs.filter(bucket < "80"), docs.filter(bucket >= "80"))


def _q_length_outliers(spark, sf_dir):
    from kafka_streams_spark.operators.text import length_outliers

    return length_outliers(_docs(spark, sf_dir), k=3.0)


def _q_quality_calibrated(spark, sf_dir):
    from kafka_streams_spark.operators.text import quality_calibrated

    return quality_calibrated(_docs(spark, sf_dir))


def _q_emb_truncate(spark, sf_dir):
    # Matryoshka truncation to the first 16 of 64 dims, re-normalized;
    # exploded to scalar rows like the other vector-valued contracts.
    from kafka_streams_spark.operators.similarity import truncate_embeddings

    t = truncate_embeddings(_embs(spark, sf_dir), dim=16)
    return t.select("vec_id", F.posexplode("unit").alias("pos", "unit_val"))


def _q_normalize_text(spark, sf_dir):
    from kafka_streams_spark.operators.text import normalize_text

    return normalize_text(_docs(spark, sf_dir))


def _q_decontaminate_exact(spark, sf_dir):
    # benchmark probes = 60-char substrings of the md5-bucket < '08'
    # docs (guaranteed contained in their source), checked corpus-wide.
    from kafka_streams_spark.operators.text import decontaminate_exact

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    bench = (
        docs.filter(bucket < "08")
        .select(F.substring("text", 10, 60).alias("text"))
        .filter(F.length("text") >= 30)
        .distinct()
    )
    return decontaminate_exact(docs, bench)


def _q_pack_sequences(spark, sf_dir):
    from kafka_streams_spark.operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), seq_len=512)


def _q_substring_overlap(spark, sf_dir):
    # md5_60 fingerprints so the DuckDB twin reproduces the join keys;
    # min_shared=2 keeps single-span coincidences out of the contract.
    from kafka_streams_spark.operators.text import substring_overlap_pairs

    return substring_overlap_pairs(
        _docs(spark, sf_dir), min_shared=2, hash_fn="md5_60"
    )


def _q_curate_increment(spark, sf_dir):
    # Same split as dedup_incremental_fuzzy; md5_32 so the fuzzy gate's
    # banding is oracle-reproducible end-to-end.
    from kafka_streams_spark.operators.pipelines import curate_increment

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return curate_increment(
        docs.filter(bucket >= "20"), docs.filter(bucket < "20"),
        jaccard_threshold=0.5, hash_fn="md5_32",
    )


def _q_dedup_incremental_fuzzy(spark, sf_dir):
    # Same corpus split as dedup_incremental (md5 bucket < '20' is the
    # "existing corpus"); md5_32 so the banding is oracle-reproducible.
    from kafka_streams_spark.operators.dedup import dedup_incremental_fuzzy

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    existing = docs.filter(bucket < "20")
    new = docs.filter(bucket >= "20")
    return dedup_incremental_fuzzy(
        new, existing, threshold=0.5, hash_fn="md5_32"
    ).select("doc_id", "source")


def _minhash_index_cache_dir(sf_dir: str) -> str:
    """Cache directory for the persisted MinHash index of a corpus —
    key = hash of (ABSOLUTE corpus path, documents.parquet content
    fingerprint, signature-code version). The abs path (not basename)
    distinguishes the differential-fuzz harness's many same-named
    corpora under distinct pytest tmp roots; the content fingerprint
    (per-file size + mtime_ns — r12 ADVICE) busts the cache when a
    corpus is regenerated IN PLACE at the same path; MINHASH_SIG_VERSION
    busts it when the signature derivation itself changes
    (coefficients/prime/shingling — parameters the index's
    column-metadata fingerprint doesn't cover). Any stale reuse would
    silently readmit duplicates on uncached runs."""
    import hashlib as _hashlib
    import os as _os

    from kafka_streams_spark.operators.dedup import MINHASH_SIG_VERSION

    sf_name = _os.path.basename(sf_dir.rstrip("/"))
    h = _hashlib.md5()
    h.update(_os.path.abspath(sf_dir).encode("utf-8"))
    h.update(f"|sigv{MINHASH_SIG_VERSION}".encode("utf-8"))
    doc_path = _os.path.join(sf_dir, "documents.parquet")
    files = [doc_path]
    if _os.path.isdir(doc_path):
        files = sorted(
            _os.path.join(root, f)
            for root, _, names in _os.walk(doc_path)
            for f in names
        )
    for p in files:
        st = _os.stat(p)
        rel = _os.path.relpath(p, sf_dir)
        h.update(f"|{rel}:{st.st_size}:{st.st_mtime_ns}".encode("utf-8"))
    key = h.hexdigest()[:12]
    return f"/tmp/kss_minhash_index_{sf_name}_{key}_md5_32_n64_s3"


def _q_dedup_incremental_fuzzy_indexed(spark, sf_dir):
    # The 100 TB shape of the fuzzy gate: the existing corpus's MinHash
    # signatures come from a PERSISTED index (write_minhash_index,
    # built once per corpus build — 64 ints/doc) instead of being
    # recomputed from text every delta run. Output must be IDENTICAL to
    # the unindexed twin (same oracle SQL). The index is built on first
    # use per sf_dir and reused after (a real deployment writes it at
    # corpus-build time); _SUCCESS gates against a crashed partial
    # write, and the parameter fingerprint travels in the table's
    # column metadata so a mismatched reader fails loudly.
    import os as _os

    from kafka_streams_spark.operators.dedup import (
        dedup_incremental_fuzzy,
        read_minhash_index,
        write_minhash_index,
    )

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    existing = docs.filter(bucket < "20")
    new = docs.filter(bucket >= "20")
    idx = _minhash_index_cache_dir(sf_dir)
    if not _os.path.exists(_os.path.join(idx, "_SUCCESS")):
        write_minhash_index(existing, idx, hash_fn="md5_32")
    return dedup_incremental_fuzzy(
        new,
        existing,
        threshold=0.5,
        hash_fn="md5_32",
        existing_sig=read_minhash_index(spark, idx),
    ).select("doc_id", "source")


# --------------------------------------------------------------------------
# round-5 wave: corpus audits + coreset selection (r4-late queue,
# evidenced at the head of round 5)
# --------------------------------------------------------------------------


def _q_ngram_novelty(spark, sf_dir):
    """Share of each doc's distinct 3-grams that no other doc contains."""
    from kafka_streams_spark.operators.text import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), n=3)


def _q_corpus_overlap(spark, sf_dir):
    """Token-vocabulary Venn between the two md5-bucket halves of the
    corpus (the 'two snapshot dates' shape)."""
    from kafka_streams_spark.operators.text import corpus_overlap

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return corpus_overlap(docs.filter(bucket < "80"), docs.filter(bucket >= "80"), n=1)


def _q_contamination_report(spark, sf_dir):
    """Per-benchmark-item leak share vs the training remainder — the
    same md5-bucket benchmark split as `decontaminate`, scored from the
    benchmark side."""
    from kafka_streams_spark.operators.pipelines import contamination_report

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return contamination_report(
        docs.filter(bucket >= "10"), docs.filter(bucket < "10"), n=3
    )


def _q_dedup_cluster_sizes(spark, sf_dir):
    """Cluster-size histogram over the embedding near-dup components
    (the dedup_clusters contract's graph, summarized)."""
    from kafka_streams_spark.operators.dedup import cluster_size_stats

    return cluster_size_stats(_q_dedup_clusters(spark, sf_dir))


def _q_dedup_keep_best(spark, sf_dir):
    """Quality-aware duplicate survivorship: MinHash-LSH pairs (md5_32
    banding — DuckDB-reproducible) -> connected components -> keep the
    HIGHEST-quality member per cluster (ties to lowest id), singletons
    kept. The survivorship rule production dedup actually wants (the
    min-id canonical of curate_corpus_fuzzy throws away the cleanest
    copy whenever it carries a larger id); composition of three
    independently oracle-checked operators, itself oracle-checked
    end-to-end via the nested recursive-CTE oracle."""
    from kafka_streams_spark.operators.dedup import (
        duplicate_clusters,
        keep_best_per_cluster,
        minhash_near_duplicates,
    )
    from kafka_streams_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir)
    pairs = minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5_32")
    return keep_best_per_cluster(
        docs, duplicate_clusters(pairs), quality_score(docs)
    )


def _q_gate_agreement(spark, sf_dir):
    """Gopher × C4 × quality-threshold contingency table in one scan.
    C4 at the testdata contract parameters (word rule ≥60, punctuation
    rule off — single-line unpunctuated docs), quality at τ=0.5."""
    from kafka_streams_spark.operators.pipelines import quality_gate_agreement

    return quality_gate_agreement(
        _docs(spark, sf_dir),
        min_quality=0.5,
        min_words_per_line=60,
        require_terminal_punct=False,
    )


def _q_dedup_spans(spark, sf_dir):
    """RefinedWeb-style exact-substring span removal (k=5 token grams):
    later docs lose token spans already present in a lower-id doc."""
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    return dedup_substring_remove(_docs(spark, sf_dir), k=5)


def _q_dedup_spans_incremental(spark, sf_dir):
    """Delta-ingest span removal: new docs (md5 bucket < '20') lose
    token spans already present anywhere in the existing corpus
    (bucket >= '20') — the continuously-run composition of the
    RefinedWeb policy with the incremental-dedup shape."""
    from kafka_streams_spark.operators.dedup import (
        dedup_substring_remove_incremental,
    )

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return dedup_substring_remove_incremental(
        docs.filter(bucket < "20"), docs.filter(bucket >= "20"), k=5
    )


def _q_knn_pq_label_vec0(spark, sf_dir):
    """PQ ADC top-10 for vec 0 with exact label-centroid codebooks —
    training, encoding, and the asymmetric-distance ranking all run in
    scaled-integer arithmetic, so the DuckDB oracle reproduces the
    whole compressed-domain search bit-for-bit (the knn_ivf_label twin
    pattern). The codebook collect is a bounded construction job."""
    from kafka_streams_spark.operators.similarity import (
        pq_label_codebooks,
        pq_topk_to_id,
    )

    embs = _embs(spark, sf_dir)
    books = pq_label_codebooks(embs, m=4)
    return pq_topk_to_id(embs, books, query_id=0, k=10)


def _q_knn_pq_rerank_vec0(spark, sf_dir):
    """Two-stage ANN: integer-exact PQ shortlist (top-100 ADC), exact
    cosine re-rank on the shortlist only — the production compose."""
    from kafka_streams_spark.operators.similarity import (
        pq_label_codebooks,
        pq_topk_rerank_to_id,
    )

    embs = _embs(spark, sf_dir)
    books = pq_label_codebooks(embs, m=4)
    return pq_topk_rerank_to_id(embs, books, query_id=0, k=10, shortlist=100)


def _q_knn_pq_vec0(spark, sf_dir):
    """PQ ADC top-10 with LEARNED codebooks (deterministic seeded
    Lloyd's on the first-2048 sample) — rows-only like knn_ivf_vec0:
    a learned index has no closed-form SQL twin; the label-codebook
    contract above value-checks the identical encode/ADC machinery,
    and recall@10 >= 5 vs the exact twin is floor-asserted
    (tests/test_learned_floors.py)."""
    from kafka_streams_spark.operators.similarity import (
        pq_topk_to_id,
        pq_train_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_train_codebooks(embs, m=4, k=8)
    return pq_topk_to_id(embs, books, query_id=0, k=10)


def _q_language_confusion(spark, sf_dir):
    """Declared `lang` column × stopword-LID guess contingency table."""
    from kafka_streams_spark.operators.text import language_confusion

    return language_confusion(_docs(spark, sf_dir))


def _q_shard_skew(spark, sf_dir):
    """Per-source shard-balance report over the token-budget packing."""
    from kafka_streams_spark.operators.sampling import shard_skew_report

    return shard_skew_report(_docs(spark, sf_dir), budget=4000)


def _q_media_dedup(spark, sf_dir):
    """Exact media dedup over the deterministic fixture with injected
    duplicate payloads (200 media, 120 distinct payloads)."""
    from kafka_streams_spark.operators.multimodal import (
        dedup_media_exact,
        synthesize_media,
    )

    return dedup_media_exact(synthesize_media(spark, 200, distinct_payloads=120))


def _q_media_near_dup(spark, sf_dir):
    """Perceptual near-dup media pairs over the duplicate-injecting
    fixture: Arrow pHash (60-bit md5_60 fake codec, payloads never
    shuffle) → generic hamming pigeonhole. Oracle brute-forces all
    200×200 hamming distances in DuckDB."""
    from kafka_streams_spark.operators.multimodal import (
        dedup_media_near,
        synthesize_media,
    )

    return dedup_media_near(
        synthesize_media(spark, 200, distinct_payloads=120), max_hamming=8
    )


def _q_lsh_bucket_stats(spark, sf_dir):
    """Bucket-occupancy / candidate-pair-count audit of the banded LSH
    at the emb_near_dup_lsh contract's exact knobs (6 planes × 8
    tables, seed 42)."""
    from kafka_streams_spark.operators.similarity import lsh_bucket_stats

    return lsh_bucket_stats(_embs(spark, sf_dir))


def _q_emb_kcenter(spark, sf_dir):
    """Greedy k-center coreset (k=8) over the embeddings —
    oracle-checked since r8 (was rows-only): the bounded sequential
    argmax replays as a recursive CTE in DuckDB (the BPE
    recursive-trainer pattern), ranking on the rounded
    min-squared-distance with id tiebreak on both engines; NumPy-model
    equality additionally pinned in tests."""
    from kafka_streams_spark.operators.similarity import kcenter_select

    return kcenter_select(_embs(spark, sf_dir), k=8)


def _q_emb_kcenter_scalable(spark, sf_dir):
    """Two-stage composable-coreset k-center (r9, r8 verdict item 4):
    md5-hash-block the corpus into 4 blocks, greedy-traverse each block
    independently (one distributed Arrow pass), then run the exact
    traversal over the pooled candidates. The DuckDB twin replays both
    stages (per-block + final recursive CTEs), so the hash check covers
    the block hash, both argmax stages, and the pool handoff. The exact
    sequential form stays as its own contract (emb_kcenter) — the
    weighted_jaccard capped/exact pattern."""
    from kafka_streams_spark.operators.similarity import kcenter_select_scalable

    return kcenter_select_scalable(_embs(spark, sf_dir), k=8, n_blocks=4)


def _q_leakage_safe_splits_incremental(spark, sf_dir):
    """Ingestion-time split assignment (r9): existing corpus (md5 <
    '80') carries a LEGACY plain-hash assignment; the new delta adopts
    each cluster's min-id existing member's split, flags cross-split
    cluster merges, and hash-assigns genuinely new clusters. Clusters
    come from the combined-corpus MinHash banding, so the oracle
    replays banding -> fixpoint -> adoption CASE end-to-end."""
    from kafka_streams_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )
    from kafka_streams_spark.operators.sampling import (
        assign_splits,
        leakage_safe_splits_incremental,
    )

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    existing = docs.filter(bucket < "80")
    new = docs.filter(bucket >= "80")
    clusters = duplicate_clusters(
        minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5_32")
    )
    return leakage_safe_splits_incremental(
        new, assign_splits(existing), clusters
    )


def _q_events_session_native(spark, sf_dir):
    from kafka_streams_spark.operators.analytics import events_session_native

    return events_session_native(spark, sf_dir)


def _q_oov_rate(spark, sf_dir):
    from kafka_streams_spark.operators.text import oov_rate

    return oov_rate(_docs(spark, sf_dir))


def _q_dedup_normalized(spark, sf_dir):
    from kafka_streams_spark.operators.text import dedup_normalized

    return dedup_normalized(_docs(spark, sf_dir))


def _q_emb_gram(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import embedding_gram

    return embedding_gram(_embs(spark, sf_dir))


def _q_emb_norm_outliers(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import norm_outliers

    return norm_outliers(_embs(spark, sf_dir))


def _q_emb_drift(spark, sf_dir):
    # Slice rule matches decontaminate_emb: md5 bucket < '20' is side A.
    from kafka_streams_spark.operators.similarity import embedding_drift

    embs = _embs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2)
    return embedding_drift(embs.filter(bucket < "20"), embs.filter(bucket >= "20"))


def _q_knn_lsh_mt_vec0(spark, sf_dir):
    # OR-amplification answer to the recall audit: 4 tables x 4 planes
    # measures 8/10 recall@10 where the single 6-plane table saturates
    # at 4/10 (h<=2) to 7-8/10 (h<=4). Literal seed planes per table
    # keep it oracle-checked end-to-end.
    from kafka_streams_spark.operators.similarity import knn_lsh_multitable

    return knn_lsh_multitable(_embs(spark, sf_dir), query_id=0, k=10)


def _q_knn_recall_vec0(spark, sf_dir):
    # Same (planes=6, h=2) config as knn_lsh_vec0; composes the two
    # verified rankings into a one-row recall@10 audit.
    from kafka_streams_spark.operators.similarity import knn_recall_audit

    return knn_recall_audit(_embs(spark, sf_dir), query_id=0, k=10)


def _q_knn_ivfpq_vec0(spark, sf_dir):
    """IVF-PQ: cell probing (n_probe=2 deterministic label cells) ->
    PQ ADC shortlist over probed cells only -> exact cosine re-rank —
    the billion-scale composition, oracle-checked end-to-end."""
    from kafka_streams_spark.operators.similarity import (
        ivfpq_topk_to_id,
        pq_label_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_label_codebooks(embs, m=4)
    return ivfpq_topk_to_id(embs, books, query_id=0, k=10, n_probe=2, shortlist=100)


def _q_pq_error_vec0(spark, sf_dir):
    # Distance-fidelity leg of the audit family: ADC vs exact int
    # squared distance on the top-50 ADC candidates.
    from kafka_streams_spark.operators.similarity import (
        pq_error_audit,
        pq_label_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_label_codebooks(embs, m=4)
    return pq_error_audit(embs, books, query_id=0, k=50)


def _q_knn_recall_mt_vec0(spark, sf_dir):
    # The other half of the tuning comparison: audits the multitable
    # path at its contract config (4 tables x 4 planes).
    from kafka_streams_spark.operators.similarity import knn_recall_audit

    return knn_recall_audit(
        _embs(spark, sf_dir), query_id=0, k=10,
        n_planes=4, method="multitable", n_tables=4,
    )


def _q_badword_filter(spark, sf_dir):
    from kafka_streams_spark.operators.text import badword_filter

    return badword_filter(_docs(spark, sf_dir))


def _q_emb_profile(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import embedding_profile

    return embedding_profile(_embs(spark, sf_dir))


def _q_events_rate_anomaly(spark, sf_dir):
    from kafka_streams_spark.operators.analytics import events_rate_anomaly

    return events_rate_anomaly(spark, sf_dir)


def _q_corpus_diff(spark, sf_dir):
    # Two synthetic corpus versions from one table so all four statuses
    # occur: old = md5 bucket >= '20'; new = bucket < '80' with every
    # 7th doc's text perturbed ("changed").
    from kafka_streams_spark.operators.pipelines import corpus_diff

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    old = docs.filter(bucket >= "20")
    new = docs.filter(bucket < "80").withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("x")))
        .otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


def _q_corpus_scorecard(spark, sf_dir):
    from kafka_streams_spark.operators.pipelines import corpus_scorecard

    return corpus_scorecard(_docs(spark, sf_dir))


def _q_events_dead_hours(spark, sf_dir):
    from kafka_streams_spark.operators.analytics import events_dead_hours

    return events_dead_hours(spark, sf_dir)


def _q_knn_recall_ivfpq_vec0(spark, sf_dir):
    # Third leg of the ANN recall comparison: audits ivfpq_topk_to_id
    # at its contract config (label codebooks, n_probe=2, shortlist=100).
    from kafka_streams_spark.operators.similarity import (
        knn_recall_audit,
        pq_label_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_label_codebooks(embs, m=4)
    return knn_recall_audit(
        embs, query_id=0, k=10, method="ivfpq",
        codebooks=books, n_probe=2, shortlist=100,
    )


def _q_emb_binarize(spark, sf_dir):
    # Sign-bit binary quantization signatures (8 bytes/vector) — the
    # axis-aligned LSH index table; fully expression-level.
    from kafka_streams_spark.operators.similarity import binarize_embeddings

    return binarize_embeddings(_embs(spark, sf_dir))


def _q_knn_hamming_vec0(spark, sf_dir):
    # Binary-quantization ANN: popcount shortlist (100) + exact cosine
    # re-rank — the fourth ANN path. Measured 10/10 recall@10 at
    # shortlist=100 on this corpus (vs multitable LSH's 8/10).
    from kafka_streams_spark.operators.similarity import knn_hamming_to_id

    return knn_hamming_to_id(_embs(spark, sf_dir), query_id=0, k=10, shortlist=100)


def _q_knn_recall_hamming_vec0(spark, sf_dir):
    # Recall@k audit of the hamming path at its contract config.
    from kafka_streams_spark.operators.similarity import knn_recall_audit

    return knn_recall_audit(
        _embs(spark, sf_dir), query_id=0, k=10, method="hamming", shortlist=100
    )


def _q_emb_near_dup_hamming(spark, sf_dir):
    # Binary near-dup at hamming <= 16 (min pairwise distance on this
    # corpus is 14), exact-cosine verified, ENGINE-DISPATCHED: auto
    # prices the radius with hamming_bucket_stats and routes pigeonhole
    # vs popcount-cross-join (identical exact output; at this wide
    # radius the audit measures candidates > all-pairs, so brute wins —
    # 0.6 s vs 2.4 s at sf0.01-isolated). The jaccard auto precedent
    # applied to the hamming family.
    from kafka_streams_spark.operators.similarity import emb_near_dup_binary

    return emb_near_dup_binary(
        _embs(spark, sf_dir), max_hamming=16, min_cosine=0.2, strategy="auto"
    )


def _q_knn_recall_hamming_multi(spark, sf_dir):
    # Mean-recall pre-flight over a probe sample (0, 7, 23) — the
    # production form of the recall gate; per-query rows keep the
    # variance visible.
    from kafka_streams_spark.operators.similarity import knn_recall_audit_batch

    return knn_recall_audit_batch(
        _embs(spark, sf_dir), [0, 7, 23], k=10, method="hamming", shortlist=100
    )


def _q_ivf_centroids_int(spark, sf_dir):
    # Exact integer cell centroids (java-round scaled-int means) — the
    # deterministic half of residual IVF-PQ, exploded to scalar rows
    # (array outputs are a driver canonicalizer trap).
    from kafka_streams_spark.operators.similarity import cell_centroids_int

    c = cell_centroids_int(_embs(spark, sf_dir))
    return c.select(
        "label", F.posexplode("cent").alias("pos", "cm")
    ).select("label", F.col("pos").cast("int").alias("pos"), "cm")


def _q_knn_ivfpq_res_vec0(spark, sf_dir):
    """Rows-only (learned residual codebooks — the knn_pq_vec0 class;
    residual books have no deterministic twin because any
    data-independent residual grouping has ~zero mean): the FAISS
    residual IVF-PQ composition at the knn_ivfpq_vec0 config. The
    deterministic halves (integer centroids, probe selection, exact
    re-rank) are oracle-covered by ivf_centroids_int/knn_ivfpq_vec0;
    lossless-reduction and fidelity pins live in tests; recall@10 >= 3
    at this config (>= 5 at probe 4, monotone in probes) is
    floor-asserted in tests/test_learned_floors.py."""
    from kafka_streams_spark.operators.similarity import (
        ivfpq_residual_topk_to_id,
        pq_train_residual_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_train_residual_codebooks(embs, m=4, k=8)
    return ivfpq_residual_topk_to_id(
        embs, books, query_id=0, k=10, n_probe=2, shortlist=100
    )


def _q_knn_recall_ivfpq_res_vec0(spark, sf_dir):
    """Rows-only (learned residual books): recall@10 of the residual
    IVF-PQ path at n_probe=4 — measured 3/6/7 of 10 at probes 2/4/8 on
    this corpus, i.e. probe-limited exactly like the raw path; the
    audit row makes that visible next to the other four paths."""
    from kafka_streams_spark.operators.similarity import (
        knn_recall_audit,
        pq_train_residual_codebooks,
    )

    embs = _embs(spark, sf_dir)
    books = pq_train_residual_codebooks(embs, m=4, k=8)
    return knn_recall_audit(
        embs, query_id=0, k=10, method="ivfpq_res",
        codebooks=books, n_probe=4, shortlist=100,
    )


def _q_knn_hamming_batch(spark, sf_dir):
    # Batched form of the hamming path (the eval/recommendation shape):
    # 3 probe queries in one signature-table pass.
    from kafka_streams_spark.operators.similarity import knn_hamming_batch_to_ids

    return knn_hamming_batch_to_ids(
        _embs(spark, sf_dir), [0, 7, 23], k=10, shortlist=100
    )


def _q_hamming_bucket_stats(spark, sf_dir):
    # Pre-flight for the binary near-dup radius: exact candidate-pair
    # pricing of the r=16 pigeonhole the emb_near_dup_hamming contract
    # runs (the lsh_bucket_stats role for the hamming family).
    from kafka_streams_spark.operators.dedup import hamming_bucket_stats
    from kafka_streams_spark.operators.similarity import binarize_embeddings

    sigs = binarize_embeddings(_embs(spark, sf_dir))
    return hamming_bucket_stats(sigs, "bsig", 60, 16)


def _q_bpe_pair_counts(spark, sf_dir):
    # Oracle-checked half of BPE training: the weighted adjacent-pair
    # statistic each merge round maximizes, over the top-1000 word table.
    from kafka_streams_spark.operators.tokenizer import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_words=1000, top_pairs=20)


def _q_bpe_token_stats(spark, sf_dir):
    """Oracle-checked since r8 (was rows-only): train 50 merges on the
    corpus's own top-1000 words, encode every doc, report per-doc token
    budget + fertility. The oracle retrains with a recursive-CTE twin
    of train_bpe_reference and re-encodes with sequential merge
    replaces — a cross-ALGORITHM check against this side's merge-rank
    walk (oracles._bpe_cte)."""
    from kafka_streams_spark.operators.tokenizer import bpe_token_stats, bpe_train

    merges = bpe_train(_docs(spark, sf_dir), n_merges=50, top_words=1000)
    return bpe_token_stats(_docs(spark, sf_dir), merges)


def _q_bpe_piece_counts(spark, sf_dir):
    """Oracle-checked since r8 (same trained merges, same recursive-CTE
    oracle): corpus piece-frequency top-30 — the what-did-my-vocab-learn
    audit."""
    from kafka_streams_spark.operators.tokenizer import bpe_piece_counts, bpe_train

    merges = bpe_train(_docs(spark, sf_dir), n_merges=50, top_words=1000)
    return bpe_piece_counts(_docs(spark, sf_dir), merges, top_pieces=30)


def _q_length_quantiles_by_source(spark, sf_dir):
    # Per-stratum quantiles off the stratified sketch: p50/p90/p99 doc
    # length per source from one sketch scan.
    from kafka_streams_spark.operators.profiling import (
        histogram_quantiles_by_group,
        value_histogram,
    )

    docs = _docs(spark, sf_dir).select(
        "source", F.length("text").cast("double").alias("n_chars")
    )
    h = value_histogram(
        docs, "n_chars", bin_width_cents=6400, group_cols=["source"]
    )
    return histogram_quantiles_by_group(
        h, [0.5, 0.9, 0.99], ["source"], bin_width_cents=6400
    )


def _q_compression_ratio(spark, sf_dir):
    """Rows-only, and necessarily so: the statistic IS the byte length
    of the zlib level-6 DEFLATE stream, and DuckDB 1.0 exposes no
    compression function in SQL (verified against duckdb_functions();
    the only __internal_compress_* entries are storage codecs, not
    callable on values) — unlike the BPE pair, no recursive-CTE twin
    can exist because DEFLATE's LZ77 window + Huffman coding is not
    expressible in its SQL. Deterministic per input at a fixed level;
    direct-zlib equality and the repetitive-vs-random ordering are
    test-pinned."""
    from kafka_streams_spark.operators.text import compression_ratio

    return compression_ratio(_docs(spark, sf_dir))


def _q_length_histogram_by_source(spark, sf_dir):
    # Stratified histogram sketch: per-source doc-length distributions
    # on a shared 64-char grid, one shuffle for every stratum.
    from kafka_streams_spark.operators.profiling import value_histogram

    docs = _docs(spark, sf_dir).select(
        "source", F.length("text").cast("double").alias("n_chars")
    )
    return value_histogram(
        docs, "n_chars", bin_width_cents=6400, scale=100, group_cols=["source"]
    )


def _q_collocations(spark, sf_dir):
    # PMI collocation mining over adjacent bigrams (Church & Hanks 1990)
    # — ranked on rounded pmi so the top-k cut is engine-reproducible.
    from kafka_streams_spark.operators.text import collocations

    return collocations(_docs(spark, sf_dir), top_k=20, min_count=5)


def _q_readability(spark, sf_dir):
    # Flesch reading ease, map-only heuristics (vowel-group syllables,
    # terminal-punctuation sentences).
    from kafka_streams_spark.operators.text import readability_scores

    return readability_scores(_docs(spark, sf_dir))


def _q_remove_boilerplate(spark, sf_dir):
    # Frequency-threshold line stripping; on the single-line synthetic
    # corpus this fires only on exact-duplicate texts (8 at sf0.1, none
    # at sf0.01), so the sf0.01 gate is a bit-exact reconstruction
    # identity and the crafted tests pin the firing behavior.
    from kafka_streams_spark.operators.text import remove_boilerplate

    return remove_boilerplate(_docs(spark, sf_dir), min_docs=2)


def _q_price_histogram(spark, sf_dir):
    # Mergeable fixed-bin distribution sketch (the quantile-family
    # sketch next to HLL++/CMS): one map-side-combined shuffle of
    # ≤ range/bin_width rows; deterministic int-grid bucketing keeps it
    # oracle-checkable unlike KLL/GK internals.
    from kafka_streams_spark.operators.profiling import value_histogram
    from kafka_streams_spark.sources.testdata import load_table

    return value_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", bin_width_cents=1_000_000
    )


def _q_price_quantiles_hist(spark, sf_dir):
    # Quantiles read off the histogram sketch — the constant-state
    # estimate that sits next to the exact `price_quantiles` contract
    # (estimate error ≤ one bin by construction).
    from kafka_streams_spark.operators.profiling import (
        histogram_quantiles,
        value_histogram,
    )

    from kafka_streams_spark.sources.testdata import load_table

    h = value_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", bin_width_cents=1_000_000
    )
    return histogram_quantiles(h, [0.25, 0.5, 0.75, 0.9, 0.99], bin_width_cents=1_000_000)


def _q_price_rank_sketch(spark, sf_dir):
    """Mergeable bottom-k rank sketch over an UNBOUNDED value range
    (profiling.py rank_sketch) — the KMV/theta-family companion to the
    fixed-grid price_histogram: k+1 rows of state with no range guess,
    deterministic (md5-selected sample), hence fully oracle-checked
    where KLL/GK internals could only be rows-only."""
    from kafka_streams_spark.operators.profiling import rank_sketch
    from kafka_streams_spark.sources.testdata import load_table

    return rank_sketch(
        load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", k=256
    )


def _q_price_rank_quantiles(spark, sf_dir):
    """Quantiles read off the bottom-k rank sketch — sampling-bound
    estimates (O(n/sqrt k) rank error) vs price_quantiles_hist's
    one-bin-width bound; the pair shows the range-free/range-gridded
    trade side by side on the same column."""
    from kafka_streams_spark.operators.profiling import (
        rank_sketch,
        rank_sketch_quantiles,
    )
    from kafka_streams_spark.sources.testdata import load_table

    s = rank_sketch(
        load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", k=256
    )
    return rank_sketch_quantiles(s, [0.25, 0.5, 0.75, 0.9, 0.99])


def _q_knn_auto_vec0(spark, sf_dir):
    """Production ANN chooser (similarity.py knn_auto): walks the
    cost-ordered ladder, audits each path's recall@k, routes to the
    first meeting the target. Contract config pins ladder =
    (single, hamming) at target 0.8 so the DuckDB twin derives the SAME
    route from the same audit CTEs (single 4-5/10 fails, hamming 10/10
    passes → route 'hamming' on this corpus) — the dispatch decision
    itself is differentially checked, not just the chosen top-k."""
    from kafka_streams_spark.operators.similarity import knn_auto

    return knn_auto(
        _embs(spark, sf_dir), query_id=0, k=10, recall_target=0.8,
        ladder=("single", "hamming"),
    )


def _q_length_rank_sketch_by_source(spark, sf_dir):
    """Stratified bottom-k rank sketch (profiling.py
    rank_sketch_grouped): per-source doc-length sketch, <= k rows per
    stratum with no range grid — the rank-sketch family's analog of
    length_histogram_by_source. k=16 < docs-per-source at every SF, so the
    sample truncation is exercised at every scale."""
    from kafka_streams_spark.operators.profiling import rank_sketch_grouped

    docs = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    return rank_sketch_grouped(docs, "n_chars", "doc_id", ["source"], k=16)


def _q_length_rank_quantiles_by_source(spark, sf_dir):
    """Per-source quantiles read off the stratified rank sketch —
    sampling-bound estimates vs length_quantiles_by_source's
    one-bin-width bound, the range-free/range-gridded trade per
    stratum. All windows partitioned by source."""
    from kafka_streams_spark.operators.profiling import (
        rank_sketch_grouped,
        rank_sketch_grouped_quantiles,
    )

    docs = _docs(spark, sf_dir).withColumn("n_chars", F.length("text"))
    s = rank_sketch_grouped(docs, "n_chars", "doc_id", ["source"], k=16)
    return rank_sketch_grouped_quantiles(s, ["source"], [0.25, 0.5, 0.9, 0.99])


def _q_orders_customer_auto_join(spark, sf_dir):
    """The audit's consumer (r7 verdict item 7): auto_join routes
    orders x customer on the join_size_audit verdict (broadcast_b /
    broadcast_a / salted / shuffle, first match wins) and emits the
    chosen route as a column, so the dispatch decision itself is
    hash-checked — the DuckDB twin derives the route with the same CASE
    over the same audit aggregates. At the contract thresholds the
    customer side fits the broadcast budget, so both engines must
    derive 'broadcast_b'; the synthetic ring in tests/test_join_audit.py
    flips all four routes with shaped tables."""
    from kafka_streams_spark.operators.profiling import auto_join
    from kafka_streams_spark.sources.testdata import load_table

    return auto_join(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "o_custkey",
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        ),
        "c_custkey",
        broadcast_max_rows=1_000_000,
        skew_share=0.5,
    )


def _q_orders_lineitem_join_audit(spark, sf_dir):
    """Join pre-flight pricing audit (profiling.py join_size_audit):
    the EXACT inner-join cardinality of orders x lineitem on orderkey
    plus hot-key share, computed from per-key count profiles — one
    aggregated row per distinct key shuffles instead of the data. The
    join-family member of the audit convention (lsh_bucket_stats /
    hamming_bucket_stats): measure the shuffle before running it, and
    read off salt-vs-broadcast-vs-plain from the 1-row result."""
    from kafka_streams_spark.operators.profiling import join_size_audit
    from kafka_streams_spark.sources.testdata import load_table

    return join_size_audit(
        load_table(spark, sf_dir, "orders"),
        "o_orderkey",
        load_table(spark, sf_dir, "lineitem"),
        "l_orderkey",
    )


def _q_users_kmv_by_type(spark, sf_dir):
    """Deterministic KMV distinct-user estimate per event type
    (profiling.py distinct_kmv) — the oracle-CHECKED companion to the
    rows-only HLL++ `approx_users_by_type` contract: md5 bottom-k
    selection reproduces in DuckDB, so the estimate VALUES are
    differentially compared, not just row counts. k=64 puts the driver
    corpus (150 users/type at sf0.01) in the estimation branch and the
    event fuzz stream (25 users) in the exact branch."""
    from kafka_streams_spark.operators.profiling import distinct_kmv
    from kafka_streams_spark.sources.testdata import load_table

    return distinct_kmv(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"], k=64
    )


def _q_vocab_overlap_kmv(spark, sf_dir):
    """Constant-state KMV twin of the exact `corpus_overlap` contract,
    on the SAME md5-bucket corpus split: two k-row token-set sketches
    replace the full-outer join of the complete distinct-gram tables —
    the persist-once, compare-snapshots-in-O(k) form
    (profiling.py kmv_set_sketch / kmv_overlap). n=2 shingles because
    the driver corpus draws from a 31-word vocabulary — 916 distinct
    2-grams puts k=256 in the ESTIMATION branch at every scale, where
    unigrams would always take the exact-below-k path."""
    from kafka_streams_spark.operators.profiling import corpus_overlap_kmv

    docs = _docs(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return corpus_overlap_kmv(
        docs.filter(bucket < "80"), docs.filter(bucket >= "80"), n=2, k=256
    )


def _q_emb_whiten(spark, sf_dir):
    """PCA whitening — rows-only: the driver-side eigensolve is a
    learned step (IVF/PQ class); NumPy-model equality and the exact
    second-moment input are pinned in tests (emb_gram carries the
    oracle-checked half of the math), and the output's second moment is
    identity-asserted within 1e-3 (tests/test_learned_floors.py)."""
    from kafka_streams_spark.operators.similarity import whiten_embeddings

    return whiten_embeddings(_embs(spark, sf_dir))


# --------------------------------------------------------------------------
# contract entry points
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-account balances of the full payment topology
    over sf0.001 events."""
    return _q_balances(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST ~50 registered queries
# per round (each CORRECTNESS file contains exactly 50 rows), so
# registration order decides which queries get fresh driver evidence.
#
# Round 7 makes the ordering COMPUTED, not hand-curated (round-6
# verdict item 2): _evidence_order() reads every CORRECTNESS_r*.json
# next to this file at call time and orders
#   1. _CODE_CHANGED — contracts whose operator or oracle changed this
#      round (their old evidence certifies code that no longer exists),
#   2. strays — registered names with no green driver row in any prior
#      round (new registrations land here automatically),
#   3. everything else, stalest newest-green round first,
# with registration position as the stable tiebreak. No hand-curation
# can starve a family: the window self-rotates as evidence accumulates.

# Contracts whose code or oracle changed in round 8: the rounded-rank
# alignment (r7 verdict item 2) — every single-query knn path now ranks
# on the ROUNDED 6-dp similarity with id tiebreak (the knn_batch
# contract), and all 14 oracle ORDER BYs rank on the identical rounded
# value. Old evidence certifies the raw-double ranking.
# _CODE_CHANGED_ROUND is the round these changes landed in: a name
# re-greened by the driver at or after it has evidence for the NEW
# code and self-drains from the head (see _evidence_order).
_CODE_CHANGED_ROUND = 15
_CODE_CHANGED: list[str] = [
    # Carried from r14 (the only r14 _CODE_CHANGED name the r14 driver
    # window did NOT re-green — every other r14 name got a green r14
    # row and self-drained): knn_recall_audit's exact leg routes
    # through knn_to_id, whose plan gained the r14 spread() floor.
    # (knn_recall_hamming_multi is genuinely unaffected: its hamming
    # path builds the exact leg inline.)
    "knn_recall_hamming_vec0",
    # r15 OPTIMIZATION round: operator code changed — all
    # oracle-verified hash-identical at sf0.001 AND sf0.01 locally
    # (OPTIMIZATION_r15.md), but the old driver rows certify plans
    # that no longer exist. Kept deliberately MINIMAL (r14 verdict
    # item 8) so the stale-evidence drain finally proceeds:
    # spread()+pinned-verify in embedding_near_duplicates →
    "emb_near_dup_lsh",
    "dedup_clusters_lsh",
    # spread() on the CMS token pass →
    "cms_sketch",
    "cms_estimates",
    # spread() on the existing-side digest pass →
    "dedup_spans_incremental",
    # PPJoin positional filter + pinned window width in the prefix form →
    "dedup_ngram_jaccard",
    "dedup_token_jaccard_prefix",
    # scan-size dispatch (holistic below 2M rows — plan unchanged at
    # bench scale — rank-based grouped_exact_percentiles above) →
    "price_quantiles",
    # fused three-dimension rank ladders →
    "rfm_scores",
]

# Kept for tool compatibility (freshness_lint): with the computed
# ordering, new registrations are strays and take the head
# automatically, so the queue stays empty.
_NEXT_ROUND_QUEUE: list[str] = []


def _is_green(row: dict) -> bool:
    """THE green-evidence predicate — a driver row certifies a contract
    iff it hash-checked, or it is a declared rows-only check that
    produced rows. Single definition: tools/next_round_order.py and
    tools/freshness_lint.py import this, so the driver ordering and the
    lints can never drift on what counts as green."""
    return row.get("hash_match") is True or (
        row.get("err") == "no_oracle" and row.get("spark_rows") is not None
    )


def _newest_green_rounds(root=None) -> dict[str, int]:
    """name -> newest round with a green driver row, parsed from every
    CORRECTNESS_r*.json next to this file (shared by the evidence
    ordering and the lint tools)."""
    import json as _json
    from pathlib import Path as _Path

    newest: dict[str, int] = {}
    root = _Path(root) if root else _Path(__file__).resolve().parent
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = _json.loads(f.read_text())
        except (OSError, _json.JSONDecodeError):
            continue
        rnd = int(f.stem.rsplit("r", 1)[-1])
        for n, row in data.items():
            if _is_green(row):
                newest[n] = max(newest.get(n, 0), rnd)
    return newest


# The driver's per-round evidence window size — exported so
# tools/freshness_lint.py and tools/next_round_order.py share ONE
# definition with the ordering policy (r7 review wave 6).
EVIDENCE_WINDOW = 50


def _latest_record_round(root=None) -> int:
    """Newest round with a CORRECTNESS record next to this file (0 if
    none) — parsed from filenames only."""
    from pathlib import Path as _Path

    root = _Path(root) if root else _Path(__file__).resolve().parent
    rounds = [
        int(f.stem.rsplit("r", 1)[-1]) for f in root.glob("CORRECTNESS_r*.json")
    ]
    return max(rounds, default=0)


def _evidence_order(names: list[str]) -> list[str]:
    """Order contract names for driver-evidence priority, computed from
    the newest green driver row per name across all CORRECTNESS_r*.json
    records (green = _is_green). See the module comment for the
    policy.

    A _CODE_CHANGED name SELF-DRAINS from the head once the driver has
    re-greened it AT OR AFTER the round the changes landed in
    (_CODE_CHANGED_ROUND): that evidence certifies the new code, so
    re-pinning it would waste head slots every subsequent round while
    the stale tail starves (r7 review wave 6). Until the list is
    pruned, a drained name simply sorts as freshly-evidenced."""
    newest = _newest_green_rounds()
    pos = {n: i for i, n in enumerate(names)}
    head = [
        n
        for n in _CODE_CHANGED
        if n in pos and newest.get(n, -1) < _CODE_CHANGED_ROUND
    ]
    rest = sorted(
        (n for n in names if n not in head),
        key=lambda n: (newest.get(n, -1), pos[n]),
    )
    return head + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_streams_spark.operators import analytics as A

    qs = {
        # -- round-1 hash-red, outputs now integer-scaled (oracles.py) --
        "q1_pricing_summary": A.q1_pricing_summary,
        "top_orders_per_customer": A.top_orders_per_customer,
        "events_hourly": A.events_hourly,
        "events_hopping": A.events_hopping,
        "orders_enriched": A.orders_enriched,
        "q10_returned_revenue": A.q10_returned_revenue,
        "q18_large_orders": A.q18_large_orders,
        "q2_cheapest_supplier": A.q2_cheapest_supplier,
        "q8_market_share": A.q8_market_share,
        "q9_profit_by_nation_year": A.q9_profit_by_nation_year,
        "q11_important_parts": A.q11_important_parts,
        "q20_heavy_suppliers": A.q20_heavy_suppliers,
        # -- unchecked in round 1: SQL surface --
        "sql_balances": _q_sql_balances,
        # -- unchecked in round 1: text analysis --
        "doc_stats": _q_doc_stats,
        "quality_score": _q_quality,
        "lm_unigram_score": _q_lm_unigram,  # new r04: perplexity-proxy gate
        "dsir_logratio": _q_dsir_logratio,  # new r04: importance-resampling weights
        "lm_bigram_score": _q_lm_bigram,  # new r04: order-aware LM gate
        "bm25_search": _q_bm25_search,  # new r04: Okapi BM25 keyword ranking
        "dedup_lines": _q_dedup_lines,  # new r04: C4-style line dedup
        "gopher_quality": _q_gopher_quality,  # new r04: Gopher rule gate
        "c4_clean": _q_c4_clean,  # new r04: C4 line/doc cleaning
        "cms_sketch": _q_cms_sketch,  # new r04: count-min sketch table
        "cms_estimates": _q_cms_estimates,  # new r04: CMS point estimates
        "semdedup": _q_semdedup,  # new r04: semantic dedup survivors
        "minhash_jaccard_est": _q_minhash_jaccard_est,  # new r04: estimator audit
        "hashed_bow": _q_hashed_bow,  # new r04: feature-hashing embedding
        "zipf_fit": _q_zipf_fit,  # new r04: corpus Zipf slope
        "token_budget_mix": _q_token_budget_mix,  # new r04: mixture-to-budget
        "split_sentences": _q_split_sentences,  # new r04: sentence primitive
        "ccnet_buckets": _q_ccnet_buckets,  # new r04: perplexity terciles
        "weighted_jaccard": _q_weighted_jaccard,  # new r04: idf-weighted pairs
        "posting_pair_stats": _q_posting_pair_stats,  # r8: pair-join pre-flight
        "max_df_for_budget": _q_max_df_for_budget,  # r9: cap sizing read-off
        "stop_band_cap": _q_stop_band_cap,  # r10: banded-join pricing audit
        "weighted_jaccard_capped": _q_weighted_jaccard_capped,  # r8: stop-shingle form
        "knn_text_vec0": _q_knn_text_vec0,  # new r04: text→similarity bridge
        "language_id": _q_language_id,
        "fingerprint": _q_fingerprint,
        "top_tokens": _q_top_tokens,
        "doc_length_buckets": _q_doc_length_buckets,
        "repetition_stats": _q_repetition_stats,
        "pii_scan": _q_pii_scan,
        "tf_idf_top_terms": _q_tf_idf,
        "domain_stats": _q_domain_stats,
        # -- unchecked in round 1: curation pipelines --
        "curate_corpus": _q_curate_corpus,
        "curate_corpus_fuzzy": _q_curate_fuzzy,  # near-dup clusters + gates
        "decontaminate": _q_decontaminate,  # eval-set n-gram leak guard
        # -- unchecked in round 1: dedup --
        "dedup_exact": _q_dedup_exact,
        "dedup_exact_rows": _q_dedup_exact_rows,
        "dedup_token_jaccard": _q_token_jaccard,
        "dedup_token_jaccard_prefix": _q_token_jaccard_prefix,
        "containment_pairs": _q_containment_pairs,  # new r04: asymmetric near-dup
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,  # iterative CC, recursive-CTE oracle
        # -- unchecked in round 1: similarity / embeddings --
        "knn_vec0": _q_knn_vec0,
        "emb_label_centroids": _q_label_centroids,
        "emb_normalize": _q_normalize_vectors,
        "emb_quantize_int8": _q_quantize,
        "emb_quantize_sym": _q_quantize_sym,
        "emb_near_dup_exact": _q_emb_near_dup,
        # -- unchecked in round 1: sampling / sharding / chunking --
        "hash_sample_docs": _q_hash_sample,
        "temperature_mix_docs": _q_temperature_mix,
        "stratified_sample_docs": _q_stratified_sample,
        "upsample_epochs_docs": _q_upsample_epochs,
        "shuffle_shards_docs": _q_shuffle_shards,
        "ngram_counts": _q_ngram_counts,
        "knn_batch": _q_knn_batch,
        "pii_redact": _q_pii_redact,
        "dedup_incremental": _q_dedup_incremental,
        "dedup_incremental_bloom": _q_dedup_incremental_bloom,
        "dedup_incremental_fuzzy": _q_dedup_incremental_fuzzy,
        "dedup_incremental_fuzzy_indexed": _q_dedup_incremental_fuzzy_indexed,
        "reservoir_sample_docs": _q_reservoir_sample,
        "assign_splits_docs": _q_assign_splits,
        "cap_per_source": _q_cap_per_source,  # r9: per-domain cap
        "leakage_safe_splits_docs": _q_leakage_safe_splits,  # r9: eval integrity
        "leakage_safe_splits_incr": _q_leakage_safe_splits_incremental,  # r9
        "corpus_drift": _q_corpus_drift,
        "length_outliers": _q_length_outliers,
        "quality_calibrated": _q_quality_calibrated,
        "emb_truncate": _q_emb_truncate,
        "curate_increment": _q_curate_increment,
        "substring_overlap_pairs": _q_substring_overlap,
        "pack_sequences": _q_pack_sequences,
        "normalize_text": _q_normalize_text,
        "decontaminate_exact": _q_decontaminate_exact,
        "decontaminate_emb": _q_decontaminate_emb,
        "corpus_stats": _q_corpus_stats,
        "chunk_documents": _q_chunk_documents,
        "chunk_dup_stats": _q_chunk_dup_stats,
        "pack_token_shards": _q_pack_shards,
        # -- unchecked in round 1: interval join + profiling --
        "events_attribution": _q_events_attribution,
        "profile_documents": _q_profile_documents,
        # -- unchecked in round 1: multimodal (deterministic fake codec) --
        "media_image_features": _q_media_features,
        "media_audio_features": _q_media_audio_features,
        "media_resize": _q_media_resize,
        "media_video_frames": _q_media_frames,
        # -- the 100 TB dedup composition end-to-end --
        "dedup_clusters_lsh": _q_dedup_clusters_lsh,  # oracle-checked r04
        # -- sketch/LSH family: every DETERMINISTIC pipeline is
        # oracle-checked as of r04 (md5-derived hashes / literal seed-42
        # hyperplanes reproduced in DuckDB); only the genuinely
        # non-reproducible ops remain rows-only --
        "dedup_minhash_lsh": _q_minhash_nd,  # md5_32 contract: oracle-checked
        "dedup_simhash": _q_simhash_nd,  # md5_60 contract: oracle-checked
        "knn_lsh_vec0": _q_knn_lsh_vec0,  # literal-plane probes: oracle-checked
        "knn_ivf_vec0": _q_knn_ivf_vec0,  # learned KMeans index: rows-only
        "knn_ivf_label_vec0": _q_knn_ivf_label_vec0,  # label-cell IVF: oracle-checked
        "winnowing_fingerprints": _q_winnowing,  # md5_60 contract: oracle-checked
        "emb_near_dup_lsh": _q_emb_near_dup_lsh,  # oracle-checked r04
        "profile_documents_approx": _q_profile_documents_approx,  # HLL++: rows-only
        "approx_users_by_type": A.approx_users_by_type,  # HLL++ sketch: rows-only
        # -- driver-green in CORRECTNESS_r01: payment topology parity --
        "payments_source": _payments,
        "payments_filter_rails": _q_filter_rails,
        "payments_branch_gbp": _q_branch_gbp,
        "payments_branch_usd": _q_branch_usd,
        "payments_fx_convert": _q_fx_convert,
        "payments_merged": _merged,
        "payments_rails_foo": _q_rails_foo,
        "payments_rails_bar": _q_rails_bar,
        "payments_balances": _q_balances,
        # -- driver-green in CORRECTNESS_r01: relational analytics --
        "q3_shipping_priority": A.q3_shipping_priority,
        "q5_regional_revenue": A.q5_regional_revenue,
        "order_count_by_status": A.order_count_by_status,
        "sessionize_events": A.sessionize_events,
        "distinct_users_by_type": A.distinct_users_by_type,
        "q6_forecast_revenue": A.q6_forecast_revenue,
        "rollup_orders": A.rollup_orders,
        "cube_events": A.cube_events,
        "customers_with_orders": A.customers_with_orders,
        "customers_without_orders": A.customers_without_orders,
        "price_quantiles": A.price_quantiles,
        "asof_purchase_click": _q_asof_purchase_click,
        "pivot_events": _q_pivot_events,
        "q4_order_priority": A.q4_order_priority,
        "q14_promo_revenue": A.q14_promo_revenue,
        "daily_revenue_window": A.daily_revenue_window,
        # TPC-H remainder, adapted to the no-partsupp testdata schema
        "q7_volume_shipping": A.q7_volume_shipping,
        "q12_ship_delay": A.q12_ship_delay,
        "q13_customer_distribution": A.q13_customer_distribution,
        "q15_top_supplier": A.q15_top_supplier,
        "q16_part_variety": A.q16_part_variety,
        "q17_small_quantity_revenue": A.q17_small_quantity_revenue,
        "q19_discounted_revenue": A.q19_discounted_revenue,
        "q21_waiting_suppliers": A.q21_waiting_suppliers,
        "q22_prospect_customers": A.q22_prospect_customers,
        # event-sequence analytics
        "funnel_conversions": A.funnel_conversions,
        "cohort_retention": A.cohort_retention,
        # DSL facade, same oracle as payments_balances
        "dsl_balances": _q_dsl_balances,
        "dsl_count": _q_dsl_count,  # r10: §2.4 count via the facade
        "dsl_reduce": _q_dsl_reduce,  # r10: §2.4 reduce via the facade
        "dsl_windowed_count": _q_dsl_windowed_count,  # r10: §2.4 windowed agg
        # -- r4-late contracts (evidence-priority head of round 5) --
        "ngram_novelty": _q_ngram_novelty,
        "corpus_overlap": _q_corpus_overlap,
        "contamination_report": _q_contamination_report,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "dedup_keep_best": _q_dedup_keep_best,  # quality-argmax survivorship
        "gate_agreement": _q_gate_agreement,
        "dedup_spans": _q_dedup_spans,
        "event_transitions": A.event_transitions,
        "rfm_scores": A.rfm_scores,
        "language_confusion": _q_language_confusion,
        "shard_skew_report": _q_shard_skew,
        "lsh_bucket_stats": _q_lsh_bucket_stats,
        "media_dedup": _q_media_dedup,
        "emb_kcenter": _q_emb_kcenter,  # oracle-checked since r8 (CTE twin)
        "emb_kcenter_scalable": _q_emb_kcenter_scalable,  # r9 large-k form
        # -- round-5 additions (behind the window; queued for round 6) --
        "dedup_spans_incremental": _q_dedup_spans_incremental,
        "events_props_profile": A.events_props_profile,
        "knn_pq_label_vec0": _q_knn_pq_label_vec0,
        "knn_pq_rerank_vec0": _q_knn_pq_rerank_vec0,
        "knn_pq_vec0": _q_knn_pq_vec0,  # rows-only: learned codebooks
        # -- round-6 additions --
        "events_session_native": _q_events_session_native,
        "oov_rate": _q_oov_rate,
        "dedup_normalized": _q_dedup_normalized,
        "emb_gram": _q_emb_gram,
        "emb_whiten": _q_emb_whiten,  # rows-only: learned eigenbasis
        "emb_norm_outliers": _q_emb_norm_outliers,
        "emb_drift": _q_emb_drift,
        "knn_recall_vec0": _q_knn_recall_vec0,
        "knn_lsh_mt_vec0": _q_knn_lsh_mt_vec0,
        "knn_recall_mt_vec0": _q_knn_recall_mt_vec0,
        "knn_ivfpq_vec0": _q_knn_ivfpq_vec0,
        "pq_error_vec0": _q_pq_error_vec0,
        "badword_filter": _q_badword_filter,
        "emb_profile": _q_emb_profile,
        "events_rate_anomaly": _q_events_rate_anomaly,
        "corpus_diff": _q_corpus_diff,
        "corpus_scorecard": _q_corpus_scorecard,
        "events_dead_hours": _q_events_dead_hours,
        "knn_recall_ivfpq_vec0": _q_knn_recall_ivfpq_vec0,
        "media_near_dup": _q_media_near_dup,
        "remove_boilerplate": _q_remove_boilerplate,
        "collocations": _q_collocations,
        "length_histogram_by_source": _q_length_histogram_by_source,
        "compression_ratio": _q_compression_ratio,
        "length_quantiles_by_source": _q_length_quantiles_by_source,
        "readability": _q_readability,
        "emb_binarize": _q_emb_binarize,
        "knn_hamming_vec0": _q_knn_hamming_vec0,
        "knn_recall_hamming_vec0": _q_knn_recall_hamming_vec0,
        "emb_near_dup_hamming": _q_emb_near_dup_hamming,
        "hamming_bucket_stats": _q_hamming_bucket_stats,
        "knn_recall_hamming_multi": _q_knn_recall_hamming_multi,
        "knn_hamming_batch": _q_knn_hamming_batch,
        "ivf_centroids_int": _q_ivf_centroids_int,
        "knn_ivfpq_res_vec0": _q_knn_ivfpq_res_vec0,
        "knn_recall_ivfpq_res_vec0": _q_knn_recall_ivfpq_res_vec0,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "bpe_token_stats": _q_bpe_token_stats,
        "bpe_piece_counts": _q_bpe_piece_counts,
        "price_histogram": _q_price_histogram,
        "price_quantiles_hist": _q_price_quantiles_hist,
        # -- round-7 additions --
        "knn_auto_vec0": _q_knn_auto_vec0,
        "price_rank_sketch": _q_price_rank_sketch,
        "price_rank_quantiles": _q_price_rank_quantiles,
        "orders_lineitem_join_audit": _q_orders_lineitem_join_audit,
        "orders_customer_auto_join": _q_orders_customer_auto_join,
        "length_rank_sketch_by_source": _q_length_rank_sketch_by_source,
        "length_rank_quantiles_by_source": _q_length_rank_quantiles_by_source,
        "users_kmv_by_type": _q_users_kmv_by_type,
        "vocab_overlap_kmv": _q_vocab_overlap_kmv,
    }
    # Evidence-priority reorder, computed from the driver's own
    # CORRECTNESS record (see _evidence_order).
    return {n: qs[n] for n in _evidence_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    from kafka_streams_spark.oracles import ALL_ORACLES

    return dict(ALL_ORACLES)
