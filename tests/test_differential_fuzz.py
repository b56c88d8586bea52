"""Differential fuzzing of the oracle contracts on a SYNTHETIC corpus
where the interesting paths actually fire.

The driver's gate runs every oracle at sf0.01, but that corpus is
single-line word soup with no duplicate texts — so contracts like
remove_boilerplate and dedup_lines are verified there only on their
identity path. This test rebuilds a documents table with injected
boilerplate lines, exact-duplicate docs, multi-line texts, blank lines,
empty docs and a little safe unicode, then replays the SAME
queries-vs-oracle comparison (the check_oracle canonicalizer) against
it — cross-engine agreement where removal/dedup/reassembly really
happen.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# contracts whose oracles only touch `documents` and whose interesting
# behavior the driver corpus cannot reach
FUZZ_QUERIES = [
    "remove_boilerplate",
    "dedup_lines",
    "dedup_exact",
    "dedup_normalized",
    "doc_stats",
    "top_tokens",
    "bpe_pair_counts",
    "bpe_token_stats",
    "bpe_piece_counts",
    "ngram_novelty",
    # second ring: sampling / fingerprint / quality contracts whose
    # oracles touch only `documents`
    "hash_sample_docs",
    "assign_splits_docs",
    # r9: per-domain cap (md5-rank winners) and the leakage-safe split
    # composition (banding -> CC -> split CASE) on a different corpus
    "cap_per_source",
    "leakage_safe_splits_docs",
    "leakage_safe_splits_incr",
    "stratified_sample_docs",
    "reservoir_sample_docs",
    "doc_length_buckets",
    "language_id",
    "quality_score",
    "fingerprint",
    "normalize_text",
    "winnowing_fingerprints",
    "dedup_simhash",
    "lm_unigram_score",
    "zipf_fit",
    "split_sentences",
    "corpus_stats",
    "ngram_counts",
    # third ring: gates, LM scores, sketches, mixes, packing, dedup
    "gopher_quality",
    "c4_clean",
    "badword_filter",
    "corpus_scorecard",
    "length_outliers",
    "quality_calibrated",
    "oov_rate",
    "lm_bigram_score",
    "bm25_search",
    "dsir_logratio",
    "cms_sketch",
    "cms_estimates",
    "hashed_bow",
    "corpus_drift",
    "language_confusion",
    "dedup_token_jaccard",
    "containment_pairs",
    "minhash_jaccard_est",
    "dedup_minhash_lsh",
    "substring_overlap_pairs",
    "dedup_spans",
    "token_budget_mix",
    "pack_sequences",
    "pack_token_shards",
    "shard_skew_report",
    "temperature_mix_docs",
    "upsample_epochs_docs",
    "shuffle_shards_docs",
    "chunk_documents",
    "chunk_dup_stats",
    "ccnet_buckets",
    "tf_idf_top_terms",
    "repetition_stats",
    "pii_scan",
    "decontaminate_exact",
    "ngram_novelty",
    "collocations",
    "readability",
    "length_histogram_by_source",
    "length_quantiles_by_source",
    # fourth ring (r7 co-registration sweep): every remaining
    # documents-only oracle joins the firing corpus
    "contamination_report",
    "corpus_diff",
    "corpus_overlap",
    "curate_corpus",
    "curate_corpus_fuzzy",
    "curate_increment",
    # r14: quality-aware duplicate survivorship (documents-only oracle)
    "dedup_keep_best",
    "decontaminate",
    "dedup_exact_rows",
    "dedup_incremental",
    "dedup_incremental_bloom",
    "dedup_incremental_fuzzy",
    # the indexed twin must agree with the same oracle on fuzzed corpora
    # too — this also exercises the per-sf_dir index build/reuse path
    "dedup_incremental_fuzzy_indexed",
    "dedup_ngram_jaccard",
    "dedup_spans_incremental",
    "dedup_token_jaccard_prefix",
    "domain_stats",
    "gate_agreement",
    "knn_text_vec0",
    "pii_redact",
    "profile_documents",
    "weighted_jaccard",
    "weighted_jaccard_capped",
    "posting_pair_stats",
    # r9: cap sizing — fuzz corpus has NULL-source docs, exercising the
    # NULL-block 0-pair pricing inside the histogram cumulative sum
    "max_df_for_budget",
    # r10: banded-join pricing audit — same histogram/lead read-off
    # shape over band occupancy; fuzz id range exercises the md5 split
    "stop_band_cap",
    # fifth ring (r7 KMV wave): the deterministic-sketch overlap twin
    "vocab_overlap_kmv",
    # r7: stratified rank sketch — NULL texts and per-source strata of
    # varying size exercise the per-group clamp and count rows
    "length_rank_sketch_by_source",
    "length_rank_quantiles_by_source",
]

# Contracts that legitimately sit outside every ring, with the reason
# the lint (tools/fuzz_ring_lint.py) accepts them:
FUZZ_EXEMPT = {
    # rows-only — no oracle to differentially compare (learned steps,
    # sketches, sequential algorithms; the driver's rows-only check and
    # their model-pinned unit tests are the gate)
    # the two HLL++ registers additionally assert the estimate sits
    # within 3·rsd of the oracle-checked exact twin (r9 —
    # test_hll_contracts_within_published_error_bound), so "rows-only"
    # here means no VALUE hash, not unchecked values
    "approx_users_by_type": "rows-only (HLL++ sketch; 3·rsd bound tested)",
    "profile_documents_approx": "rows-only (HLL++ sketch; 3·rsd bound tested)",
    "compression_ratio": "rows-only (zlib DEFLATE, no oracle)",
    "emb_whiten": "rows-only (learned eigenbasis, no oracle)",
    "knn_ivf_vec0": "rows-only (learned KMeans index, no oracle)",
    "knn_ivfpq_res_vec0": "rows-only (learned residual codebooks)",
    "knn_recall_ivfpq_res_vec0": "rows-only (learned residual codebooks)",
    "knn_pq_vec0": "rows-only (learned codebooks, no oracle)",
    # media family: inputs are synthesize_media()'s deterministic fake
    # payloads, mirrored literally in the oracle — there is no external
    # input surface to fuzz (the payload generator IS the contract)
    "media_image_features": "self-synthesized deterministic payloads",
    "media_audio_features": "self-synthesized deterministic payloads",
    "media_resize": "self-synthesized deterministic payloads",
    "media_video_frames": "self-synthesized deterministic payloads",
    "media_dedup": "self-synthesized deterministic payloads",
    "media_near_dup": "self-synthesized deterministic payloads",
    # registers catalog views over every table; the fuzz dirs
    # materialize single tables — covered by the driver corpus where
    # all ten tables exist (see PAYMENT_FUZZ_QUERIES note)
    "sql_balances": "needs all ten catalog tables (driver corpus covers)",
}

WORDS = [
    "spark", "join", "window", "hash", "merge", "scan", "sort", "café",
    "naïve", "token", "the", "a", "value", "row", "batch", "shard",
]
BOILER = [
    "cookie consent banner text",
    "copyright 2026 all rights reserved",
    "subscribe to our newsletter",
]


def _synth_corpus(rng: random.Random, n_docs: int) -> list[tuple[int, str, str, str, int]]:
    rows = []
    for d in range(n_docs):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            r = rng.random()
            if r < 0.25:
                lines.append(rng.choice(BOILER))
            elif r < 0.32:
                lines.append(rng.choice(["", "   ", "\t"]))
            else:
                lines.append(
                    " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8)))
                )
        # NULL text is in-contract (a valid JSONL row may carry
        # "text": null) — the Arrow ops' (text or "") convention and
        # the expression ops' NULL propagation must both mirror in the
        # oracles (three divergences found and fixed on introduction)
        text = None if rng.random() < 0.05 else "\n".join(lines)
        rows.append((d, text, "en", f"src{d % 3}", len(text or "")))
    # exact duplicate docs (same text, higher ids)
    for i, (d, text, lang, src, n) in enumerate(rows[: n_docs // 5]):
        rows.append((n_docs + i, text, lang, src, n))
    # guaranteed boilerplate firing, independent of rng drift: two docs
    # sharing a line (the firing sanity check rides on these)
    base = len(rows)
    for j in range(2):
        t = f"{BOILER[0]}\nunique tail {j}"
        rows.append((1000 + base + j, t, "en", "src0", len(t)))
    # r7 self-review: NULL source / NULL lang are realistic metadata
    # gaps (the events ring already fuzzes NULL user_id) — per-stratum
    # groupings, calibrations, and mixes must treat the NULL stratum
    # identically on both engines. NULL doc_id stays OUT of contract:
    # it is the primary key (the rfm_scores NULL-user precedent).
    rows.append((2000, "words from the common pool", None, None, 26))
    rows.append((2001, "the quick brown data fox", None, "src1", 24))
    rows.append((2002, None, "en", None, 0))
    # r8 divergence find: unicode whitespace (\xa0 nbsp,   thin
    # space) must NOT be a token boundary — Python str.split() split it,
    # Java \s+ / RE2 \s+ do not, and the Arrow closures used to
    # tokenize these docs differently from their expression/SQL twins.
    rows.append((2003, "spark\xa0join window merge", "en", "src0", 23))
    rows.append((2004, "hash scan sort batch value", "en", "src2", 26))
    # blank-line boundary: a \x0b-only line is BLANK (ASCII class), a
    # \xa0-only line is NOT — the repetition_stats dup-line rule must
    # agree cross-engine on both
    t = "merge sort\n\x0b\n\xa0\nmerge sort"
    rows.append((2005, t, "en", "src1", len(t)))
    return rows


@pytest.mark.parametrize("seed", [11, 42])
def test_oracles_agree_on_firing_corpus(spark, tmp_path, seed):
    import __spark_entry__ as e
    from tools.check_oracle import canon

    rng = random.Random(seed)
    rows = _synth_corpus(rng, 40)
    sf_dir = str(tmp_path / f"sf-fuzz-{seed}")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )

    qs, oracles = e.queries(), e.oracle_sql()
    # sanity: the corpus must actually FIRE the interesting paths
    fired = (
        qs["remove_boilerplate"](spark, sf_dir)
        .agg({"n_removed": "sum"})
        .collect()[0][0]
    )
    assert fired and fired > 0, "fuzz corpus failed to trigger boilerplate removal"

    for name in FUZZ_QUERIES:
        spark_pd = qs[name](spark, sf_dir).toPandas()
        duck_pd = con.execute(oracles[name]).fetchdf()
        assert len(spark_pd) == len(duck_pd), (name, len(spark_pd), len(duck_pd))
        assert sorted(spark_pd.columns) == sorted(duck_pd.columns), name
        a, b = canon(spark_pd), canon(duck_pd)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            raise AssertionError(
                f"{name}: {int(diff.sum())} rows differ; "
                f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
            )


PAYMENT_FUZZ_QUERIES = [
    "payments_source",
    "payments_filter_rails",
    "payments_branch_gbp",
    "payments_branch_usd",
    "payments_fx_convert",
    "payments_merged",
    "payments_balances",
    "payments_rails_foo",
    "payments_rails_bar",
    "dsl_balances",
    "dsl_count",
    "dsl_reduce",
    # sql_balances registers catalog views over every table and the fuzz
    # dir only materializes events; the SQL surface is covered by the
    # driver corpus where all tables exist
]

EVENT_FUZZ_QUERIES = [
    "events_hourly",
    # r10: same grain through the DSL windowed facade — NULL-ts events
    # exercise the null window group on both engines
    "dsl_windowed_count",
    "sessionize_events",
    "event_transitions",
    "events_rate_anomaly",
    "events_dead_hours",
    "events_props_profile",
    "funnel_conversions",
    "cohort_retention",
    "events_hopping",
    "events_session_native",
    "asof_purchase_click",
    "pivot_events",
    "distinct_users_by_type",
    # r7 co-registration sweep
    "cube_events",
    "events_attribution",
    "rfm_scores",
    # r7 KMV wave: NULL user_ids exercise the sketch's key filter; 25
    # users < k=64 exercises the exact branch (driver corpus covers the
    # estimation branch at 150 users/type)
    "users_kmv_by_type",
]


@pytest.mark.parametrize("seed", [5])
def test_event_oracles_agree_on_fuzz_stream(spark, tmp_path, seed):
    """Random event streams with ties, bursts, dead hours, and MALFORMED
    props JSON (the r5 advice case: the oracle's json_valid guard must
    reproduce from_json's quarantine instead of crashing DuckDB)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from tools.check_oracle import canon

    rng = random.Random(seed)
    types = ["view", "click", "purchase", "signup", "error"]
    props_pool = [
        '{"k": 7}', '{"k": 0}', '{"k": -3}',
        '{k: broken', 'not json at all', '', '{"other": 1}',
    ]
    rows = []
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    for i in range(600):
        user = rng.choice([None] + [rng.randint(1, 25)] * 19)
        # bursts + gaps: hour chosen from a skewed set, dead hours left empty
        hour = rng.choice([0, 1, 2, 5, 6, 7, 8, 30, 31, 50])
        us = base_us + hour * 3_600_000_000 + rng.randint(0, 3_599_999_999)
        if rng.random() < 0.05:
            us = rows[-1][1] if rows else us  # exact-tie timestamps
        rows.append(
            (
                i,
                us,
                user,
                rng.choice(types),
                # incl. negatives (refunds), half-cent boundaries, and
                # NULLs — floor(x*100 + 0.5) must agree cross-engine on
                # all of them, and NULL must propagate identically
                # through amounts, sums and group keys
                rng.choice(
                    [round(rng.uniform(-50.0, 400.0), 2), 1.005, -1.005, 2.675, None]
                ),
                rng.choice(props_pool) if rng.random() < 0.9 else None,
            )
        )
    # r7 review wave 4: NULL-ts events (corrupt-record class) — the
    # as-of join's phantom-match fix and every time-keyed grouping must
    # treat them identically to SQL on both engines
    rows.append((9000, None, 3, "click", 12.5, '{"k": 7}'))
    rows.append((9001, None, None, "purchase", None, None))
    rows.append((9002, None, 7, "view", 1.0, ""))
    sf_dir = str(tmp_path / f"ev-fuzz-{seed}")
    (
        spark.createDataFrame(
            rows, "event_id bigint, us bigint, user_id bigint, event_type string, value double, props string"
        )
        .select(
            "event_id",
            F.expr(
                "timestampadd(MICROSECOND, us, timestamp_ntz'1970-01-01 00:00:00')"
            ).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{sf_dir}/events.parquet")
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )

    qs, oracles = e.queries(), e.oracle_sql()
    for name in EVENT_FUZZ_QUERIES + PAYMENT_FUZZ_QUERIES:
        spark_pd = qs[name](spark, sf_dir).toPandas()
        duck_pd = con.execute(oracles[name]).fetchdf()
        assert len(spark_pd) == len(duck_pd), (name, len(spark_pd), len(duck_pd))
        assert sorted(spark_pd.columns) == sorted(duck_pd.columns), name
        a, b = canon(spark_pd), canon(duck_pd)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            raise AssertionError(
                f"{name}: {int(diff.sum())} rows differ; "
                f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
            )


EMB_FUZZ_QUERIES = [
    "emb_binarize",
    "knn_vec0",
    "knn_hamming_vec0",
    "emb_near_dup_hamming",
    "hamming_bucket_stats",
    "emb_gram",
    "emb_norm_outliers",
    "emb_label_centroids",
    "knn_batch",
    "knn_lsh_vec0",
    "knn_lsh_mt_vec0",
    "knn_recall_vec0",
    "knn_recall_mt_vec0",
    "knn_recall_hamming_vec0",
    "knn_recall_hamming_multi",
    "knn_hamming_batch",
    "ivf_centroids_int",
    "emb_near_dup_exact",
    "emb_near_dup_lsh",
    "lsh_bucket_stats",
    "semdedup",
    "emb_normalize",
    "emb_quantize_int8",
    "emb_quantize_sym",
    "emb_truncate",
    "emb_drift",
    "emb_profile",
    "knn_ivf_label_vec0",
    "knn_pq_label_vec0",
    "knn_pq_rerank_vec0",
    "knn_ivfpq_vec0",
    "pq_error_vec0",
    "knn_recall_ivfpq_vec0",
    "decontaminate_emb",
    # r7 co-registration sweep: the connected-components family's
    # contract wrappers read the embeddings table
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_cluster_sizes",
    # r7: ANN chooser — BOTH the dispatch decision and the routed
    # top-k must agree cross-engine on a corpus where the audits may
    # resolve differently than the driver corpus
    "knn_auto_vec0",
    # r8: k-center traversal — duplicated vectors create rounded-rank
    # ties the id tiebreak must resolve identically cross-engine
    "emb_kcenter",
    # r9: the two-stage blocked form — fuzz vectors exercise the block
    # hash, per-block ties, and the pool handoff on a different corpus
    "emb_kcenter_scalable",
]


@pytest.mark.parametrize("seed", [3])
def test_embedding_oracles_agree_on_fuzz_vectors(spark, tmp_path, seed):
    """Random embeddings with exact-zero components (the binarize
    boundary), duplicated vectors (rank ties), and clustered labels."""
    import __spark_entry__ as e
    from tools.check_oracle import canon

    rng = random.Random(seed)
    rows = []
    for i in range(120):
        vec = [
            0.0 if rng.random() < 0.08 else round(rng.uniform(-2, 2), 3)
            for _ in range(64)
        ]
        rows.append((i, vec, rng.randint(0, 4)))
    # exact duplicate vectors under new ids → hamming-0 pairs + rank ties
    for i in range(10):
        rows.append((120 + i, rows[i][1], rows[i][2]))
    sf_dir = str(tmp_path / f"emb-fuzz-{seed}")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )

    qs, oracles = e.queries(), e.oracle_sql()
    for name in EMB_FUZZ_QUERIES:
        spark_pd = qs[name](spark, sf_dir).toPandas()
        duck_pd = con.execute(oracles[name]).fetchdf()
        assert len(spark_pd) == len(duck_pd), (name, len(spark_pd), len(duck_pd))
        assert sorted(spark_pd.columns) == sorted(duck_pd.columns), name
        a, b = canon(spark_pd), canon(duck_pd)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            raise AssertionError(
                f"{name}: {int(diff.sum())} rows differ; "
                f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
            )


TPCH_FUZZ_QUERIES = [
    "q1_pricing_summary", "q2_cheapest_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_regional_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation_year",
    "q10_returned_revenue", "q11_important_parts", "q12_ship_delay",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_part_variety", "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q20_heavy_suppliers", "q21_waiting_suppliers",
    "q22_prospect_customers",
    "order_count_by_status", "rollup_orders", "customers_with_orders",
    "customers_without_orders", "top_orders_per_customer", "orders_enriched",
    "price_quantiles", "price_histogram", "price_quantiles_hist",
    # r7 co-registration sweep
    "daily_revenue_window",
    # r7: bottom-k rank sketch — hash-selected sample must agree on a
    # fuzzed orders table (NULL prices, negative totals, duplicates)
    "price_rank_sketch",
    "price_rank_quantiles",
    # r7: join pre-flight audit — NULL orderkeys and orders without
    # lineitems exercise the excluded-from-join-but-counted-in-rows rule
    "orders_lineitem_join_audit",
    # r8: the audit's router — NULL custkeys and zero-order customers
    # exercise the route CASE + join agreement (route FLIPPING across
    # table shapes is pinned in tests/test_join_audit.py)
    "orders_customer_auto_join",
]


@pytest.mark.parametrize("seed", [17])
def test_tpch_oracles_agree_on_fuzz_tables(spark, tmp_path, seed):
    """Coherent random TPC-H tables: zero-order customers (q13/q22),
    orders without lineitems (q4's EXISTS), boundary dates landing
    exactly on filter edges, price ties (q2/q15 argmin/argmax keep
    ties), zero discounts, negative balances."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from tools.check_oracle import canon

    rng = random.Random(seed)
    sf_dir = str(tmp_path / f"tpch-fuzz-{seed}")

    def write(name, rows, schema, date_cols=()):
        df = spark.createDataFrame(rows, schema)
        for c in date_cols:
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(DAY, {c}, timestamp_ntz'1990-01-01 00:00:00')"
                ),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")

    regions = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    )]
    write("region", regions, "r_regionkey bigint, r_name string")
    nations = [(i, f"NATION_{i}", i % 5) for i in range(25)]
    write("nation", nations, "n_nationkey bigint, n_name string, n_regionkey int")
    segs = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
    customers = [
        (k, f"Customer#{k}", rng.randrange(25),
         rng.choice([None] + [round(rng.uniform(-999, 9999), 2)] * 9),
         rng.choice(segs))
        for k in range(60)
    ]
    write(
        "customer", customers,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    suppliers = [
        (k, f"Supplier#{k}", rng.randrange(25), round(rng.uniform(-999, 9999), 2))
        for k in range(20)
    ]
    write(
        "supplier", suppliers,
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    adjs = ["cold", "small", "blue", "new", "hot"]
    nouns = ["widget", "rod", "ring"]
    types = ["ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO"]
    # deliberate retail-price ties for q2's min-equality join-back
    parts = [
        (k, f"{rng.choice(adjs)} {rng.choice(nouns)}", f"Brand#{rng.randrange(1, 25)}",
         rng.choice(types), rng.randrange(1, 50), rng.choice([900.0, 900.1, round(rng.uniform(100, 2000), 2)]))
        for k in range(40)
    ]
    write(
        "part", parts,
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    day95, day98 = (1995 - 1990) * 365, (1998 - 1990) * 365
    orders = [
        (k, rng.choice([None] + [rng.randrange(45)] * 19), rng.choice(["F", "O", "P"]),
         rng.choice([None] + [round(rng.uniform(900, 500000), 2)] * 19),
         rng.choice([day95, day95 + 1, rng.randrange(day95, day98 + 365)]),
         rng.choice(prios))
        for k in range(150)
    ]  # custkey < 45 → customers 45..59 have zero orders
    # r7 self-review fix: the ring comments promised NULL orderkeys,
    # duplicate keys, and negative totals but the generator never
    # produced them. NULL keys exercise excluded-from-join /
    # grouped-as-one-NULL-group semantics; the duplicate is an EXACT
    # row copy (safe for every deterministic-output query — tied rows
    # are identical in all columns); negative prices exercise the
    # histogram's negative-cent floor-division and the rank sketch.
    orders.append((None, 3, "F", -1234.56, day95 + 7, "5-LOW"))
    orders.append((None, None, "O", None, day95 + 9, "1-URGENT"))
    orders.append(orders[0])
    orders.append((150, 5, "O", -0.5, day95 + 3, "2-HIGH"))
    write(
        "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate bigint, o_orderpriority string",
        date_cols=("o_orderdate",),
    )
    lines = []
    for (okey, _, _, _, oday, _) in orders:
        for ln in range(rng.choice([0, 1, 1, 2, 3])):  # some orders no lines
            lines.append(
                (okey, rng.randrange(40), rng.randrange(20), ln + 1,
                 float(rng.randrange(1, 51)),
                 round(rng.uniform(900, 100000), 2),
                 rng.choice([0.0, 0.05, round(rng.uniform(0, 0.1), 2), None]),
                 round(rng.uniform(0, 0.08), 2),
                 rng.choice(["R", "A", "N"]), rng.choice(["O", "F"]),
                 oday + rng.randrange(0, 120))
            )
    # a parentless NULL-key line (never joins; counted in n_rows_*)
    lines.append(
        (None, 1, 2, 1, 5.0, 1000.0, 0.0, 0.01, "N", "O", day95 + 10)
    )
    write(
        "lineitem", lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate bigint",
        date_cols=("l_shipdate",),
    )

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    for name in TPCH_FUZZ_QUERIES:
        spark_pd = qs[name](spark, sf_dir).toPandas()
        duck_pd = con.execute(oracles[name]).fetchdf()
        assert len(spark_pd) == len(duck_pd), (name, len(spark_pd), len(duck_pd))
        assert sorted(spark_pd.columns) == sorted(duck_pd.columns), name
        a, b = canon(spark_pd), canon(duck_pd)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            raise AssertionError(
                f"{name}: {int(diff.sum())} rows differ; "
                f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
            )


def test_unicode_case_boundary(spark):
    """Documented cross-engine boundary (oracles.py header): Java full
    case mapping vs DuckDB simple folding. This test PINS the known
    divergence — if either engine changes behavior, the comparison
    contract needs re-auditing — and confirms the agreeing subset the
    corpora rely on."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    duck = con.execute(
        "SELECT lower('İSTANBUL'), lower('ΣΟΦΟΣ'), lower('CAFÉ NAÏVE')"
    ).fetchone()
    spark_vals = (
        spark.range(1)
        .select(
            F.lower(F.lit("İSTANBUL")),
            F.lower(F.lit("ΣΟΦΟΣ")),
            F.lower(F.lit("CAFÉ NAÏVE")),
        )
        .collect()[0]
    )
    # the agreeing subset: accented Latin
    assert spark_vals[2] == duck[2] == "café naïve"
    # the known divergences (Java: i + combining dot / final sigma)
    assert spark_vals[0] == "i̇stanbul" and duck[0] == "istanbul"
    assert spark_vals[1].endswith("ς") and duck[1].endswith("σ")


def test_oracles_agree_on_pathological_corpus(spark, tmp_path):
    """Degenerate shapes: a block of IDENTICAL docs, one giant doc, a
    single-char-token doc, and one-word docs — the corpus that stresses
    div-by-zero guards, tercile ties, and skewed aggregations — through
    the same full docs ring."""
    import __spark_entry__ as e
    from tools.check_oracle import canon

    rows = []
    for d in range(12):  # identical block
        rows.append((d, "the same exact boilerplate text every time", "en", "src0", 42))
    giant = " ".join(f"tok{i % 97}" for i in range(5000))
    rows.append((12, giant, "en", "src1", len(giant)))
    rows.append((13, "a b c d e f g a b c", "en", "src1", 19))
    rows.append((14, "single", "de", "src2", 6))
    rows.append((15, "x", "de", "src2", 1))
    sf_dir = str(tmp_path / "sf-patho")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    qs, oracles = e.queries(), e.oracle_sql()
    for name in FUZZ_QUERIES:
        spark_pd = qs[name](spark, sf_dir).toPandas()
        duck_pd = con.execute(oracles[name]).fetchdf()
        assert len(spark_pd) == len(duck_pd), (name, len(spark_pd), len(duck_pd))
        assert sorted(spark_pd.columns) == sorted(duck_pd.columns), name
        a, b = canon(spark_pd), canon(duck_pd)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            raise AssertionError(
                f"{name}: {int(diff.sum())} rows differ; "
                f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
            )


@pytest.mark.parametrize("shape", ["clustered", "diffuse"])
def test_knn_auto_route_varies_and_matches_oracle(spark, tmp_path, shape):
    """r7 verdict item 6: the chooser's ladder was measured on one
    corpus only. A mixture-of-Gaussians corpus flips the decision
    (tight clusters -> hyperplane LSH recall is high -> cheapest rung
    'single'; a diffuse corpus -> LSH misses -> 'hamming'), and on BOTH
    shapes the DuckDB twin must derive the SAME route from the same
    audit CTEs — the dispatch rule itself is corpus-shape-invariant
    cross-engine, not just correct on the driver corpus."""
    import __spark_entry__ as e
    from tools.check_oracle import canon

    rng = random.Random(5)
    rows = []
    if shape == "clustered":
        cents = [[rng.uniform(-3, 3) for _ in range(64)] for _ in range(5)]
        for i in range(120):
            c = cents[i % 5]
            rows.append(
                (i, [round(x + rng.gauss(0, 0.05), 3) for x in c], i % 5)
            )
    else:
        for i in range(120):
            rows.append(
                (i, [round(rng.uniform(-2, 2), 3) for _ in range(64)], i % 5)
            )
    sf_dir = str(tmp_path / f"emb-{shape}")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    spark_pd = e.queries()["knn_auto_vec0"](spark, sf_dir).toPandas()
    duck_pd = con.execute(e.oracle_sql()["knn_auto_vec0"]).fetchdf()
    a, b = canon(spark_pd), canon(duck_pd)
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    assert a.equals(b), f"{shape}: route/top-k diverged"
    route = set(spark_pd["route"])
    assert route == ({"single"} if shape == "clustered" else {"hamming"}), route
