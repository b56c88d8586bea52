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
    "ngram_novelty",
]

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
        text = "\n".join(lines)
        rows.append((d, text, "en", f"src{d % 3}", len(text)))
    # exact duplicate docs (same text, higher ids)
    for i, (d, text, lang, src, n) in enumerate(rows[: n_docs // 5]):
        rows.append((n_docs + i, text, lang, src, n))
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
    # sql_balances registers catalog views over every table and the fuzz
    # dir only materializes events; the SQL surface is covered by the
    # driver corpus where all tables exist
]

EVENT_FUZZ_QUERIES = [
    "events_hourly",
    "sessionize_events",
    "event_transitions",
    "events_rate_anomaly",
    "events_dead_hours",
    "events_props_profile",
    "funnel_conversions",
    "cohort_retention",
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
        user = rng.randint(1, 25)
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
                # incl. negatives (refunds) and half-cent boundaries —
                # floor(x*100 + 0.5) must agree cross-engine on both
                rng.choice(
                    [round(rng.uniform(-50.0, 400.0), 2), 1.005, -1.005, 2.675]
                ),
                rng.choice(props_pool) if rng.random() < 0.9 else None,
            )
        )
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
