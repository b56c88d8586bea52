"""Quantitative floors for the learned rows-only contracts (r9 verdict
item 4, completing the HLL++ 3·rsd pattern): a rows-only contract must
not merely return rows — each learned ANN path is asserted against its
oracle-checked EXACT twin with a pinned recall floor, and the whitening
eigensolve against the identity it promises. Every learned step here is
DETERMINISTIC for a given corpus (seeded Lloyd's, sign-pinned eigh,
fixed parquet input), so the observed recall/deviation is a constant of
the corpus and the floor is a real assertion, not a flaky tolerance.

Measured on the sf0.001 contract corpus (query 0, k=10):
  knn_ivf_vec0       (n_cells=16, n_probe=2)           recall 3/10
  knn_pq_vec0        (m=4, k=8 ADC)                    recall 5/10
  knn_ivfpq_res_vec0 (m=4, k=8, probe 2, shortlist 100) recall 3/10
  ...same at n_probe=4 (the recall-leg contract config) recall 5/10
Floors pin the measured values; monotonicity (probe 4 >= probe 2) is
asserted separately. zlib compression_ratio — the last contract that
carried no quantitative check — is pinned below against the corpus's
entropy ordering (repetitive stratum compresses strictly better) plus
the ratio >= 1 incompressibility bound, so every justified rows-only
contract now carries a quantitative check."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    from kafka_streams_spark.catalog import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def exact_top10(spark, embs):
    from kafka_streams_spark.operators.similarity import knn_to_id

    return {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}


def _recall(df, exact):
    return len({r["vec_id"] for r in df.collect()} & exact)


def test_knn_ivf_recall_floor(spark, embs, exact_top10):
    from kafka_streams_spark.operators.similarity import (
        build_ivf_index,
        knn_ivf_to_id,
    )

    indexed, cents = build_ivf_index(embs, n_cells=16)
    got = _recall(
        knn_ivf_to_id(indexed, cents, query_id=0, k=10, n_probe=2),
        exact_top10,
    )
    assert got >= 3, got


def test_knn_pq_recall_floor(spark, embs, exact_top10):
    from kafka_streams_spark.operators.similarity import (
        pq_topk_to_id,
        pq_train_codebooks,
    )

    books = pq_train_codebooks(embs, m=4, k=8)
    got = _recall(pq_topk_to_id(embs, books, query_id=0, k=10), exact_top10)
    assert got >= 5, got


def test_knn_ivfpq_res_recall_floor_and_probe_monotonicity(
    spark, embs, exact_top10
):
    from kafka_streams_spark.operators.similarity import (
        ivfpq_residual_topk_to_id,
        pq_train_residual_codebooks,
    )

    books = pq_train_residual_codebooks(embs, m=4, k=8)

    def rec(n_probe):
        return _recall(
            ivfpq_residual_topk_to_id(
                embs, books, query_id=0, k=10,
                n_probe=n_probe, shortlist=100,
            ),
            exact_top10,
        )

    r2, r4 = rec(2), rec(4)
    assert r2 >= 3, r2         # the contract's own config
    assert r4 >= 5, r4         # the recall-leg contract's config
    # probe widening must never lose recall: cells are a partition of
    # the corpus, so a wider probe set is a superset shortlist
    assert r4 >= r2, (r2, r4)


def test_whitened_second_moment_is_identity(spark, embs):
    """whiten_embeddings promises decorrelated unit-variance components:
    (W^T W)/n must equal I up to the gram table's integer quantization
    (PQ_SCALE) and the 6-dp output rounding — measured 1.4e-4 max
    deviation on the contract corpus; 1e-3 bounds it with headroom an
    eigensolve drift would still blow through."""
    from kafka_streams_spark.operators.similarity import whiten_embeddings

    w = whiten_embeddings(embs).toPandas()
    n = w["vec_id"].nunique()
    d = int(w["pos"].max()) + 1
    W = np.zeros((n, d))
    ids = {v: i for i, v in enumerate(sorted(w["vec_id"].unique()))}
    for vec_id, pos, val in zip(w["vec_id"], w["pos"], w["val"]):
        W[ids[vec_id], int(pos)] = val
    second = W.T @ W / n
    dev = np.abs(second - np.eye(d)).max()
    assert dev <= 1e-3, dev


def test_compression_ratio_corpus_floors(spark, sf_dir):
    """Quantitative pin for the last unbounded rows-only contract (r10
    verdict item 4): zlib's DEFLATE stream is not SQL-expressible, but
    its OUTPUT on the deterministic contract corpus is a constant, so
    the entropy-ordering it promises is a real assertion, not a smoke
    check. Measured on the sf0.001 documents (level 6): corpus mean
    ratio 0.555, repetitive half (per-doc distinct-token ratio <=
    corpus median 0.45) mean 0.4515 vs diverse half 0.658.

    Pins: (a) the repetitive-text stratum compresses strictly better
    than the high-entropy stratum, with >=0.1 separation headroom;
    (b) the corpus mean sits in the measured band; (c) zlib never beats
    entropy — a high-entropy input's ratio is >= 1 once the fixed
    header/footer overhead has nothing to amortize against."""
    import zlib

    from pyspark.sql import functions as F

    from kafka_streams_spark.catalog import load_table
    from kafka_streams_spark.operators.text import compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    rows = compression_ratio(docs).filter(F.col("ratio").isNotNull())
    toks = F.split(F.trim(F.col("text")), r"\s+")
    distinct_ratio = (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    )
    joined = rows.join(
        docs.select("doc_id", distinct_ratio.alias("dr")), "doc_id"
    )
    med = joined.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY dr)")
    ).collect()[0][0]
    stats = joined.agg(
        F.avg("ratio").alias("mean_all"),
        F.avg(F.when(F.col("dr") <= med, F.col("ratio"))).alias("mean_rep"),
        F.avg(F.when(F.col("dr") > med, F.col("ratio"))).alias("mean_div"),
    ).collect()[0]
    assert 0.50 <= stats["mean_all"] <= 0.60, stats
    assert stats["mean_rep"] + 0.1 < stats["mean_div"], stats

    # (c) incompressible bytes: 16 distinct symbols, nothing for DEFLATE
    # to match — raw entropy + the zlib header/footer puts ratio >= 1
    short = spark.createDataFrame(
        [(1, "aZ3$kQ9!mX7@pW5#")], "doc_id bigint, text string"
    )
    r = compression_ratio(short).collect()[0]
    assert r["ratio"] >= 1.0, r
    assert r["n_compressed"] == len(zlib.compress(b"aZ3$kQ9!mX7@pW5#", 6))
