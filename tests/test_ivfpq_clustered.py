"""Residual IVF-PQ re-measured on CLUSTERED embeddings (round-6 verdict
item 3): the round-6 finding was a ~2% residual advantage on the
structure-free contract corpus; mixture-of-Gaussians corpora show WHEN
residuals actually pay.

Measured matrix (ROUND7_NOTES §3 carries the full table):

  regime                      cells-vs-k  spread-vs-noise  winner
  5 cells, tight, separated   cells <= k  --               tie 10/10 (probe-1 saturates)
  5 cells, sigma 1.0          cells <= k  comparable       RAW (k=8 codebook has spare
                                                           centroids to encode 5 cell
                                                           offsets; pooled residuals are
                                                           structure-free noise)
  32 cells, sigma 1.0         cells >> k  comparable       tie
  32 cells, sigma 0.3         cells >> k  spread >> noise  RESIDUAL (6 vs 4-5 of 10)

Rule extracted: residual codebooks move the recall ceiling only when
the cell count exceeds the per-subspace codebook size AND the
between-cell spread dominates the within-cell noise — exactly the FAISS
billion-scale regime (2^14 cells, k=256). At the contract config
(5 label cells, k=8) residuals cannot help; the contract config stays,
and knn_auto's dispatch measures instead of assuming.
"""

from __future__ import annotations

import random



def _mog(spark, n_comp: int, sigma: float, n: int, seed: int = 7):
    rng = random.Random(seed)
    d = 64
    centers = [[rng.uniform(-3, 3) for _ in range(d)] for _ in range(n_comp)]
    rows = []
    for i in range(n):
        c = i % n_comp
        rows.append(
            (i, [round(centers[c][j] + rng.gauss(0, sigma), 3) for j in range(d)], c)
        )
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).cache()


def _recall(embs, method, books, n_probe, shortlist):
    from kafka_streams_spark.operators.similarity import knn_recall_audit

    return knn_recall_audit(
        embs, 0, k=10, method=method, codebooks=books,
        n_probe=n_probe, shortlist=shortlist,
    ).collect()[0]["n_hits"]


def test_residual_wins_when_cells_exceed_codebook_and_noise_is_small(spark):
    """32 tight cells vs k=8 codebooks: raw PQ must spend its 8
    centroids per subspace covering a ±3 spread of 32 cell offsets;
    residual PQ only covers sigma-0.3 noise — residual recall must
    exceed raw at every matched (probe, shortlist) budget."""
    from kafka_streams_spark.operators.similarity import (
        pq_train_codebooks,
        pq_train_residual_codebooks,
    )

    embs = _mog(spark, n_comp=32, sigma=0.3, n=1600)
    try:
        raw_books = pq_train_codebooks(embs, m=4, k=8)
        res_books = pq_train_residual_codebooks(embs, m=4, k=8)
        r_raw = _recall(embs, "ivfpq", raw_books, n_probe=2, shortlist=15)
        r_res = _recall(embs, "ivfpq_res", res_books, n_probe=2, shortlist=15)
        assert r_res > r_raw, (r_res, r_raw)
    finally:
        embs.unpersist()


def test_raw_matches_or_beats_residual_when_codebook_covers_cells(spark):
    """5 cells vs k=8 codebooks with comparable spread/noise: the raw
    codebook can encode cell identity directly (spare centroids), while
    pooled residuals are structure-free noise a k=8 book cannot cover —
    residuals must NOT be assumed better; the audit decides."""
    from kafka_streams_spark.operators.similarity import (
        pq_train_codebooks,
        pq_train_residual_codebooks,
    )

    embs = _mog(spark, n_comp=5, sigma=1.0, n=1000)
    try:
        raw_books = pq_train_codebooks(embs, m=4, k=8)
        res_books = pq_train_residual_codebooks(embs, m=4, k=8)
        r_raw = _recall(embs, "ivfpq", raw_books, n_probe=2, shortlist=15)
        r_res = _recall(embs, "ivfpq_res", res_books, n_probe=2, shortlist=15)
        assert r_raw >= r_res, (r_raw, r_res)
    finally:
        embs.unpersist()
