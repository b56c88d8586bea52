"""Batched k-NN: the Arrow map-side pre-top-k scale path must produce
exactly the expression form's result (same rounded-rank contract)."""

from __future__ import annotations

from kafka_streams_spark.operators.similarity import (
    knn_batch_arrow,
    knn_batch_to_ids,
)
from kafka_streams_spark.sources.testdata import load_table


def test_arrow_path_matches_expression_path(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    expr_rows = sorted(
        map(tuple, knn_batch_to_ids(embs, [0, 1, 2], k=10).collect())
    )

    # Query vectors collected OUTSIDE query construction — the documented
    # contract for the Arrow form.
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in embs.filter("vec_id IN (0, 1, 2)").collect()
    }
    arrow_rows = sorted(map(tuple, knn_batch_arrow(embs, qvecs, k=10).collect()))

    assert len(expr_rows) == 30  # 3 queries × k
    assert expr_rows == arrow_rows


def test_self_is_rank_one(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    top = {
        r.query_id: r.vec_id
        for r in knn_batch_to_ids(embs, [0, 1, 2], k=1).collect()
    }
    assert top == {0: 0, 1: 1, 2: 2}  # each query's nearest neighbor is itself


def test_decontaminate_emb_arrow_matches_expression(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        max_benchmark_cosine,
        max_benchmark_cosine_arrow,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    bucket = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2)
    bench, train = embs.filter(bucket < "20"), embs.filter(bucket >= "20")

    expr = sorted(map(tuple, max_benchmark_cosine(train, bench, 0.3).collect()))

    bvecs = [list(r.embedding) for r in bench.collect()]  # outside construction
    arrow = sorted(
        map(tuple, max_benchmark_cosine_arrow(train, bvecs, 0.3).collect())
    )
    assert expr == arrow and len(expr) > 0
