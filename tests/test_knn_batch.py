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


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def test_pq_train_deterministic_and_shaped(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import pq_train_codebooks
    from kafka_streams_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = pq_train_codebooks(emb, m=4, k=8)
    b2 = pq_train_codebooks(emb, m=4, k=8)
    assert b1 == b2  # identical inputs -> identical codebooks
    assert len(b1) == 4 and len(b1[0]) == 8 and len(b1[0][0]) == 16
    assert all(isinstance(c, int) for c in b1[0][0])


def test_pq_encode_crafted_argmin_ties_lowest_index(spark):
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import pq_encode

    # 1-D subspaces; centroids [0, 1000000] per subspace. x = 0.5 scales
    # to 500000 — equidistant, must take code 0 (lowest index).
    books = [[[0], [1_000_000]], [[0], [1_000_000]]]
    df = spark.createDataFrame(
        [(1, [0.5, 0.9]), (2, [0.1, 0.2])],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()
    }
    assert got == {1: [0, 1], 2: [0, 0]}


def test_pq_topk_self_is_rank_one_and_plan_shape(spark, sf_dir):
    """The query vector's own PQ cell distance is minimal (ADC of q vs
    its own codes) — vec 0 must rank first; the plan must be a
    TakeOrderedAndProject with no Python stage and the encode pass must
    add no shuffle (the crossJoin broadcast is the only join)."""
    from kafka_streams_spark.operators.similarity import (
        pq_label_codebooks,
        pq_topk_to_id,
    )
    from kafka_streams_spark.plans.audit import audit
    from kafka_streams_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_label_codebooks(emb, m=4)
    top = pq_topk_to_id(emb, books, query_id=0, k=10)
    a = audit(top)
    assert a.has_take_ordered, a.plan
    assert "EvalPython" not in a.plan, a.plan
    assert a.num_exchanges == 0, a.plan
    rows = top.collect()
    assert rows[0]["vec_id"] == 0
    assert all(r["pq_dist"] >= rows[0]["pq_dist"] for r in rows)


def test_pq_label_codebooks_match_learned_machinery(spark, sf_dir):
    """Label codebooks and learned codebooks drive the SAME encode/ADC
    expressions — encoding under either must give one code per subspace
    within [0, k)."""
    from kafka_streams_spark.operators.similarity import (
        pq_encode,
        pq_label_codebooks,
        pq_train_codebooks,
    )
    from kafka_streams_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    for books in (pq_label_codebooks(emb, m=4), pq_train_codebooks(emb, m=4, k=8)):
        k = len(books[0])
        rows = pq_encode(emb, books).collect()
        assert all(0 <= c < k for r in rows for c in r["codes"])


def test_pq_rerank_recovers_exact_order_on_shortlist(spark, sf_dir):
    """With shortlist = |corpus| the two-stage result must equal the
    exact knn — the re-rank stage is lossless; only the shortlist cut
    costs recall."""
    from kafka_streams_spark.operators.similarity import (
        knn_to_id,
        pq_label_codebooks,
        pq_topk_rerank_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    books = pq_label_codebooks(emb, m=4)
    got = [
        (r["vec_id"], r["cosine_sim"])
        for r in pq_topk_rerank_to_id(
            emb, books, query_id=0, k=10, shortlist=n
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in knn_to_id(emb, query_id=0, k=10).collect()
    ]
    assert got == want


def test_ivfpq_all_probes_full_shortlist_is_exact(spark, sf_dir):
    """With every cell probed and shortlist = corpus size, IVF-PQ is
    lossless: output equals exact knn under the contract ranking."""
    from kafka_streams_spark.operators.similarity import (
        ivfpq_topk_to_id,
        knn_to_id,
        pq_label_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_cells = emb.select("label").distinct().count()
    books = pq_label_codebooks(emb, m=4)
    got = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivfpq_topk_to_id(
            emb, books, query_id=0, k=10, n_probe=n_cells, shortlist=n
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in knn_to_id(emb, query_id=0, k=10).collect()
    ]
    assert got == want


def test_ivfpq_prunes_to_probed_cells(spark, sf_dir):
    """With n_probe=1 every returned id lives in the single probed cell
    — the pruning is real, not advisory."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        cosine_similarity,
        ivfpq_topk_to_id,
        label_centroids,
        pq_label_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_label_codebooks(emb, m=4)
    got_ids = [
        r["vec_id"]
        for r in ivfpq_topk_to_id(emb, books, query_id=0, k=10, n_probe=1).collect()
    ]
    # recompute the probed cell the same way the operator does
    cent = label_centroids(emb)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qvec"))
    best = (
        cent.crossJoin(F.broadcast(q))
        .select("label", cosine_similarity(F.col("centroid"), F.col("_qvec")).alias("cs"))
        .orderBy(F.col("cs").desc(), "label")
        .limit(1)
        .collect()[0]["label"]
    )
    cell_ids = {r["vec_id"] for r in emb.filter(F.col("label") == best).collect()}
    assert set(got_ids) <= cell_ids


def test_write_read_pq_codes_roundtrip_and_gate(spark, sf_dir, tmp_path):
    """Persisted codes equal a fresh encode; reading with different
    codebooks is rejected loudly (silent garbage ranking otherwise)."""
    import pytest

    from kafka_streams_spark.operators.similarity import (
        pq_encode,
        pq_label_codebooks,
        read_pq_codes,
        write_pq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_label_codebooks(emb, m=4)
    path = str(tmp_path / "codes")
    write_pq_codes(emb, books, path)

    got = sorted(
        (r["vec_id"], list(r["codes"]))
        for r in read_pq_codes(spark, path, codebooks=books).collect()
    )
    want = sorted(
        (r["vec_id"], list(r["codes"])) for r in pq_encode(emb, books).collect()
    )
    assert got == want

    other = pq_label_codebooks(emb, m=2)
    with pytest.raises(ValueError, match="different codebooks"):
        read_pq_codes(spark, path, codebooks=other)


def test_pq_error_audit_zero_on_centroid_vectors(spark):
    """Vectors that ARE their cell centroid quantize losslessly: ADC
    distance == exact distance, err == 0 for every candidate."""
    from kafka_streams_spark.operators.similarity import (
        pq_error_audit,
        pq_label_codebooks,
    )

    # two labels, each with identical vectors -> centroid == the vector
    rows = [(i, [1.0, 2.0, 3.0, 4.0], "a") for i in range(3)] + [
        (10 + i, [5.0, 6.0, 7.0, 8.0], "b") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    books = pq_label_codebooks(df, m=2)
    out = pq_error_audit(df, books, query_id=0, k=6).collect()
    assert len(out) == 6
    assert all(r["err"] == 0 for r in out)
    assert all(r["pq_dist"] == r["exact_dist"] for r in out)


def test_pq_topk_with_persisted_codes_matches_inline(spark, sf_dir, tmp_path):
    """The recurring-run path (codes=read_pq_codes) ranks identically
    to inline encoding."""
    from kafka_streams_spark.operators.similarity import (
        pq_label_codebooks,
        pq_topk_to_id,
        read_pq_codes,
        write_pq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_label_codebooks(emb, m=4)
    path = str(tmp_path / "codes")
    write_pq_codes(emb, books, path)
    codes = read_pq_codes(spark, path, codebooks=books)

    inline = sorted(map(tuple, pq_topk_to_id(emb, books, 0, 20).collect()))
    persisted = sorted(
        map(tuple, pq_topk_to_id(emb, books, 0, 20, codes=codes).collect())
    )
    assert inline == persisted
