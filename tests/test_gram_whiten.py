"""Second-moment statistics + PCA whitening: the Arrow partial-Gram
path must be bit-identical to direct NumPy int64 sums, and the whitened
projection must match the NumPy model (including the eigenvector sign
pin) and actually decorrelate the data."""

from __future__ import annotations

import numpy as np

from kafka_streams_spark.operators.similarity import (
    PQ_SCALE,
    embedding_gram,
    whiten_embeddings,
)
from kafka_streams_spark.sources.testdata import load_table


def _np_inputs(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xi = np.floor(X * PQ_SCALE + 0.5).astype(np.int64)
    return ids, Xi


def test_embedding_gram_matches_numpy_int_sums(spark, sf_dir):
    _, Xi = _np_inputs(spark, sf_dir)
    n, d = Xi.shape
    G = Xi.T @ Xi
    s = Xi.sum(axis=0)

    got = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["sum_i"], r["sum_j"], r["sum_prod"])
        for r in embedding_gram(
            load_table(spark, sf_dir, "embeddings")
        ).collect()
    }
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == (n, s[i], s[j], G[i, j]), (i, j)


def _np_whiten(Xi, eps=1e-6):
    Xq = Xi / PQ_SCALE
    mu = Xq.mean(axis=0)
    C = np.cov(Xq, rowvar=False, bias=True)
    lam, V = np.linalg.eigh(C)
    flip = np.sign(V[np.argmax(np.abs(V), axis=0), np.arange(V.shape[1])])
    flip[flip == 0] = 1.0
    V = V * flip
    W = V / np.sqrt(np.maximum(lam, 0.0) + eps)
    Y = (Xq - mu) @ W
    return np.sign(Y) * np.floor(np.abs(Y) * 1e6 + 0.5) / 1e6


def test_whiten_embeddings_matches_numpy_model(spark, sf_dir):
    ids, Xi = _np_inputs(spark, sf_dir)
    want = _np_whiten(Xi)
    idx = {int(v): k for k, v in enumerate(ids)}

    rows = whiten_embeddings(load_table(spark, sf_dir, "embeddings")).collect()
    assert len(rows) == want.size
    for r in rows:
        assert want[idx[r["vec_id"]], r["pos"]] == r["val"], (
            r["vec_id"],
            r["pos"],
        )


def test_whiten_output_is_decorrelated(spark, sf_dir):
    """Covariance of the whitened output ≈ identity (variance 1 per
    component up to eps damping, cross-covariance ~0) — the semantic
    point of whitening, checked independently of the model pin."""
    rows = whiten_embeddings(load_table(spark, sf_dir, "embeddings")).collect()
    by_id: dict[int, dict[int, float]] = {}
    for r in rows:
        by_id.setdefault(r["vec_id"], {})[r["pos"]] = r["val"]
    Y = np.asarray(
        [[by_id[i][p] for p in sorted(by_id[i])] for i in sorted(by_id)]
    )
    C = np.cov(Y, rowvar=False, bias=True)
    d = C.shape[0]
    offdiag = C - np.diag(np.diag(C))
    assert np.abs(offdiag).max() < 1e-3
    # eigenvalues well above eps → variance ≈ 1
    assert np.all(np.abs(np.diag(C) - 1.0) < 1e-2)


def test_norm_outliers_flags_zero_and_blowup_vectors(spark):
    """A zero vector and a 100× blowup must be flagged against a tight
    cluster of unit-ish vectors; in-distribution rows must not be."""
    from kafka_streams_spark.operators.similarity import norm_outliers

    base = [1.0, 0.0, 0.0, 0.0]
    rows = (
        [(i, [v * 1.0 for v in base], "a") for i in range(10)]
        + [(100, [0.0, 0.0, 0.0, 0.0], "a")]          # dead encoder row
        + [(101, [100.0, 0.0, 0.0, 0.0], "a")]        # overflow blowup
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    got = {r["vec_id"]: r["sqnorm"] for r in norm_outliers(df).collect()}
    assert set(got) == {100, 101}
    assert got[100] == 0
    assert got[101] == 100_000 ** 2


def test_embedding_drift_exact_sums(spark):
    """Drift table == direct NumPy int sums per side; dimensions exact,
    both sides present after the full outer join."""
    from kafka_streams_spark.operators.similarity import embedding_drift

    a = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, [0.5, 0.25])],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(3, [2.0, 2.0])], "vec_id long, embedding array<double>"
    )
    got = {r["pos"]: (r["n_a"], r["sum_a"], r["sumsq_a"], r["n_b"], r["sum_b"], r["sumsq_b"])
           for r in embedding_drift(a, b).collect()}
    # scale 1000: a dim0 = [1000, 500], dim1 = [-2000, 250]; b = [2000], [2000]
    assert got == {
        0: (2, 1500, 1000**2 + 500**2, 1, 2000, 2000**2),
        1: (2, -1750, 2000**2 + 250**2, 1, 2000, 2000**2),
    }


def test_knn_recall_audit_perfect_on_single_bucket(spark):
    """Vectors clustered tightly on one side of every hyperplane share
    a bucket, so the LSH ranking equals the exact ranking: recall k/k."""
    from kafka_streams_spark.operators.similarity import knn_recall_audit

    rows = [(i, [1.0 + 0.001 * i] * 64) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = knn_recall_audit(df, query_id=0, k=5).collect()[0]
    assert (r["query_id"], r["k"], r["n_hits"]) == (0, 5, 5)


def test_multitable_lsh_recall_beats_single_table(spark, sf_dir):
    """The OR-amplified 4x4 multitable candidate set must recover at
    least as many exact top-10 neighbors as the single-table 6-plane
    h<=2 config it replaces (measured: 8/10 vs 4/10 at sf0.01)."""
    from kafka_streams_spark.operators.similarity import (
        build_lsh_index,
        knn_lsh_multitable,
        knn_lsh_to_id,
        knn_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    exact = {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}
    indexed, _ = build_lsh_index(embs, dim=64, n_planes=6)
    single = {
        r["vec_id"]
        for r in knn_lsh_to_id(indexed, 0, 10, multiprobe_hamming=2).collect()
    }
    multi = {r["vec_id"] for r in knn_lsh_multitable(embs, 0, k=10).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 5  # the measured 8/10 with margin


def test_whiten_rejects_empty_input(spark):
    import pytest

    from kafka_streams_spark.operators.similarity import whiten_embeddings

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        whiten_embeddings(empty)


def test_recall_audit_multitable_method(spark, sf_dir):
    """method='multitable' audits knn_lsh_multitable: n_hits equals the
    direct overlap computation."""
    from kafka_streams_spark.operators.similarity import (
        knn_lsh_multitable,
        knn_recall_audit,
        knn_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    exact = {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}
    multi = {r["vec_id"] for r in knn_lsh_multitable(embs, 0, k=10).collect()}
    r = knn_recall_audit(
        embs, 0, k=10, n_planes=4, method="multitable", n_tables=4
    ).collect()[0]
    assert r["n_hits"] == len(multi & exact)


def test_embedding_profile_counts_each_defect(spark):
    """NULL vector, NaN component, Inf component, all-zero vector, and
    a ragged dimension each land in exactly their own counter."""
    from kafka_streams_spark.operators.similarity import embedding_profile

    rows = [
        (1, [1.0, 2.0]),
        (2, None),
        (3, [float("nan"), 1.0]),
        (4, [float("inf"), 1.0]),
        (5, [0.0, 0.0]),
        (6, [1.0, 2.0, 3.0]),  # ragged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_profile(df).collect()[0]
    assert (
        r["n_vecs"], r["n_null"], r["dim_min"], r["dim_max"],
        r["n_with_nan"], r["n_with_inf"], r["n_zero"],
    ) == (6, 1, 2, 3, 1, 1, 1)


def test_recall_audit_ivfpq_method(spark, sf_dir):
    """method='ivfpq' audits ivfpq_topk_to_id: n_hits equals the direct
    overlap, and lossless config (all probes, full shortlist) scores
    k/k."""
    from kafka_streams_spark.operators.similarity import (
        ivfpq_topk_to_id,
        knn_recall_audit,
        knn_to_id,
        pq_label_codebooks,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    books = pq_label_codebooks(embs, m=4)
    exact = {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}
    approx = {
        r["vec_id"]
        for r in ivfpq_topk_to_id(embs, books, 0, 10, n_probe=2, shortlist=100).collect()
    }
    r = knn_recall_audit(
        embs, 0, k=10, method="ivfpq", codebooks=books, n_probe=2, shortlist=100
    ).collect()[0]
    assert r["n_hits"] == len(approx & exact)

    n = embs.count()
    n_cells = embs.select("label").distinct().count()
    r2 = knn_recall_audit(
        embs, 0, k=10, method="ivfpq", codebooks=books,
        n_probe=n_cells, shortlist=n,
    ).collect()[0]
    assert r2["n_hits"] == 10


# ---------------------------------------------------------------------------
# binary (sign-bit) quantization ANN
# ---------------------------------------------------------------------------


def test_binarize_matches_numpy_sign_model(spark, sf_dir):
    """bsig bit i == (embedding[i] > 0) for the low 60 dims — pinned
    against a NumPy model over the real corpus slice."""
    import numpy as np

    from kafka_streams_spark.operators.similarity import binarize_embeddings
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings").limit(100)
    rows = embs.collect()
    got = {
        r["vec_id"]: r["bsig"] for r in binarize_embeddings(embs).collect()
    }
    for r in rows:
        v = np.asarray(r["embedding"][:60])
        want = int(((v > 0).astype(np.uint64) << np.arange(60, dtype=np.uint64)).sum())
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_knn_hamming_lossless_configuration(spark, sf_dir):
    """shortlist >= corpus size reduces the hamming path EXACTLY to
    knn_to_id (the pruning-is-real / recovery-is-exact pin the IVF-PQ
    composition also carries)."""
    from kafka_streams_spark.operators.similarity import knn_hamming_to_id, knn_to_id
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    n = embs.count()
    full = knn_hamming_to_id(embs, query_id=0, k=10, shortlist=n).select(
        "vec_id", "cosine_sim"
    )
    exact = knn_to_id(embs, query_id=0, k=10)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))


def test_knn_hamming_shortlist_prunes_for_real(spark, sf_dir):
    """With shortlist=s the result ids must come from the s hamming-
    closest signatures — pruning is structural, not advisory."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        binarize_embeddings,
        knn_hamming_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    s = 25
    sigs = binarize_embeddings(embs).collect()
    qsig = next(r["bsig"] for r in sigs if r["vec_id"] == 0)
    ranked = sorted(
        (bin(r["bsig"] ^ qsig).count("1"), r["vec_id"]) for r in sigs
    )[:s]
    allowed = {vid for _, vid in ranked}
    got = {r["vec_id"] for r in knn_hamming_to_id(embs, 0, k=10, shortlist=s).collect()}
    assert got <= allowed


def test_emb_near_dup_binary_matches_brute_force(spark, sf_dir):
    """Pigeonhole candidates + cosine verify == brute-force O(n^2)
    filter at the same (radius, threshold)."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        binarize_embeddings,
        cosine_similarity,
        emb_near_dup_binary,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings").limit(150)
    got = sorted(
        map(tuple, emb_near_dup_binary(embs, max_hamming=18, min_cosine=0.0).collect())
    )
    sigs = embs.join(binarize_embeddings(embs), "vec_id")
    a = sigs.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("_va"),
        F.col("bsig").alias("_sa"),
    )
    b = sigs.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("_vb"),
        F.col("bsig").alias("_sb"),
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int").alias("hamming"),
            F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 6).alias("cosine_sim"),
        )
        .filter((F.col("hamming") <= 18) & (F.col("cosine_sim") >= 0.0))
    )
    assert got == sorted(map(tuple, brute.collect()))


def test_knn_hamming_scan_is_map_only_before_shortlist(spark, sf_dir):
    """The signature scan + hamming scoring must reach the
    TakeOrderedAndProject without a hash exchange — the 8-byte-per-row
    scan economics the path exists for."""
    from kafka_streams_spark.operators.similarity import knn_hamming_to_id
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    df = knn_hamming_to_id(embs, query_id=0, k=10, shortlist=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_hamming_bucket_stats_prices_the_real_buckets(spark, sf_dir):
    """The audit's per-chunk candidate counts must equal a Python model
    of the SAME chunking, and upper-bound the distinct pairs the
    pigeonhole join emits."""
    from kafka_streams_spark.operators.dedup import hamming_bucket_stats, hamming_pairs
    from kafka_streams_spark.operators.similarity import binarize_embeddings
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    sigs = binarize_embeddings(embs)
    bits, r = 60, 16
    got = {
        r_["chunk_idx"]: (r_["n_buckets"], r_["max_bucket"], r_["n_candidate_pairs"])
        for r_ in hamming_bucket_stats(sigs, "bsig", bits, r).collect()
    }
    vals = [row["bsig"] for row in sigs.collect()]
    k = r + 1
    base, rem = divmod(bits, k)
    widths = [base + (1 if i < rem else 0) for i in range(k)]
    offsets = [sum(widths[:i]) for i in range(k)]
    from collections import Counter

    total_candidates = 0
    for i in range(k):
        c = Counter((v >> offsets[i]) & ((1 << widths[i]) - 1) for v in vals)
        want = (
            len(c),
            max(c.values()),
            sum(n * (n - 1) // 2 for n in c.values()),
        )
        assert got[i] == want, (i, got[i], want)
        total_candidates += want[2]
    distinct_pairs = hamming_pairs(sigs, "vec_id", "bsig", bits, r).count()
    assert distinct_pairs <= total_candidates


def test_hamming_dispatch_rule_and_strategy_equality(spark, sf_dir):
    """The pure dispatch rule routes tight radii to pigeonhole and
    degenerate (candidates ~ all-pairs) radii to brute; all three
    strategies produce identical pairs."""
    from kafka_streams_spark.operators.similarity import (
        emb_near_dup_binary,
        hamming_dispatch_choice,
    )
    from kafka_streams_spark.sources.testdata import load_table

    assert hamming_dispatch_choice(1000, 100) == "pigeonhole"
    assert hamming_dispatch_choice(1000, 499_500) == "brute"  # == all-pairs
    assert hamming_dispatch_choice(1000, 124_875) == "pigeonhole"  # == 0.25·all
    assert hamming_dispatch_choice(1000, 124_876) == "brute"
    assert hamming_dispatch_choice(0, 0) == "pigeonhole"
    assert hamming_dispatch_choice(1, 0) == "pigeonhole"

    embs = load_table(spark, sf_dir, "embeddings").limit(120)
    outs = {
        s: sorted(
            map(
                tuple,
                emb_near_dup_binary(
                    embs, max_hamming=18, min_cosine=0.0, strategy=s
                ).collect(),
            )
        )
        for s in ("pigeonhole", "brute", "auto")
    }
    assert outs["pigeonhole"] == outs["brute"] == outs["auto"]


def test_write_read_binary_index_roundtrip_and_gate(spark, sf_dir, tmp_path):
    """Persisted signature index: roundtrip equality, identical ranking
    via the index path, loud bit-width mismatch."""
    import pytest

    from kafka_streams_spark.operators.similarity import (
        binarize_embeddings,
        knn_hamming_index_to_id,
        knn_hamming_to_id,
        read_binary_index,
        write_binary_index,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "bidx")
    write_binary_index(embs, path)
    idx = read_binary_index(spark, path, bits=60)
    want = sorted(map(tuple, binarize_embeddings(embs).collect()))
    assert sorted(map(tuple, idx.collect())) == want
    via = knn_hamming_index_to_id(embs, idx, query_id=0, k=10)
    inline = knn_hamming_to_id(embs, query_id=0, k=10)
    assert sorted(map(tuple, via.collect())) == sorted(map(tuple, inline.collect()))
    with pytest.raises(ValueError, match="bits=60"):
        read_binary_index(spark, path, bits=32)


def test_knn_recall_audit_batch_rows_and_bounds(spark, sf_dir):
    """One row per probe, ordered, each n_hits in [0, k]; the self-hit
    guarantees n_hits >= 1 for every probe at any shortlist >= 1."""
    from kafka_streams_spark.operators.similarity import knn_recall_audit_batch
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    rows = knn_recall_audit_batch(
        embs, [0, 7, 23], k=10, method="hamming", shortlist=50
    ).collect()
    assert [r["query_id"] for r in rows] == [0, 7, 23]
    for r in rows:
        assert r["k"] == 10 and 1 <= r["n_hits"] <= 10


def test_knn_recall_audit_batch_equals_per_query_composition(spark, sf_dir):
    """The r11 fused single-scan audit (signature + cosine + hamming
    computed together, three windows over one exchange, no join) must
    emit EXACTLY the hit counts the composition of the independent
    primitives gives — |knn_hamming_to_id k-set ∩ knn_to_id k-set| per
    probe — with the same schema (query_id int, k int, n_hits bigint),
    including an n_hits=0 row for a probe id absent from the corpus
    (the spine left-join, where an inner join would silently drop the
    probe). The single-probe knn_recall_audit(method='hamming') routes
    through the same fused path, so this is the independent reference
    for both."""
    from kafka_streams_spark.operators.similarity import (
        knn_hamming_to_id,
        knn_recall_audit,
        knn_recall_audit_batch,
        knn_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    batch = knn_recall_audit_batch(
        embs, [0, 7, 23], k=10, method="hamming", shortlist=100
    )
    # query_id carries the corpus id column's NATIVE type (r12 ADVICE
    # fix — cast('int') wrapped bigint ids >= 2^31)
    assert batch.schema.simpleString() == (
        "struct<query_id:bigint,k:int,n_hits:bigint>"
    )
    per = []
    for q in (0, 7, 23):
        exact = {r["vec_id"] for r in knn_to_id(embs, q, 10).collect()}
        approx = {
            r["vec_id"]
            for r in knn_hamming_to_id(embs, q, 10, shortlist=100).collect()
        }
        per.append((q, 10, len(exact & approx)))
    assert [tuple(r) for r in batch.collect()] == per
    # the single-probe audit routes through the fused path and must
    # agree with the same independent composition
    single = tuple(
        knn_recall_audit(embs, 7, 10, method="hamming", shortlist=100)
        .collect()[0]
    )
    assert single == per[1]

    ghost = knn_recall_audit_batch(
        embs, [0, 999_999_999], k=10, method="hamming", shortlist=100
    ).collect()
    assert [(r["query_id"], r["n_hits"] == 0) for r in ghost] == [
        (0, False),
        (999_999_999, True),
    ]


def test_knn_recall_audit_fused_matches_composition_on_nan_corpus(
    spark, sf_dir
):
    """r12 ADVICE fix: knn_to_id now quarantines NaN vectors at entry
    like every other ANN leg, so on a corpus CONTAINING NaN rows the
    fused hamming audit (which always ranked over a quarantined corpus)
    stays equal to the composition of the independent primitives —
    before the fix knn_to_id let the NaN row rank FIRST under desc and
    the two sides silently disagreed. Also pins the bigint-id spine:
    a probe id above 2^31 must group/join without int wraparound."""
    import math

    from kafka_streams_spark.operators.similarity import (
        knn_hamming_to_id,
        knn_recall_audit_batch,
        knn_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings").limit(200)
    dim = len(embs.select("embedding").first()[0])
    big_id = 2**33 + 5  # wraps to a different int32 under cast('int')
    poison = spark.createDataFrame(
        [
            (3_000_000, [float("nan")] * dim, 0),
            (big_id, [1.0] + [0.25] * (dim - 1), 0),
        ],
        schema=embs.schema,
    )
    corpus = embs.unionByName(poison)

    probes = [0, 7, big_id]
    batch = knn_recall_audit_batch(
        corpus, probes, k=10, method="hamming", shortlist=100
    )
    rows = {r["query_id"]: r["n_hits"] for r in batch.collect()}
    assert set(rows) == set(probes)

    for q in probes:
        exact = {r["vec_id"] for r in knn_to_id(corpus, q, 10).collect()}
        approx = {
            r["vec_id"]
            for r in knn_hamming_to_id(corpus, q, 10, shortlist=100).collect()
        }
        # the NaN row must be in neither leg's k-set
        assert 3_000_000 not in exact and 3_000_000 not in approx
        assert rows[q] == len(exact & approx)
    # a real probe keeps a sane recall (its own id always hits)
    assert rows[big_id] >= 1


def test_knn_hamming_batch_matches_single_query_form(spark, sf_dir):
    """Per-query slices of the batch form must equal the single-query
    hamming knn (same shortlist, same ranking convention)."""
    from kafka_streams_spark.operators.similarity import (
        knn_hamming_batch_to_ids,
        knn_hamming_to_id,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    batch = knn_hamming_batch_to_ids(embs, [0, 7], k=5, shortlist=60)
    rows = batch.collect()
    for qid in (0, 7):
        got = sorted(
            (r["vec_id"], r["hamming"], r["cosine_sim"])
            for r in rows
            if r["query_id"] == qid
        )
        want = sorted(
            map(tuple, knn_hamming_to_id(embs, qid, k=5, shortlist=60).collect())
        )
        assert got == want, qid
    ranks = sorted(r["rank"] for r in rows if r["query_id"] == 0)
    assert ranks == [1, 2, 3, 4, 5]


def test_cell_centroids_int_match_numpy_model(spark, sf_dir):
    """Integer cell centroids == NumPy java-round of scaled-int means
    per (label, dim)."""
    import math

    import numpy as np

    from kafka_streams_spark.operators.similarity import cell_centroids_int
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    got = {
        r["label"]: list(r["cent"])
        for r in cell_centroids_int(embs).collect()
    }
    rows = embs.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            [math.floor(float(x) * 10**6 + 0.5) for x in r["embedding"]]
        )
    for lbl, vecs in by_label.items():
        X = np.array(vecs, dtype=np.int64)
        want = [
            int(math.floor((2 * int(s) + len(vecs)) / (2 * len(vecs))))
            for s in X.sum(axis=0)
        ]
        assert got[lbl] == want, lbl


def test_ivfpq_residual_lossless_and_pruning(spark, sf_dir):
    """All-probes + full-shortlist reduces residual IVF-PQ EXACTLY to
    knn_to_id (quantization is recall-lossy, never rank-corrupting once
    the shortlist covers everything); n_probe=1 returns only ids from
    the single probed cell (pruning is structural)."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        cell_centroids_int,
        ivfpq_residual_topk_to_id,
        knn_to_id,
        pq_train_residual_codebooks,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    books = pq_train_residual_codebooks(embs, m=4, k=8)
    n = embs.count()
    loss = ivfpq_residual_topk_to_id(embs, books, 0, 10, n_probe=10**6, shortlist=n)
    exact = knn_to_id(embs, 0, 10)
    assert sorted(map(tuple, loss.collect())) == sorted(map(tuple, exact.collect()))

    one = ivfpq_residual_topk_to_id(embs, books, 0, 10, n_probe=1, shortlist=50)
    got_ids = {r["vec_id"] for r in one.collect()}
    # the probed cell is the query's own (its centroid is L2-closest in
    # expectation, but pin structurally: all results share ONE label)
    labels = {
        r["label"]
        for r in embs.join(
            one.select("vec_id"), "vec_id", "left_semi"
        ).select("label").collect()
    }
    assert len(labels) == 1, labels
    assert got_ids  # non-empty


def test_residual_adc_fidelity_not_worse_than_raw(spark, sf_dir):
    """Mean |ADC − exact int distance| with residual codebooks must not
    exceed the raw-codebook error (the FAISS residual claim; on this
    structure-free synthetic corpus the measured gain is ~2%, on
    clustered data it is large — the pin is non-inferiority)."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.similarity import (
        _int_sqdist,
        _lit_ints,
        _pq_scaled,
        cell_centroids_int,
        pq_train_codebooks,
        pq_train_residual_codebooks,
    )
    from kafka_streams_spark.sources.testdata import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    qid = 0
    qint = embs.filter(F.col("vec_id") == qid).select(
        _pq_scaled(F.col("embedding")).alias("_qint")
    )
    base = (
        embs.crossJoin(F.broadcast(qint))
        .select(
            "vec_id",
            "label",
            _pq_scaled(F.col("embedding")).alias("_xi"),
            F.col("_qint"),
        )
        .withColumn("exact_d", _int_sqdist(F.col("_xi"), F.col("_qint")))
        .join(F.broadcast(cell_centroids_int(embs)), "label")
    )

    def adc(books, residual):
        m, kc = len(books), len(books[0])
        dsub = len(books[0][0])
        vec = (
            F.zip_with(F.col("_xi"), F.col("cent"), lambda x, c: x - c)
            if residual
            else F.col("_xi")
        )
        qv = (
            F.zip_with(F.col("_qint"), F.col("cent"), lambda x, c: x - c)
            if residual
            else F.col("_qint")
        )
        tot = None
        for s in range(m):
            sub = F.slice(vec, s * dsub + 1, dsub)
            dists = F.array(
                *[_int_sqdist(sub, _lit_ints(books[s][j])) for j in range(kc)]
            )
            code = F.array_position(dists, F.array_min(dists)).cast("int")
            book = F.array(*[_lit_ints(books[s][j]) for j in range(kc)])
            d = _int_sqdist(F.slice(qv, s * dsub + 1, dsub), F.element_at(book, code))
            tot = d if tot is None else tot + d
        return tot

    raw_books = pq_train_codebooks(embs, m=4, k=8)
    res_books = pq_train_residual_codebooks(embs, m=4, k=8)
    r = (
        base.filter(F.col("vec_id") != qid)
        .select(
            F.abs(adc(raw_books, False) - F.col("exact_d")).alias("e_raw"),
            F.abs(adc(res_books, True) - F.col("exact_d")).alias("e_res"),
        )
        .agg(F.avg("e_raw").alias("raw"), F.avg("e_res").alias("res"))
        .collect()[0]
    )
    assert r["res"] <= r["raw"] * 1.02, (r["res"], r["raw"])


def test_embedding_gram_quarantines_null_and_ragged(spark):
    """NULL embedding rows are filtered JVM-side before the Arrow pass
    (round-7 advice fix — one bad row must not kill a gram stream);
    with dim= set, ragged rows are quarantined too. The statistic over
    the dirty frame equals the clean-subset statistic."""
    from kafka_streams_spark.operators.similarity import embedding_gram

    dirty = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 0.5]),
            (2, None),
            (3, [0.25, -1.0, 3.0]),
            (4, [9.0]),  # ragged
        ],
        "vec_id bigint, embedding array<double>",
    )
    clean = dirty.filter("vec_id IN (1, 3)")
    got = sorted(
        map(tuple, embedding_gram(dirty, scale=10**3, dim=3).collect())
    )
    want = sorted(map(tuple, embedding_gram(clean, scale=10**3).collect()))
    assert got == want
    # without dim=, NULLs are still quarantined (ragged-free frame)
    no_ragged = dirty.filter("vec_id != 4")
    got2 = sorted(map(tuple, embedding_gram(no_ragged, scale=10**3).collect()))
    assert got2 == want


def test_whiten_embeddings_skips_null_rows(spark):
    """whiten's apply pass shares the quarantine: a NULL row gets no
    whitened output rows and does not crash the Arrow projection."""
    from kafka_streams_spark.operators.similarity import whiten_embeddings

    embs = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [2.0, 1.0]),
            (3, [0.0, -1.0]),
            (4, None),
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = whiten_embeddings(embs, scale=10**3)
    ids = {r["vec_id"] for r in out.select("vec_id").distinct().collect()}
    assert ids == {1, 2, 3}
