"""Property-based pins (hypothesis) for the cross-engine numeric
semantics the oracle contract depends on. These run the SPARK
expressions over generated inputs and compare against an independent
Python model — the generalization of the reference's
randomized-vs-model component test (KafkaStreamsCT.java:136-192)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _spark():
    from kafka_streams_spark.session import get_spark

    return get_spark(app_name="kafka_streams_spark-tests", shuffle_partitions=8)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=50))
def test_java_round_matches_math_floor_model(amounts):
    """java_round(x*0.8) == floor(x*0.8 + 0.5) — Java Math.round — for
    negative amounts too (where Spark's HALF_UP round() diverges)."""
    from kafka_streams_spark.functions.numeric import java_round

    spark = _spark()
    df = spark.createDataFrame([(a,) for a in amounts], ["amount"])
    got = [
        r["r"]
        for r in df.select(
            java_round(F.col("amount") * F.lit(0.8)).alias("r")
        ).collect()
    ]
    expected = [int(math.floor(a * 0.8 + 0.5)) for a in amounts]
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=6)
)
def test_token_jaccard_matches_set_model(texts):
    """token_set_jaccard over word_shingles(n=1) == Python set Jaccard."""
    from kafka_streams_spark.operators.dedup import ngram_jaccard_pairs

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=1, threshold=0.0).collect()
    }

    def toks(t):
        s = {w for w in t.lower().split() if w}
        return s if s else {""}  # empty doc -> single empty shingle

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = toks(texts[i]), toks(texts[j])
            union = len(a | b)
            expected = 1.0 if union == 0 else len(a & b) / union
            assert abs(pairs[(i, j)] - expected) < 1e-12, (texts[i], texts[j])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_cosine_similarity_matches_model(vecs):
    from kafka_streams_spark.functions.vectors import cosine_similarity

    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], ["i", "v"]
    )
    q = [float(x) for x in vecs[0]]
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            cosine_similarity(
                F.col("v"), F.array(*[F.lit(x) for x in q])
            ).alias("s"),
        ).collect()
    }

    def model(v):
        d = sum(a * b for a, b in zip(v, q))
        na = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in q))
        return 0.0 if na * nb == 0 else d / (na * nb)

    for i, v in enumerate(vecs):
        assert abs(got[i] - model(v)) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abc ", min_size=0, max_size=40), min_size=2, max_size=8),
    st.sampled_from([0.3, 0.6, 0.9]),
)
def test_jaccard_three_forms_agree(texts, threshold):
    """The three physical forms of exact n-gram Jaccard — blocked
    array-intersect, prefix-filtered AllPairs, and the bitset encoding —
    must be output-identical on arbitrary corpora (same pairs, same
    doubles), including all-empty docs, single-token docs, and exact
    duplicates hypothesis likes to generate."""
    from kafka_streams_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_bitset,
        ngram_jaccard_pairs_prefix,
    )

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )

    def norm(out):
        return sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in out.collect())

    blocked = norm(ngram_jaccard_pairs(df, n=1, threshold=threshold))
    prefix = norm(ngram_jaccard_pairs_prefix(df, n=1, threshold=threshold))
    bitset = norm(ngram_jaccard_pairs_bitset(df, n=1, threshold=threshold))
    assert blocked == prefix == bitset


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=40), min_size=1, max_size=8),
    st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=40), min_size=1, max_size=8),
)
def test_corpus_drift_matches_tvd_model(texts_a, texts_b):
    """corpus_drift's integer-arithmetic TVD == the Python float model
    0.5*Σ|p_a − p_b|, for arbitrary corpora (including empty-token
    sides, where TVD is defined only if both totals are nonzero)."""
    from collections import Counter

    from kafka_streams_spark.operators.text import corpus_drift

    spark = _spark()
    da = spark.createDataFrame([(i, t) for i, t in enumerate(texts_a)], ["doc_id", "text"])
    db = spark.createDataFrame([(i, t) for i, t in enumerate(texts_b)], ["doc_id", "text"])
    ca = Counter(w for t in texts_a for w in t.lower().split() if w)
    cb = Counter(w for t in texts_b for w in t.lower().split() if w)
    ta, tb = sum(ca.values()), sum(cb.values())
    row = corpus_drift(da, db).collect()[0]
    assert row["n_tokens_a"] == ta and row["n_tokens_b"] == tb
    if ta == 0 or tb == 0:
        assert row["tvd"] is None  # 0-denominator: no distribution to compare
        return
    expected = 0.5 * sum(
        abs(ca.get(w, 0) / ta - cb.get(w, 0) / tb) for w in set(ca) | set(cb)
    )
    assert abs(row["tvd"] - expected) < 1e-8, (texts_a, texts_b)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 10**4)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
)
def test_reservoir_sample_matches_priority_model(rows, k):
    """reservoir_sample == the Python model: top-k by round(u^(1/w), 9)
    with id tiebreak, u = md5-derived uniform — for arbitrary ids,
    weights, and k."""
    import hashlib

    from kafka_streams_spark.operators.sampling import reservoir_sample

    spark = _spark()
    df = spark.createDataFrame(
        [(i, "s", w) for i, w in rows], "doc_id bigint, source string, w bigint"
    )
    got = sorted(
        (r["doc_id"], r["rk"])
        for r in reservoir_sample(df, k=k, stratum_col="source", weight_col="w").collect()
    )

    def priority(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 16**8
        return round(u ** (1.0 / w), 9)

    ranked = sorted(rows, key=lambda t: (-priority(*t), t[0]))[:k]
    expected = sorted((i, pos + 1) for pos, (i, _) in enumerate(ranked))
    assert got == expected, (rows, k)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.text(alphabet="ab cd", max_size=40)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 32),
)
def test_pack_sequences_matches_python_model(rows, L):
    """pack_sequences == a straight-line Python packer for arbitrary
    docs and sequence lengths: same slices, full coverage, all
    non-final sequences exactly L tokens."""
    import re

    from kafka_streams_spark.operators.sampling import pack_sequences

    spark = _spark()
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in rows], "doc_id bigint, source string, text string"
    )
    got = sorted(
        (r["doc_id"], r["seq_id"], r["doc_start"], r["n_tokens_in_seq"], r["seq_off"])
        for r in pack_sequences(df, seq_len=L).collect()
    )

    bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    expected = []
    cum = 0
    for i, t in sorted(rows):
        n = len(bpe.findall(t))
        if n == 0:
            continue
        lo, cum = cum, cum + n
        for k in range(lo // L, (cum - 1) // L + 1):
            start = max(0, k * L - lo)
            end = min(n, (k + 1) * L - lo)
            expected.append((i, k, start, end - start, max(0, lo - k * L)))
    assert got == sorted(expected), (rows, L)
