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
        u = (
            int(hashlib.md5(f"reservoir:{i}".encode()).hexdigest()[:8], 16)
            / 16**8
        )
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


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.text(alphabet="abc xyz", min_size=1, max_size=40), min_size=2, max_size=6)
)
def test_weighted_jaccard_matches_idf_model(texts):
    """weighted_jaccard_pairs(n=1) == the Python idf-weighted set model:
    wj = Σ_{A∩B} log10(N/df) / Σ_{A∪B} log10(N/df). The posting-list
    join emits only pairs sharing ≥1 shingle with positive, defined
    scores — the model mirrors that."""
    from kafka_streams_spark.operators.dedup import weighted_jaccard_pairs

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    thr = 1e-9
    got = {
        (r["id_a"], r["id_b"]): r["weighted_jaccard"]
        for r in weighted_jaccard_pairs(df, n=1, threshold=thr).collect()
    }

    def toks(t):
        s = {w for w in t.lower().split() if w}
        return s if s else {""}

    sets = [toks(t) for t in texts]
    n = len(sets)
    df_count: dict[str, int] = {}
    for s in sets:
        for w in s:
            df_count[w] = df_count.get(w, 0) + 1
    w_of = {w: math.log10(n / c) for w, c in df_count.items()}
    for i in range(n):
        for j in range(i + 1, n):
            shared = sets[i] & sets[j]
            union = sum(w_of[w] for w in sets[i] | sets[j])
            if (i, j) in got:
                assert shared and union > 0, (i, j)
                inter = sum(w_of[w] for w in shared)
                assert abs(got[(i, j)] - round(inter / union, 6)) <= 1e-6
            else:
                # absent ⇒ no shared shingle, undefined 0/0, or a score
                # at/under the threshold once rounded
                if shared and union > 0:
                    inter = sum(w_of[w] for w in shared)
                    assert inter / union < 2e-6, (i, j)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.text(alphabet="pq r", min_size=0, max_size=30), min_size=1, max_size=6),
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=8, max_value=64),
)
def test_cms_estimates_match_python_sketch(texts, d, w):
    """cms_token_estimates == a straight-line Python count-min sketch
    with the same md5 hash family, for every token in the corpus."""
    import hashlib

    from kafka_streams_spark.operators.text import cms_token_estimates

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    stream = [tok for t in texts for tok in t.lower().split() if tok]
    if not stream:
        return
    vocab = sorted(set(stream))

    def bucket(j, tok):
        return int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:8], 16) % w

    counters: dict[tuple[int, int], int] = {}
    for tok in stream:
        for j in range(d):
            key = (j, bucket(j, tok))
            counters[key] = counters.get(key, 0) + 1
    got = {
        r["token"]: (r["cms_count"], r["exact_count"])
        for r in cms_token_estimates(df, vocab, d=d, w=w).collect()
    }
    for tok in vocab:
        est = min(counters.get((j, bucket(j, tok)), 0) for j in range(d))
        exact = sum(1 for s in stream if s == tok)
        assert got[tok] == (est, exact), tok


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.text(alphabet="mn o", min_size=1, max_size=25)),
        min_size=3,
        max_size=9,
    )
)
def test_ccnet_buckets_match_ntile_model(rows):
    """Per-lang bucket assignment == the Python ntile(3) model over the
    (rounded score desc, id) order."""
    from kafka_streams_spark.operators.text import ccnet_buckets

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t, lang) for i, (lang, t) in enumerate(rows)],
        "doc_id bigint, text string, lang string",
    )
    out = {r["doc_id"]: r for r in ccnet_buckets(df).collect()}
    # docs with ≥1 token only (the LM score drops token-less docs)
    scored = {i for i, (_, t) in enumerate(rows) if t.split()}
    assert set(out) == scored
    by_lang: dict[str, list] = {}
    for i in scored:
        by_lang.setdefault(rows[i][0], []).append(
            (-out[i]["avg_logprob"], i)
        )
    for lang, docs in by_lang.items():
        docs.sort()
        k = len(docs)
        base, extra = divmod(k, 3)
        sizes = [base + (1 if t < extra else 0) for t in range(3)]
        labels = ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
        for (_, i), want in zip(docs, labels):
            assert out[i]["bucket"] == want, (lang, i)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=24), min_size=1, max_size=8
    )
)
def test_ngram_novelty_matches_set_model(texts):
    """ngram_novelty == Python model: doc-frequency-1 share over per-doc
    DISTINCT shingles (docs shorter than n shingle to the whole doc)."""
    from kafka_streams_spark.operators.text import ngram_novelty

    spark = _spark()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in ngram_novelty(df, n=2).collect()
    }

    def grams(t):
        toks = t.lower().split()
        if len(toks) <= 2:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sets = {i: grams(t) for i, t in enumerate(texts)}
    from collections import Counter

    df_count = Counter(g for s in sets.values() for g in s)
    for i, s in sets.items():
        novel = sum(1 for g in s if df_count[g] == 1)
        assert got[i] == (len(s), novel)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.text(alphabet="xy ", min_size=0, max_size=20), min_size=1, max_size=5),
    st.lists(st.text(alphabet="yz ", min_size=0, max_size=20), min_size=1, max_size=5),
)
def test_corpus_overlap_matches_set_model(ta, tb):
    """corpus_overlap(n=1) == Python token-set Venn (empty docs emit no
    tokens; empty-union Jaccard convention is 1.0)."""
    from kafka_streams_spark.operators.text import corpus_overlap

    spark = _spark()
    a = spark.createDataFrame([(i, t) for i, t in enumerate(ta)], ["doc_id", "text"])
    b = spark.createDataFrame([(i, t) for i, t in enumerate(tb)], ["doc_id", "text"])
    r = corpus_overlap(a, b, n=1).collect()[0]
    sa = {w for t in ta for w in t.lower().split() if w}
    sb = {w for t in tb for w in t.lower().split() if w}
    assert (r["n_grams_a"], r["n_grams_b"], r["n_shared"]) == (
        len(sa),
        len(sb),
        len(sa & sb),
    )
    union = len(sa | sb)
    expect_j = 1.0 if union == 0 else len(sa & sb) / union
    assert abs(r["overlap_jaccard"] - expect_j) < 1e-12


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=6
    )
)
def test_dedup_spans_matches_python_model(texts):
    """dedup_substring_remove(k=2) == Python model: cover every 2-gram
    occurrence whose gram appears in a lower-id doc, union the
    intervals, keep the rest in order."""
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    k = 2
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    first: dict[tuple, int] = {}
    for i in sorted(toks):
        for p in range(len(toks[i]) - k + 1):
            g = tuple(toks[i][p : p + k])
            first.setdefault(g, i)
    expect = {}
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - k + 1):
            if first[tuple(tk[p : p + k])] < i:
                covered.update(range(p, p + k))
        kept = [w for j, w in enumerate(tk) if j not in covered]
        expect[i] = (" ".join(kept), len(tk), len(tk) - len(kept))
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_tokens_removed"])
        for r in dedup_substring_remove(df, k=k).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="pq ", min_size=1, max_size=24), min_size=1, max_size=4),
    st.lists(st.text(alphabet="qr ", min_size=1, max_size=24), min_size=1, max_size=4),
)
def test_contamination_report_matches_set_model(train_texts, bench_texts):
    """contamination_report(n=2) == Python model: per bench item, the
    share of its distinct 2-grams present in the train gram set."""
    from kafka_streams_spark.operators.pipelines import contamination_report

    spark = _spark()
    train = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(train_texts)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], ["doc_id", "text"]
    )

    def grams(t):
        toks = t.lower().split()
        if len(toks) <= 2:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    tset = {g for t in train_texts for g in grams(t)}
    got = {
        r["doc_id"]: (r["n_grams"], r["n_leaked"])
        for r in contamination_report(train, bench, n=2).collect()
    }
    for i, t in enumerate(bench_texts):
        s = grams(t)
        assert got[i] == (len(s), sum(1 for g in s if g in tset)), (i, t)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_duplicate_clusters_matches_union_find_model(raw_pairs):
    """Alternating-star CC == a Python union-find with min-id
    representatives, over random graphs including self-pairs, parallel
    edges, and multi-component topologies."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters

    spark = _spark()
    df = spark.createDataFrame(raw_pairs, "id_a bigint, id_b bigint")
    out_rows = duplicate_clusters(df).collect()
    got = {r["node"]: r["cluster_id"] for r in out_rows}
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want
    # one row per node — a self-pair beside a real edge must NOT emit
    # a second conflicting row (dict construction would mask it)
    assert len(out_rows) == len(want)


def test_duplicate_clusters_self_pair_with_real_edge(spark):
    """A node carrying both a self-pair and a real edge emits exactly
    one row — its component label, not an extra (x, x) singleton
    (regression: [(0,5),(9,7),(17,11),(12,11),(0,5),(9,9)] used to
    yield both (9,7) and (9,9))."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters

    df = spark.createDataFrame(
        [(0, 5), (9, 7), (17, 11), (12, 11), (0, 5), (9, 9)],
        "id_a bigint, id_b bigint",
    )
    rows = sorted((r["node"], r["cluster_id"]) for r in duplicate_clusters(df).collect())
    assert rows == [(0, 0), (5, 0), (7, 7), (9, 7), (11, 11), (12, 11), (17, 11)]


def test_duplicate_clusters_null_endpoint_pairs_dropped(spark):
    """A pair with a NULL endpoint carries no connectivity and is
    dropped (r12 ADVICE fix): greatest/least skip NULLs, so (NULL, x)
    used to canonicalize into a self-pair (x, x) and register x as a
    singleton — the pre-r11 NULL-rejecting comparisons dropped it.
    Both dispatch paths must agree."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters

    df = spark.createDataFrame(
        [(None, 4), (7, None), (None, None), (1, 2), (9, 9)],
        "id_a bigint, id_b bigint",
    )
    want = [(1, 1), (2, 1), (9, 9)]  # no 4, no 7
    for thr in (1_000_000, 0):  # local union-find and distributed star
        rows = sorted(
            (r["node"], r["cluster_id"])
            for r in duplicate_clusters(df, local_threshold=thr).collect()
        )
        assert rows == want, thr


def test_duplicate_clusters_deep_chain_logarithmic_rounds(spark):
    """A 64-node chain must converge well under the O(diameter) bound
    that plain propagation pays (64 rounds): max_iter=10 must suffice —
    the round count IS the edge-shuffle count at 100 TB."""
    from kafka_streams_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a bigint, id_b bigint"
    )
    labels = duplicate_clusters(chain, max_iter=10).collect()
    assert len(labels) == 64
    assert all(r["cluster_id"] == 0 for r in labels)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=4),
)
def test_oov_rate_matches_vocab_model(texts, vocab_size):
    """oov_rate == Python model: vocabulary is the top-V tokens by
    (count desc, token asc); per doc, n_tokens and the count of tokens
    outside that vocabulary; empty docs keep a zero row."""
    from collections import Counter

    from kafka_streams_spark.operators.text import oov_rate

    spark = _spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    counts = Counter(tok for t in texts for tok in t.lower().split())
    vocab = {
        tok
        for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate(docs, vocab_size=vocab_size).collect()
    }
    want = {
        i: (
            len(t.lower().split()),
            sum(1 for tok in t.lower().split() if tok not in vocab),
        )
        for i, t in enumerate(texts)
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_embedding_gram_matches_numpy_model(vecs):
    """embedding_gram == direct NumPy int64 sums over arbitrary floats
    (negatives, near-zero, float32 grid) — the order-independence and
    quantization claims, fuzzed."""
    import numpy as np

    from kafka_streams_spark.operators.similarity import embedding_gram

    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    s = 10**3
    X = np.asarray(vecs, dtype=np.float64)
    Xi = np.floor(X * s + 0.5).astype(np.int64)
    G = Xi.T @ Xi
    sums = Xi.sum(axis=0)
    got = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["sum_i"], r["sum_j"], r["sum_prod"])
        for r in embedding_gram(df, scale=s).collect()
    }
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == (len(vecs), sums[i], sums[j], G[i, j])


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="aB \t\n", min_size=0, max_size=30), min_size=1, max_size=8))
def test_dedup_normalized_matches_canon_model(texts):
    """dedup_normalized == Python model: groups keyed by sha256 of the
    lowercase/whitespace-collapsed canon, min-id winner, full count."""
    import hashlib
    import re
    from collections import defaultdict

    from kafka_streams_spark.operators.text import dedup_normalized

    spark = _spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    groups = defaultdict(list)
    for i, t in enumerate(texts):
        canon = re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip()
        groups[hashlib.sha256(canon.encode()).hexdigest()].append(i)
    want = {h: (min(ids), len(ids)) for h, ids in groups.items()}
    got = {
        r["norm_hash"]: (r["keep_id"], r["dup_count"])
        for r in dedup_normalized(docs).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # node id
            st.integers(min_value=0, max_value=6),    # component label
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=40),           # existing/new id split point
)
def test_leakage_incremental_matches_python_model(memberships, cut):
    """r9: leakage_safe_splits_incremental vs a direct Python model —
    random cluster shapes (including clusters wholly existing, wholly
    new, bridged, and conflicting), random existing/new partition of
    the id space. The model re-implements the three rules literally."""
    import hashlib

    spark = _spark()
    from kafka_streams_spark.operators.sampling import (
        leakage_safe_splits_incremental,
    )

    # components -> (node, cluster_id = min node of its component)
    by_label: dict[int, list[int]] = {}
    for node, lbl in memberships:
        by_label.setdefault(lbl, []).append(node)
    clusters = [
        (n, min(ns)) for ns in by_label.values() if len(ns) >= 2 for n in ns
    ]
    all_ids = sorted({n for n, _ in memberships} | {cut})
    existing = [i for i in all_ids if i < cut]
    new = [i for i in all_ids if i >= cut]

    def hash_split(key: int) -> str:
        b = hashlib.md5(str(key).encode()).hexdigest()[:2]
        return "test" if b < "0d" else ("val" if b < "1a" else "train")

    ex_splits = [(i, hash_split(i)) for i in existing]

    # python model
    cid = {n: c for n, c in clusters}
    ex_split_of = dict(ex_splits)
    model = {}
    for i in new:
        c = cid.get(i)
        members = [n for n, cc in clusters if cc == c] if c is not None else []
        ex_members = sorted(n for n in members if n in ex_split_of)
        if ex_members:
            adopt = ex_split_of[ex_members[0]]
            conflict = len({ex_split_of[n] for n in ex_members}) > 1
            model[i] = (adopt, conflict)
        else:
            model[i] = (hash_split(c if c is not None else i), False)

    out = {
        r["doc_id"]: (r["split"], r["leak_conflict"])
        for r in leakage_safe_splits_incremental(
            spark.createDataFrame([(i,) for i in new], "doc_id bigint"),
            spark.createDataFrame(
                ex_splits or [(None, None)], "doc_id bigint, split string"
            ).filter(F.col("doc_id").isNotNull()),
            spark.createDataFrame(
                clusters or [(None, None)], "node bigint, cluster_id bigint"
            ).filter(F.col("node").isNotNull()),
        ).collect()
    }
    assert out == model
