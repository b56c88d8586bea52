"""Round-5 queue wave: n-gram novelty, corpus overlap, contamination
report, duplicate-cluster histogram, gate agreement, k-center coreset."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kafka_streams_spark.sources.testdata import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_crafted(spark):
    from kafka_streams_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d"),  # grams: "a b c", "b c d"
        (2, "a b c e"),  # grams: "a b c", "b c e"
        (3, "x y z w"),  # grams: "x y z", "y z w" — all unique
    ]
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(_docs(spark, rows), n=3).collect()
    }
    # "a b c" appears in docs 1 and 2 → not novel; the other grams are.
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 1
    assert out[2]["n_grams"] == 2 and out[2]["n_novel"] == 1
    assert out[3]["n_grams"] == 2 and out[3]["n_novel"] == 2
    assert out[1]["novelty"] == 0.5 and out[3]["novelty"] == 1.0


def test_ngram_novelty_short_doc_whole_text_shingle(spark):
    from kafka_streams_spark.operators.text import ngram_novelty

    # Docs shorter than n shingle to the whole doc (word_shingles
    # semantics) — both docs collapse to the same single gram.
    rows = [(1, "hi there"), (2, "hi  THERE")]
    out = {r["doc_id"]: r for r in ngram_novelty(_docs(spark, rows), n=3).collect()}
    assert out[1]["n_grams"] == 1 and out[1]["n_novel"] == 0
    assert out[2]["novelty"] == 0.0


# ---------------------------------------------------------------------------
# corpus_overlap
# ---------------------------------------------------------------------------


def test_corpus_overlap_tokens(spark):
    from kafka_streams_spark.operators.text import corpus_overlap

    a = _docs(spark, [(1, "red green blue"), (2, "red cyan")])
    b = _docs(spark, [(3, "blue yellow"), (4, "yellow magenta")])
    r = corpus_overlap(a, b, n=1).collect()[0]
    # A = {red, green, blue, cyan}; B = {blue, yellow, magenta}
    assert r["n_grams_a"] == 4 and r["n_grams_b"] == 3
    assert r["n_shared"] == 1
    assert r["overlap_jaccard"] == 1.0 / 6.0


def test_corpus_overlap_bigrams_and_case(spark):
    from kafka_streams_spark.operators.text import corpus_overlap

    a = _docs(spark, [(1, "Big Data Rocks")])  # bigrams: "big data", "data rocks"
    b = _docs(spark, [(2, "big data stinks")])  # "big data", "data stinks"
    r = corpus_overlap(a, b, n=2).collect()[0]
    assert (r["n_grams_a"], r["n_grams_b"], r["n_shared"]) == (2, 2, 1)
    assert r["overlap_jaccard"] == 1.0 / 3.0


# ---------------------------------------------------------------------------
# contamination_report
# ---------------------------------------------------------------------------


def test_contamination_report_crafted(spark):
    from kafka_streams_spark.operators.pipelines import contamination_report

    train = _docs(spark, [(10, "the quick brown fox jumps"), (11, "lazy dog sleeps")])
    bench = _docs(
        spark,
        [
            (1, "the quick brown fox"),  # both 3-grams in train
            (2, "quick brown fox dances"),  # 1 of 2 in train
            (3, "totally novel eval item"),  # nothing leaked
        ],
    )
    out = {r["doc_id"]: r for r in contamination_report(train, bench, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_leaked"] == 2
    assert out[1]["leak_share"] == 1.0
    assert out[2]["n_grams"] == 2 and out[2]["n_leaked"] == 1
    assert out[3]["n_leaked"] == 0 and out[3]["leak_share"] == 0.0


# ---------------------------------------------------------------------------
# cluster_size_stats
# ---------------------------------------------------------------------------


def test_cluster_size_stats(spark):
    from kafka_streams_spark.operators.dedup import cluster_size_stats

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 6)],
        "node bigint, cluster_id bigint",
    )
    out = {r["cluster_size"]: r["n_clusters"] for r in cluster_size_stats(labels).collect()}
    assert out == {3: 1, 2: 2}


# ---------------------------------------------------------------------------
# quality_gate_agreement + the passes-expr refactor pins
# ---------------------------------------------------------------------------


def test_gopher_passes_expr_matches_operator(spark, sf_dir):
    from kafka_streams_spark.operators.text import gopher_passes_expr, gopher_quality

    docs = load_table(spark, sf_dir, "documents")
    via_op = gopher_quality(docs).select("doc_id", "passes_gopher")
    via_expr = docs.select(
        "doc_id", gopher_passes_expr(F.col("text")).alias("passes_gopher")
    )
    assert via_op.exceptAll(via_expr).count() == 0
    assert via_expr.exceptAll(via_op).count() == 0


def test_c4_passes_expr_matches_operator(spark, sf_dir):
    from kafka_streams_spark.operators.text import c4_clean, c4_passes_expr

    docs = load_table(spark, sf_dir, "documents")
    survivors = {
        r["doc_id"]
        for r in c4_clean(
            docs, min_words_per_line=60, require_terminal_punct=False
        ).collect()
    }
    flagged = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            c4_passes_expr(
                F.col("text"), min_words_per_line=60, require_terminal_punct=False
            ).alias("p"),
        ).collect()
        if r["p"]
    }
    assert survivors == flagged


def test_quality_gate_agreement_counts(spark, sf_dir):
    from kafka_streams_spark.operators.pipelines import quality_gate_agreement

    docs = load_table(spark, sf_dir, "documents")
    rows = quality_gate_agreement(
        docs, min_quality=0.5, min_words_per_line=60, require_terminal_punct=False
    ).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
    # combinations are unique
    combos = [(r["passes_gopher"], r["passes_c4"], r["passes_quality"]) for r in rows]
    assert len(combos) == len(set(combos))


# ---------------------------------------------------------------------------
# kcenter_select vs a NumPy reference model
# ---------------------------------------------------------------------------


def _kcenter_model(ids, vecs, k):
    order = np.argsort(ids)
    ids, vecs = np.asarray(ids)[order], np.asarray(vecs, dtype=np.float64)[order]
    picked = [0]
    out = [(1, int(ids[0]), 0.0)]
    mind = np.full(len(ids), np.inf)
    for rank in range(2, min(k, len(ids)) + 1):
        d = ((vecs - vecs[picked[-1]]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
        mind[picked] = -np.inf  # already selected: never re-picked
        best = np.lexsort((ids, -mind))[0]
        out.append((rank, int(ids[best]), float(np.sqrt(mind[best]))))
        picked.append(best)
    return out


def test_kcenter_matches_numpy_model(spark, sf_dir):
    from kafka_streams_spark.operators.similarity import kcenter_select

    embs = load_table(spark, sf_dir, "embeddings")
    rows = embs.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [[float(x) for x in r["embedding"]] for r in rows]
    expect = _kcenter_model(ids, vecs, 6)
    got = [
        (r["rank"], r["vec_id"], r["center_dist"])
        for r in kcenter_select(embs, k=6).orderBy("rank").collect()
    ]
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in expect]
    for (_, _, d_got), (_, _, d_exp) in zip(got, expect):
        assert abs(d_got - d_exp) < 1e-6


def test_kcenter_k_exceeding_corpus_stops_early(spark):
    from kafka_streams_spark.operators.similarity import kcenter_select

    embs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = kcenter_select(embs, k=10).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    # second pick is the farthest point (dist 5), third the remaining one
    assert out[1]["center_dist"] == 5.0


def test_kcenter_scalable_single_block_equals_exact(spark, sf_dir):
    """r9 large-k form: with n_blocks=1 the two-stage composition
    degenerates to the exact traversal (one block = the whole corpus,
    final stage re-traverses the same picks) — pick-for-pick and
    distance-for-distance equal to kcenter_select. This pins the shared
    argmax semantics (rounded-6dp squared distance, min-id tiebreak)
    across the distributed loop, the Arrow per-block path, and the
    driver-side final solve."""
    from kafka_streams_spark.operators.similarity import (
        kcenter_select,
        kcenter_select_scalable,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    exact = [tuple(r) for r in kcenter_select(embs, k=6).orderBy("rank").collect()]
    degen = [
        tuple(r)
        for r in kcenter_select_scalable(embs, k=6, n_blocks=1)
        .orderBy("rank")
        .collect()
    ]
    assert exact == degen


def test_kcenter_scalable_covering_radius_and_edges(spark, sf_dir):
    """The blocked form is an approximation, not pick-identical — what
    it MUST preserve is coverage: its covering radius (max over the
    corpus of distance-to-nearest-picked) stays within the composable-
    coreset bound of the exact traversal's (checked loosely at 2x —
    theory says the union of per-block 2-approx coresets keeps a
    constant factor). Plus edges: k > corpus stops early, string ids
    keep their type, empty corpus yields the empty frame."""
    from kafka_streams_spark.operators.similarity import (
        kcenter_select,
        kcenter_select_scalable,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    rows = embs.select("vec_id", "embedding").collect()
    vecs = np.asarray(
        [[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64
    )
    ids = [r["vec_id"] for r in rows]

    def radius(picked_ids):
        C = vecs[[ids.index(p) for p in picked_ids]]
        d2 = ((vecs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return float(np.sqrt(d2.min(axis=1).max()))

    exact = [r["vec_id"] for r in kcenter_select(embs, k=6).collect()]
    blocked = [
        r["vec_id"] for r in kcenter_select_scalable(embs, k=6, n_blocks=4).collect()
    ]
    assert len(blocked) == 6 and len(set(blocked)) == 6
    assert radius(blocked) <= 2.0 * radius(exact) + 1e-9

    tiny = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [3.0, 4.0]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = kcenter_select_scalable(tiny, k=10, n_blocks=2).orderBy("rank").collect()
    assert sorted(r["vec_id"] for r in out) == ["a", "b", "c"]
    assert out[0]["center_dist"] == 0.0

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kcenter_select_scalable(empty, k=3).count() == 0


# ---------------------------------------------------------------------------
# dedup_substring_remove
# ---------------------------------------------------------------------------


def test_dedup_substring_remove_crafted(spark):
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e z w q"),  # contains doc1's "a b c d e"
            (3, "totally different tokens here indeed"),
            (4, "x y a b c d e z w q"),  # exact copy of doc2 → fully covered
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_substring_remove(docs, k=5).collect()
    }
    assert out[1]["text_clean"] == "a b c d e f g h"  # first owner keeps
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text_clean"] == "x y z w q"
    assert out[2]["n_tokens_removed"] == 5
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_clean"] == "" and out[4]["n_tokens_removed"] == 10


def test_dedup_substring_remove_overlapping_spans_merge(spark):
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    # doc2 shares the 6-token run "a b c d e f" with doc1: two
    # overlapping 5-gram hits (pos 2 and 3) must merge to ONE covered
    # interval [2,7], not double-count.
    docs = _docs(spark, [(1, "a b c d e f"), (2, "z a b c d e f z z z")])
    out = {r["doc_id"]: r for r in dedup_substring_remove(docs, k=5).collect()}
    assert out[2]["text_clean"] == "z z z z"
    assert out[2]["n_tokens_removed"] == 6


def test_dedup_substring_remove_short_docs_pass_through(spark):
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < k tokens
    out = {r["doc_id"]: r for r in dedup_substring_remove(docs, k=5).collect()}
    assert out[1]["n_tokens_removed"] == 0 and out[2]["n_tokens_removed"] == 0
    assert out[2]["text_clean"] == "a b c"


# ---------------------------------------------------------------------------
# language_confusion / shard_skew_report
# ---------------------------------------------------------------------------


def test_language_confusion_matches_language_id(spark, sf_dir):
    """The fused single-scan guess expression must equal language_id's
    output exactly (same argmax, tiebreak, und rule)."""
    from kafka_streams_spark.operators.text import language_confusion, language_id

    docs = load_table(spark, sf_dir, "documents")
    via_op = (
        language_id(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "lang_guess")
        .count()
    )
    expect = {(r["lang"], r["lang_guess"]): r["count"] for r in via_op.collect()}
    got = {
        (r["lang"], r["lang_guess"]): r["n_docs"]
        for r in language_confusion(docs).collect()
    }
    assert got == expect
    # per-declared-language shares sum to 1
    from collections import defaultdict

    shares = defaultdict(float)
    for r in language_confusion(docs).collect():
        shares[r["lang"]] += r["share_of_declared"]
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-12, lang


def test_shard_skew_report_bounds(spark, sf_dir):
    """Every shard except the last per stratum must hold >= budget
    tokens (greedy contiguous fill); totals must equal the corpus."""
    from kafka_streams_spark.operators.sampling import (
        pack_token_shards,
        shard_skew_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = 4000
    report = {r["source"]: r for r in shard_skew_report(docs, budget=budget).collect()}
    packed = pack_token_shards(docs, budget=budget)
    loads = {
        (r["source"], r["shard_id"]): r["tok"]
        for r in packed.groupBy("source", "shard_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    from collections import defaultdict

    last_shard = defaultdict(int)
    for (src, sid), _ in loads.items():
        last_shard[src] = max(last_shard[src], sid)
    for (src, sid), tok in loads.items():
        if sid < last_shard[src]:
            assert tok >= budget, (src, sid, tok)
    for src, r in report.items():
        per_src = [t for (s, _), t in loads.items() if s == src]
        assert r["n_shards"] == len(per_src)
        assert r["total_tokens"] == sum(per_src)
        assert r["min_shard_tokens"] == min(per_src)
        assert r["max_shard_tokens"] == max(per_src)


def test_lsh_bucket_stats_pair_math(spark, sf_dir):
    """The per-table candidate-pair count must equal the Python model
    Σ n·(n−1)/2 over the REAL bucket occupancies (same signature UDF)."""
    from collections import Counter, defaultdict

    from kafka_streams_spark.operators.similarity import (
        _banded_signatures_arrow,
        lsh_bucket_stats,
        random_hyperplanes,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    planes = [random_hyperplanes(64, 6, 42 + 1000 * t) for t in range(8)]
    keys = embs.select(
        F.posexplode(_banded_signatures_arrow(planes)(F.col("embedding"))).alias(
            "t", "b"
        )
    ).collect()
    occ = defaultdict(Counter)
    for r in keys:
        occ[r["t"]][r["b"]] += 1
    got = {r["lsh_table"]: r for r in lsh_bucket_stats(embs).collect()}
    assert set(got) == set(occ)
    for t, c in occ.items():
        assert got[t]["n_buckets"] == len(c)
        assert got[t]["max_bucket"] == max(c.values())
        assert got[t]["n_candidate_pairs"] == sum(n * (n - 1) // 2 for n in c.values())


def test_dedup_media_exact(spark):
    from kafka_streams_spark.operators.multimodal import (
        dedup_media_exact,
        synthesize_media,
    )

    out = dedup_media_exact(synthesize_media(spark, 50, distinct_payloads=20)).collect()
    assert len(out) == 20
    # min-id winner: ids 0..19 survive; copies 3 for key<10, 2 for >=10 (50 = 2*20+10)
    assert {r["media_id"] for r in out} == set(range(20))
    copies = {r["media_id"]: r["n_copies"] for r in out}
    for k in range(20):
        assert copies[k] == (3 if k < 10 else 2)
    assert sum(copies.values()) == 50


def test_synthesize_media_distinct_payloads_validation(spark):
    import pytest

    from kafka_streams_spark.operators.multimodal import synthesize_media

    with pytest.raises(ValueError):
        synthesize_media(spark, 10, distinct_payloads=0)
    # default (no dup injection): all payloads distinct
    from kafka_streams_spark.operators.multimodal import dedup_media_exact

    assert dedup_media_exact(synthesize_media(spark, 30)).count() == 30


def test_event_transitions_full_model(spark, sf_dir):
    """Full matrix equality against a pandas model over the real
    events table (order = (epoch-nanos, event_id), per user)."""
    from collections import defaultdict

    from kafka_streams_spark.operators.analytics import event_transitions

    e = load_table(spark, sf_dir, "events")
    rows = e.select("user_id", "event_id", "ts", "event_type").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    got = {
        (r["event_type"], r["next_event_type"]): r["n_transitions"]
        for r in event_transitions(spark, sf_dir).collect()
    }
    assert got == dict(counts)


def test_dedup_spans_whitespace_normalization(spark):
    """Reassembly is SPACE-joined tokens: multi-space and tab runs in
    the input collapse (documented operator contract)."""
    from kafka_streams_spark.operators.dedup import dedup_substring_remove

    docs = _docs(spark, [(1, "a  b\tc   d e")])
    out = dedup_substring_remove(docs, k=3).collect()[0]
    assert out["text_clean"] == "a b c d e"
    assert out["n_tokens"] == 5 and out["n_tokens_removed"] == 0


# ---------------------------------------------------------------------------
# dedup_substring_remove_incremental / write_gram_index
# ---------------------------------------------------------------------------


def test_dedup_spans_incremental_crafted(spark):
    from kafka_streams_spark.operators.dedup import (
        dedup_substring_remove_incremental,
    )

    existing = _docs(spark, [(1, "a b c d e f g h")])
    new = _docs(
        spark,
        [
            (10, "x y a b c d e z w q"),  # loses existing's "a b c d e"
            (11, "totally different tokens here indeed"),
            (12, "x y a b c d e z w q"),  # same as 10 — BOTH keep novel
            # text: increment-internal dup is out of scope by contract
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_substring_remove_incremental(new, existing, k=5).collect()
    }
    assert set(out) == {10, 11, 12}  # existing docs are not emitted
    assert out[10]["text_clean"] == "x y z w q"
    assert out[10]["n_tokens_removed"] == 5
    assert out[11]["n_tokens_removed"] == 0
    assert out[12]["text_clean"] == "x y z w q"


def test_dedup_spans_incremental_gram_index_roundtrip(spark, tmp_path):
    from kafka_streams_spark.operators.dedup import (
        dedup_substring_remove_incremental,
        read_gram_index,
        write_gram_index,
    )

    existing = _docs(spark, [(1, "a b c d e f g h")])
    new = _docs(spark, [(10, "x y a b c d e z w q")])
    path = str(tmp_path / "grams")
    write_gram_index(existing, path, k=5)
    idx = read_gram_index(spark, path)
    via_index = dedup_substring_remove_incremental(
        new, existing_grams=idx, k=5
    ).collect()
    inline = dedup_substring_remove_incremental(new, existing, k=5).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, inline))


def test_dedup_spans_incremental_k_mismatch_rejected(spark, tmp_path):
    import pytest

    from kafka_streams_spark.operators.dedup import (
        dedup_substring_remove_incremental,
        read_gram_index,
        write_gram_index,
    )

    existing = _docs(spark, [(1, "a b c d e f g h")])
    path = str(tmp_path / "grams")
    write_gram_index(existing, path, k=5)
    idx = read_gram_index(spark, path)
    with pytest.raises(ValueError, match="k=5"):
        dedup_substring_remove_incremental(
            _docs(spark, [(10, "a b c d e")]), existing_grams=idx, k=3
        )


def test_dedup_spans_incremental_requires_one_side(spark):
    import pytest

    from kafka_streams_spark.operators.dedup import (
        dedup_substring_remove_incremental,
    )

    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="exactly one"):
        dedup_substring_remove_incremental(d)
    with pytest.raises(ValueError, match="exactly one"):
        dedup_substring_remove_incremental(d, d, existing_grams=d)


# ---------------------------------------------------------------------------
# perceptual media near-dup (pHash + hamming pigeonhole)
# ---------------------------------------------------------------------------


def test_hamming_pairs_nonzero_distance_vs_brute_force(spark):
    """The generic pigeonhole must find ALL pairs within the radius —
    including non-zero distances — and nothing outside it. Crafted
    signatures with known pairwise distances, checked against an exact
    brute force computed in Python."""
    from itertools import combinations

    from kafka_streams_spark.operators.dedup import hamming_pairs

    sigs = [
        (1, 0b101010),
        (2, 0b101011),          # d(1,2)=1
        (3, 0b101010 ^ 0b111),  # d(1,3)=3
        (4, (1 << 59) | 0b101010),  # d(1,4)=1 in the high chunk
        (5, 0),
    ]
    df = spark.createDataFrame(sigs, "id bigint, sig bigint")
    for r in (1, 3):
        want = sorted(
            (a, b, bin(sa ^ sb).count("1"))
            for (a, sa), (b, sb) in combinations(sigs, 2)
            if bin(sa ^ sb).count("1") <= r
        )
        got = sorted(map(tuple, hamming_pairs(df, "id", "sig", 60, r).collect()))
        assert got == want, (r, got, want)


def test_media_phash_matches_expression_form(spark):
    """The Arrow decode pass (where a real codec computes pHash from
    pixels) must emit exactly the md5_60 of the payload bytes — pinned
    against the pure-expression JVM form."""
    from pyspark.sql import functions as F

    from kafka_streams_spark.operators.multimodal import media_phash, synthesize_media

    media = synthesize_media(spark, 40)
    arrow = {r["media_id"]: r["phash"] for r in media_phash(media).collect()}
    expr = {
        r["media_id"]: r["ph"]
        for r in media.select(
            "media_id",
            F.conv(F.substring(F.md5("payload"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("ph"),
        ).collect()
    }
    assert arrow == expr


def test_dedup_media_near_finds_exact_copies_and_prunes_payload(spark):
    """Exact duplicate payloads are hamming-0 pairs; the banding shuffle
    carries only (media_id, phash) — payload bytes never enter an
    exchange."""
    from kafka_streams_spark.operators.multimodal import (
        dedup_media_near,
        synthesize_media,
    )

    from kafka_streams_spark.operators.multimodal import media_phash

    media = synthesize_media(spark, 30, distinct_payloads=10)
    out = dedup_media_near(media, max_hamming=4)
    rows = out.collect()
    zero = {(r["id_a"], r["id_b"]) for r in rows if r["hamming"] == 0}
    # ids i, i+10, i+20 share payloads → 3 pairs per group × 10 groups
    want = {
        (i + 10 * a, i + 10 * b)
        for i in range(10)
        for a, b in ((0, 1), (0, 2), (1, 2))
    }
    assert zero == want
    # bytes-stay-put: the Arrow pass's OUTPUT schema has no payload
    # column, so no downstream exchange can ever carry the bytes...
    assert set(media_phash(media).columns) == {"media_id", "phash"}
    # ...and with a multi-partition fixture the one exchange that does
    # run is the banding shuffle on (chunk_idx, chunk_val).
    big = dedup_media_near(
        synthesize_media(spark, 200, distinct_payloads=120), max_hamming=4
    )
    big.collect()
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(chunk_idx" in plan, plan


def test_dedup_media_near_strategies_agree(spark):
    """pigeonhole / brute / auto produce identical media pairs."""
    from kafka_streams_spark.operators.multimodal import (
        dedup_media_near,
        synthesize_media,
    )

    media = synthesize_media(spark, 40, distinct_payloads=15)
    outs = {
        s: sorted(
            map(tuple, dedup_media_near(media, max_hamming=6, strategy=s).collect())
        )
        for s in ("pigeonhole", "brute", "auto")
    }
    assert outs["pigeonhole"] == outs["brute"] == outs["auto"]


def test_kcenter_scalable_validates_params(spark):
    import pytest

    from kafka_streams_spark.operators.similarity import kcenter_select_scalable

    embs = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kcenter_select_scalable(embs, k=0)
    with pytest.raises(ValueError):
        kcenter_select_scalable(embs, k=2, n_blocks=0)
    with pytest.raises(ValueError):
        kcenter_select_scalable(embs, k=2, per_block=0)


# ---------------------------------------------------------------------------
# keep_best_per_cluster
# ---------------------------------------------------------------------------


def test_keep_best_per_cluster(spark):
    """Quality argmax per cluster: highest quality wins, score ties
    break to the LOWEST id, singletons (no label row) are kept."""
    from kafka_streams_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id bigint"
    )
    labels = spark.createDataFrame(
        # cluster 1 = {1,2,3}; cluster 4 = {4,5}; 6,7 singletons
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "node bigint, cluster_id bigint",
    )
    score = spark.createDataFrame(
        # cluster 1: doc 2 highest -> kept; cluster 4: 4 and 5 tie at
        # 0.5 -> lowest id (4) kept
        [(1, 0.25), (2, 0.75), (3, 0.5), (4, 0.5), (5, 0.5),
         (6, 0.0), (7, 1.0)],
        "doc_id bigint, quality double",
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["kept"])
        for r in keep_best_per_cluster(docs, labels, score).collect()
    }
    assert rows == {
        1: (1, False),
        2: (1, True),
        3: (1, False),
        4: (4, True),
        5: (4, False),
        6: (6, True),   # singleton: own cluster, kept
        7: (7, True),
    }
    # exactly one survivor per real cluster
    out = keep_best_per_cluster(docs, labels, score)
    per_cluster = (
        out.filter("kept").groupBy("cluster_id").count().collect()
    )
    assert all(r["count"] == 1 for r in per_cluster)
