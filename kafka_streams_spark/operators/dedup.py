"""Deduplication operators for large-scale training-data pipelines.

Hashing, banding, bucketing, and verification are pure Column
expressions (JVM-side, whole-stage codegen). The one measured
exception is SHINGLING: Spark evaluates higher-order-function lambdas
(transform/slice/concat_ws) interpreted, never codegen'd, and the
Arrow-batched shingler ran 6× faster at sf0.1 (see word_shingles) —
same rule as text.repetition_stats: expressions first, but the
tie-breaker is the measured plan. Near-dup detection never
materializes the O(n²) pair space: candidates come from LSH bucket
self-joins (MinHash banding / SimHash chunking / hyperplane buckets),
which at 100 TB is the difference between a shuffle of ~n·bands rows
and an impossible cross join. Exact verification runs only on
bucket-collision candidates.

Capability lineage: the reference has no dedup operators; this is the
north-star scope from BASELINE.json (LLM-data-pipeline operators), built
on the `documents` / `embeddings` testdata tables.
"""

from __future__ import annotations

import functools

from kafka_streams_spark.functions.partitioning import materialize_shared

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as _types
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per duplicate group.

    A hash-shuffle groupBy with map-side partial min — one shuffle of the
    key columns only. Deterministic winner (min id), unlike
    ``dropDuplicates`` whose survivor is arrival-order dependent — that
    matters for reproducible corpus builds.
    """
    keep = F.min(id_col).alias("keep_id")
    return df.groupBy(*key_cols).agg(keep, F.count("*").alias("dup_count"))


def dedup_exact_rows(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Return the surviving rows themselves (min-id winner per group).

    Window-rank formulation: one shuffle, no self-join back.
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_incremental(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    existing_hash_col: str | None = None,
) -> DataFrame:
    """Dedup a corpus INCREMENT against an already-curated corpus — the
    recurring-crawl shape: yesterday's 100 TB is final, today's delta
    must not re-admit content already in it (nor its own duplicates).

    Two exact steps on a content hash:
    1. left-anti join increment → existing on md5(text): only the
       hashes shuffle (existing projects to one 32-char column, never
       its payload), and the anti join is the smallest possible
       membership test Catalyst can plan (broadcast when the delta-day
       hash set fits, shuffled-hash otherwise — AQE picks).
    2. min-id winner within the increment itself (window rank, one
       shuffle) — arrivals inside the same delta dedupe deterministically.

    Near-dup variant: feed the survivors to minhash_lsh_pairs against a
    persisted signature table; this operator is the exact gate in front
    of it.

    ``existing_hash_col``: when the corpus already PERSISTS the content
    hash (e.g. the ingest stream's ``src_md5`` — the md5 of the text as
    it ARRIVED, before any span surgery rewrote the stored body), gate
    against that column instead of re-hashing the stored text; a stored
    body that no longer equals the arrival text would otherwise let the
    same original document re-enter (r7 review wave 5).

    NULL text hashes as the EMPTY STRING (md5(coalesce(text, ''))) so
    the convention is coherent across batch boundaries: the raw
    md5(text) was NULL, which the anti-join never matched (NULL !=
    NULL in join equality) while the within-batch window grouped NULLs
    together — the same two contentless docs deduped or not depending
    on which ingest batch they arrived in (r10 review fix).
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    if existing_hash_col is not None:
        seen = existing.select(F.col(existing_hash_col).alias("_h")).distinct()
    else:
        seen = existing.select(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")).distinct()
    fresh = new_docs.withColumn("_h", h).join(seen, "_h", "left_anti")
    w = Window.partitionBy("_h").orderBy(F.col(id_col))
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )


def _bloom_pos(h: Column, probe: int, m_bits: int) -> Column:
    """Bit position of probe ``probe`` for content hash ``h``: the first
    15 hex chars of md5(h || probe) as a 60-bit integer, mod ``m_bits``.
    Same md5_60 construction as text.winnowing_fingerprint — uniform,
    engine-reproducible (DuckDB: ``conv``-free via hex parse), pure
    codegen expressions."""
    g = F.concat(h, F.lit(str(probe)))
    return F.pmod(
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"), F.lit(m_bits)
    )


def bloom_bitmap(
    existing: DataFrame, text_col: str = "text", m_bits: int = 1 << 18, k: int = 4
) -> DataFrame:
    """Build a Bloom-filter bitmap over ``md5(text_col)`` of the corpus as a
    TABLE of 64-bit words: ``(word_idx int, word bigint)`` with at most
    ``m_bits / 64`` rows — the distributed representation of a bit array.

    Built entirely with aggregations (explode k probe positions →
    group by word index → ``bit_or`` of single-bit masks), so the 100 TB
    corpus never leaves the executors and no driver-side bitset exists.
    The result is tiny (m_bits/64 rows ≤ a few thousand) and broadcasts.

    Size m_bits for the corpus cardinality n: false-positive rate is
    ~(1 - e^(-k·n/m))^k; at m/n = 16 and k = 4 that is ~0.24 %. At
    100 TB scale pass m_bits in the billions — the table is still only
    m/64 rows of 12 bytes.
    """
    seen = existing.select(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")).distinct()
    pos = seen.select(
        F.explode(F.array(*[_bloom_pos(F.col("_h"), j, m_bits) for j in range(k)])).alias("_p")
    )
    return pos.groupBy(F.shiftright("_p", 6).alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p, 64) AS INT))")).alias("word")
    )


def dedup_incremental_bloom(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """:func:`dedup_incremental` with a Bloom pre-gate — identical output
    (Bloom filters have no false negatives, so every true duplicate still
    reaches the exact verify), but at 100 TB only the Bloom-PASSING
    fraction of the increment enters the hash anti-join.

    Why it matters at scale: when yesterday's corpus hash set no longer
    fits in a broadcast, the exact anti-join shuffles BOTH sides. The
    bitmap from :func:`bloom_bitmap` always broadcasts (m_bits/64 rows),
    and probing it is k map-side broadcast hash joins — no shuffle. A
    clean increment (the common crawl-delta case) is mostly
    definite-new: those rows skip the anti-join entirely and only the
    ~FP-rate remainder plus the true duplicates shuffle.

    Plan shape: k broadcast joins (map-only) → two filter legs off the
    probed frame (definite-new / maybe-seen, the branch_by_currency
    fan-out pattern) → exact anti-join on the maybe leg only → union →
    min-id winner window within the increment.
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    bitmap = bloom_bitmap(existing, text_col=text_col, m_bits=m_bits, k=k)
    probed = new_docs.withColumn("_h", h)
    for j in range(k):
        p = _bloom_pos(F.col("_h"), j, m_bits)
        probed = probed.withColumn(f"_w{j}", F.shiftright(p, 6)).withColumn(
            f"_b{j}", p % 64
        )
        # Alias (not rename) the bitmap per probe: the subtree under the
        # BroadcastExchange stays canonical-identical across all k joins,
        # so Spark builds the bitmap ONCE and reuses the exchange
        # (ReusedExchange ×(k-1) — pinned by the plan-audit test).
        bm = bitmap.alias(f"_bm{j}")
        probed = (
            probed.join(
                F.broadcast(bm),
                F.col(f"_w{j}") == F.col(f"_bm{j}.word_idx"),
                "left",
            )
            .withColumn(
                f"_hit{j}",
                F.col(f"_bm{j}.word").isNotNull()
                & (
                    F.expr(f"shiftright(_bm{j}.word, CAST(_b{j} AS INT)) & 1")
                    == 1
                ),
            )
            .drop(F.col(f"_bm{j}.word_idx"))
            .drop(F.col(f"_bm{j}.word"))
        )
    passes = functools.reduce(
        lambda a, b: a & b, [F.col(f"_hit{j}") for j in range(k)]
    )
    aux = [c for j in range(k) for c in (f"_w{j}", f"_b{j}", f"_hit{j}")]
    probed = probed.withColumn("_maybe", passes).drop(*aux)
    definite_new = probed.filter(~F.col("_maybe"))
    seen = existing.select(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")).distinct()
    survivors = probed.filter(F.col("_maybe")).join(seen, "_h", "left_anti")
    fresh = definite_new.unionByName(survivors).drop("_maybe")
    w = Window.partitionBy("_h").orderBy(F.col(id_col))
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )


# ---------------------------------------------------------------------------
# tokenization / shingling shared helpers (pure exprs)
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens with empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")



# THE reference whitespace tokenizer for every Arrow closure in this
# package: the ASCII class [ \t\n\x0b\x0c\r]+ — EXACTLY what the
# `tokens` expression (Java regex \s+), word_shingles_expr, and the
# DuckDB oracles' string_split_regex('\s+') (RE2) split on. Bare
# str.split() is WRONG here: Python splits on unicode whitespace too
# (\xa0, \u2009, \x1c-\x1f), so an Arrow op and its expression/SQL
# twin would tokenize "foo\xa0bar" differently — a real divergence
# found by the r8 review (pinned in tests/test_differential_fuzz.py's
# unicode-whitespace docs and tests/test_corpus_ops.py's pin test).
# Each closure below re-defines this pattern LOCALLY (self-contained
# closures ship by value — the launch-dir-independence convention);
# the pin test asserts the inline copies equal this definition.
_WS_ASCII = r"[ \t\n\x0b\x0c\r]+"


def _ws_split(s: str) -> list[str]:
    """Reference implementation: ASCII-whitespace split, empties
    dropped (== the `tokens` expression)."""
    import re as _re

    return [t for t in _re.split(_WS_ASCII, s) if t]


@functools.lru_cache(maxsize=None)
def _arrow_shingler(n: int):
    @F.pandas_udf(ArrayType(StringType()))
    def shingles(text: pd.Series) -> pd.Series:
        import re as _re

        _ws = _re.compile(r"[ \t\n\x0b\x0c\r]+")  # == _WS_ASCII
        out = []
        for s in text:
            toks = [t for t in _ws.split((s or "").lower()) if t]
            if len(toks) <= n:
                out.append([" ".join(toks)])
            else:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
        return pd.Series(out)

    return shingles


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>, Arrow-batched.

    Measured exception to expressions-first: the expression form
    (:func:`word_shingles_expr`) walks an interpreted lambda tree per
    offset — higher-order functions never enter whole-stage codegen —
    and exploding sf0.1's shingles took 2.75 s vs 0.45 s for this
    Arrow-batched twin. Semantics are IDENTICAL by construction:
    the closure splits on the ASCII class ``_WS_ASCII`` == the
    `tokens` expression's \\s+ == the DuckDB oracle's tokenizer (bare
    ``str.split()`` would also split unicode whitespace — the r8
    divergence find), `dict.fromkeys` preserves
    first-occurrence order exactly like `array_distinct`, and docs
    shorter than n words yield the whole doc as a single shingle.

    DEGENERATE-INPUT NOTE: a zero-token (blank/NULL) doc yields the
    single shingle [''] — so every blank page in a corpus shares one
    posting/band, the canonical stop-shingle. Deliberate (blank docs
    ARE mutual duplicates, and the fuzz corpus pins the [''] case on
    both engines), but it means the near-dup family must not meet a
    blank-heavy corpus unguarded: run exact dedup first (the curation
    pipelines do), and the pricing pre-flights (posting_pair_stats /
    max_df_for_budget / lsh_bucket_stats / stop_band_cap) exist
    precisely to surface and cap the ''-posting's quadratic candidate
    mass before any pair join runs.
    """
    return _arrow_shingler(n)(text)


def word_shingles_expr(text: Column, n: int = 3) -> Column:
    """Pure-expression twin of :func:`word_shingles` (kept for JVM-only
    pipelines where a Python worker round-trip is unavailable): slice a
    token array at every offset via transform over a 0..len-n
    sequence."""
    toks = tokens(text)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def token_set_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (assumed distinct elements)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs.

    With ``block_col`` (e.g. `source`, a language, a length bucket) the
    self-join runs per block — the O(n²) blowup is confined to blocks,
    which is how exact verification stays feasible at scale. Without a
    block column this is a full cross join: only for small candidate sets
    (prefer :func:`minhash_lsh_candidates` to generate candidates first).

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    from kafka_streams_spark.functions.partitioning import spread

    # Self-joined a/b — materialize the Arrow shingle table once
    # (exchange reuse never dedups Arrow subtrees; see
    # weighted_jaccard_pairs for the measurement and caveats).
    sh = spread(docs, block_col).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )
    sh = materialize_shared(sh)
    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    # Bind sizes/intersection as columns so each is evaluated once per
    # pair (inlining the jaccard expression would evaluate the O(|set|)
    # intersection twice — it appears in numerator and denominator).
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
            .cast("double")
            .alias("_inter"),
            (F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")))
            .cast("double")
            .alias("_sizes"),
        )
        .select(
            "id_a",
            "id_b",
            F.when(F.col("_sizes") - F.col("_inter") == 0, F.lit(1.0))
            .otherwise(F.col("_inter") / (F.col("_sizes") - F.col("_inter")))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle-set CONTAINMENT:
    max(|A∩B|/|A|, |A∩B|/|B|) ≥ threshold. Catches what Jaccard
    structurally cannot — a short document verbatim-embedded in a much
    longer one has tiny Jaccard (|A∩B|/|A∪B| shrinks with the length
    gap) but containment 1.0 from the short side. This is the Broder
    (1997) containment measure; quote/boilerplate/subset dedup uses it
    where symmetric near-dup uses Jaccard.

    Same blocked self-join shape (and the same scale rule) as
    :func:`ngram_jaccard_pairs`: the O(block²) pair space is confined to
    ``block_col`` groups. The LSH analogue for containment at 100 TB is
    a bottom-k sketch (MinHash bands estimate Jaccard, not containment);
    until one is wired, route big corpora through
    :func:`minhash_lsh_candidates` with a low threshold and rescore the
    candidates with this metric — see ``substring_overlap_pairs`` for
    the fingerprint-join alternative on verbatim spans.

    Output: (id_a, id_b, containment) with id_a < id_b, where
    containment = the max over the two directions.
    """
    from kafka_streams_spark.functions.partitioning import spread

    # Self-joined a/b — materialize the Arrow shingle table once
    # (exchange reuse never dedups Arrow subtrees; 3.4 → 2.0 s warm at
    # sf0.1, same caveats as weighted_jaccard_pairs).
    sh = spread(docs, block_col).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )
    sh = materialize_shared(sh)
    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
            .cast("double")
            .alias("_inter"),
            F.least(F.size(F.col("a.shingles")), F.size(F.col("b.shingles")))
            .cast("double")
            .alias("_min_sz"),
        )
        .select(
            "id_a",
            "id_b",
            F.when(F.col("_min_sz") == 0, F.lit(0.0))
            .otherwise(F.col("_inter") / F.col("_min_sz"))
            .alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via prefix filtering (AllPairs/PPJoin
    family) — the scalable formulation of :func:`ngram_jaccard_pairs`,
    identical output.

    Instead of scoring every in-block pair (O(n²) array-intersects —
    impossible at 100 TB), exploit the prefix-filter property: order all
    shingles by (document frequency, shingle) and keep only each doc's
    first ``⌊(1-t)·|d|⌋ + 1`` shingles; any pair with Jaccard ≥ t must
    share a prefix shingle. Candidates come from a posting-list self-join
    on those prefixes — rarity-first ordering keeps posting lists short
    (stopword shingles never enter a prefix at high t) — and only
    candidates pay the exact verify.

    Cost shape: a few narrow shuffles of (doc, shingle) rows sized by
    corpus token count, then per-candidate verification — vs the blocked
    variant's pairs×|set| compute that grows quadratically with block
    size regardless of similarity.

    Applicability (measured, sf0.1): prefix filtering pays off when the
    shingle space is SPARSE relative to the corpus — posting lists stay
    short and candidates ≪ pairs (bigrams here: 7.9 s vs 11.2 s blocked,
    and the gap grows with block size). On a DENSE shingle space it
    cannot filter: this corpus has a 620-token unigram vocabulary, so
    every "rare" token still lists ~1000 docs and candidate generation
    approaches all-pairs while paying the extra freq/window/verify
    stages (unigrams@0.8: ~11 s vs 3.9 s blocked). Rule: n-grams (n≥2),
    real-text vocabularies, URL/shingle keys → prefix; tiny controlled
    vocabularies or within-small-block exact checks → blocked.

    The prefix posting table is ``persist()``-ed — it is small (a few
    shingles per doc), read by BOTH sides of the candidate self-join,
    and sits above the freq-join + window, so caching it halves the
    heavy stages (A/B at sf0.1: 14.2 s no-persist → ~5-6 s). The full
    shingle-array table is deliberately NOT cached: columnar cache
    conversion of wide string arrays costs more than re-running the
    Arrow shingler per verify branch. The cache is dropped by the
    ContextCleaner when unreferenced; at 100 TB this intermediate is
    what you'd write to parquet once (a shingle index) instead.
    """
    from kafka_streams_spark.functions.partitioning import spread

    blk = [F.col(block_col)] if block_col else []
    blk_names = [block_col] if block_col else []
    sh = materialize_shared(
        spread(docs, block_col).select(
            F.col(id_col),
            *blk,
            word_shingles(F.col(text_col), n).alias("shingles"),
        )
    )
    tok = sh.select(
        F.col(id_col),
        *blk,
        F.size("shingles").alias("sz"),
        F.explode("shingles").alias("s"),
    )
    freq = tok.groupBy(*blk_names, "s").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "s")
    # 1e-9 slack mirrors the AllPairs length filter below: sz*t can
    # round UP past the exact integer in IEEE doubles (100*0.07 ->
    # 7.000000000000001), making the prefix one shingle too short and
    # silently missing exact-boundary pairs the blocked form (and the
    # oracle) emits (r10 review fix)
    prefix_len = (
        F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold) - F.lit(1e-9)) + 1
    )
    from kafka_streams_spark.functions.partitioning import floor_width

    # pinned-width exchange before the per-doc row_number window: the
    # sub-MB (doc, shingle, df) shuffle gets AQE-coalesced to ONE task
    # (r15 stage profile: 0.25 s serial building the prefix table) —
    # the same wrong-byte-cost-model class as the weighted_jaccard pin
    prefix = (
        tok.join(freq, [*blk_names, "s"])
        .repartition(floor_width(docs.sparkSession), id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        # _rn (the shingle's rank in the doc's canonical (df, s) order)
        # rides along for the positional filter below
        .select(F.col(id_col), *blk, "s", "sz", "_rn")
        .persist()  # both sides of the candidate self-join read it
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cond = (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # AllPairs length filter: J(a,b) ≥ t ⟹ |∩| ≥ t·|∪| ≥ t·max(|a|,|b|),
    # and |∩| ≤ min(|a|,|b|) — so min ≥ t·max. Shingle arrays are distinct
    # by construction (word_shingles), so sz IS the set size. Prunes
    # size-mismatched candidates before the (heavier) verify joins; the
    # 1e-9 slack keeps an FP product that grazes an integer boundary from
    # wrongly excluding an exact-boundary pair.
    t = F.lit(float(threshold))
    cond = (
        cond
        & (F.col("b.sz") >= t * F.col("a.sz") - F.lit(1e-9))
        & (F.col("a.sz") >= t * F.col("b.sz") - F.lit(1e-9))
    )
    for c in blk_names:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # PPJoin positional filter (Xiao et al. 2008, public) in aggregate
    # form — replaces the bare `.distinct()` (same single shuffle, now
    # with a map-side partial agg) and prunes candidates whose overlap
    # UPPER BOUND provably misses the threshold, so they never reach
    # the O(|set|) exact verify. Soundness: order all shingles by the
    # canonical (df, s); let x* be the largest shingle matched by the
    # prefix self-join, at ranks i* (in a) and j* (in b). Any common
    # shingle y ranked before x* has rank < i* ≤ prefix_len(a) in a
    # (and likewise in b), i.e. y is itself a prefix-prefix match and
    # is counted in c; all other common shingles rank after x* in both
    # docs, so their count is ≤ min(sza−i*, szb−j*). Hence
    # |a∩b| ≤ c + min(sza−i*, szb−j*), and J ≥ t ⟺
    # |a∩b| ≥ t·(sza+szb)/(1+t). The 1e-9 slack keeps an FP product
    # grazing an integer from wrongly excluding an exact-boundary pair
    # (the prefix_len convention above). Measured at sf0.1 bigrams
    # θ=0.5: 253,813 → 65,051 candidates, output identical (7 pairs).
    cands = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._rn").alias("_ia"),
            F.col("b._rn").alias("_jb"),
            F.col("a.sz").alias("_sza"),
            F.col("b.sz").alias("_szb"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max("_ia").alias("_ia"),
            F.max("_jb").alias("_jb"),
            F.first("_sza").alias("_sza"),
            F.first("_szb").alias("_szb"),
        )
        .filter(
            F.col("_c")
            + F.least(F.col("_sza") - F.col("_ia"), F.col("_szb") - F.col("_jb"))
            >= t * (F.col("_sza") + F.col("_szb")) / (F.lit(1.0) + t) - F.lit(1e-9)
        )
        .select("id_a", "id_b")
    )
    sets = sh.select(F.col(id_col), "shingles")
    return (
        cands.join(sets.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            token_set_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_bitset(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    max_vocab: int = 4096,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs for DENSE, SMALL shingle vocabularies
    — the third physical form behind :func:`ngram_jaccard_pairs_auto`.

    Precondition (checked): the corpus-wide distinct shingle count fits
    ``max_vocab``. Each document's shingle set is then encoded as a
    fixed-width bitmask (``ceil(|V|/64)`` longs) in one Arrow pass, and
    the in-block self-join computes ``|∩|`` as Σ bit_count(a_i & b_i) —
    a handful of codegen'd AND+popcounts per pair instead of building a
    hash set over two ~|V|-element string arrays per pair (the blocked
    form's cost). Measured at sf0.1 unigrams (620-token vocabulary):
    the verify join drops from ~3.5 s to well under a second; output is
    bit-identical (same integer ∩/∪ → same double).

    The vocabulary is collected once at plan-construction time (tiny by
    precondition — it IS the density condition that routes here; ≤
    max_vocab strings) and shipped to the Arrow encoder as a closure
    literal — same "stats pick the plan" class as the dispatch jobs.
    Raises ``ValueError`` if the vocabulary exceeds ``max_vocab``:
    callers (the dispatcher) treat that as "not the dense-small case".

    An AllPairs length prefilter (min ≥ t·max on set sizes) prunes
    size-mismatched pairs before the mask compare.
    """
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streams_spark.functions.partitioning import spread

    vocab_rows = (
        spread(docs)
        .select(F.explode(word_shingles(F.col(text_col), n)).alias("s"))
        .distinct()
        .limit(max_vocab + 1)
        .collect()
    )
    if len(vocab_rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; use the blocked or "
            "prefix form"
        )
    index = {r["s"]: i for i, r in enumerate(sorted(vocab_rows, key=lambda r: r["s"]))}
    n_words = max(1, math.ceil(len(index) / 64))

    id_field = docs.schema[id_col]
    blk_fields = [docs.schema[block_col]] if block_col else []
    out_schema = StructType(
        [id_field, *blk_fields, StructField("sz", LongType())]
        + [StructField(f"m{j}", LongType()) for j in range(n_words)]
    )
    cols = [id_col] + ([block_col] if block_col else []) + [text_col]
    nn, idx_map, words = n, index, n_words
    has_blk = block_col is not None

    # self-contained closure: shipped by value to Python workers; the
    # tokenization mirrors word_shingles (_WS_ASCII split + dict.fromkeys)
    def encode(batches):
        import re as _re

        import numpy as _np
        import pandas as _pd

        _ws = _re.compile(r"[ \t\n\x0b\x0c\r]+")  # == _WS_ASCII
        keys = ["_id"] + (["_blk"] if has_blk else []) + ["sz"] + [f"m{j}" for j in range(words)]
        for pdf in batches:
            out = {c: [] for c in keys}
            for row in pdf.itertuples(index=False):
                rid, text = row[0], row[-1]
                toks = [t for t in _ws.split((text or "").lower()) if t]
                if len(toks) <= nn:
                    sh = {" ".join(toks)}
                else:
                    sh = dict.fromkeys(
                        " ".join(toks[j : j + nn]) for j in range(len(toks) - nn + 1)
                    )
                masks = _np.zeros(words, dtype=_np.uint64)
                for s in sh:
                    i = idx_map.get(s)
                    if i is None:
                        # the vocabulary was collected in a separate job
                        # at plan-construction time; a shingle appearing
                        # only now means the input's lineage is
                        # non-deterministic (sample()/limit()/mutable
                        # source re-read) — name the cause instead of
                        # dying with a bare KeyError deep in a Python
                        # worker (r10 review fix)
                        raise ValueError(
                            "ngram_jaccard_pairs_bitset: shingle "
                            f"{s[:60]!r} absent from the collected "
                            "vocabulary — the input DataFrame is not "
                            "deterministic between the vocabulary scan "
                            "and the encode pass (avoid sample()/"
                            "limit()/mutable sources, or materialize "
                            "the input first)"
                        )
                    masks[i >> 6] |= _np.uint64(1) << _np.uint64(i & 63)
                out["_id"].append(rid)
                if has_blk:
                    out["_blk"].append(row[1])
                out["sz"].append(len(sh))
                for j in range(words):
                    out[f"m{j}"].append(int(masks[j].astype(_np.int64)))
            pdf_out = _pd.DataFrame(out, columns=keys)
            pdf_out.columns = [f.name for f in out_schema.fields]
            yield pdf_out

    # Self-joined a/b — one materialization of the Arrow bitmask pass
    # (exchange reuse never dedups Arrow subtrees; see
    # weighted_jaccard_pairs for the measurement and caveats).
    enc = materialize_shared(
        spread(docs, block_col).select(*cols).mapInPandas(encode, schema=out_schema)
    )
    a, b = enc.alias("a"), enc.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    t = F.lit(float(threshold))
    cond = (
        cond
        & (F.col("b.sz") >= t * F.col("a.sz") - F.lit(1e-9))
        & (F.col("a.sz") >= t * F.col("b.sz") - F.lit(1e-9))
    )
    inter = sum(
        F.bit_count(F.col(f"a.m{j}").bitwiseAND(F.col(f"b.m{j}")))
        for j in range(n_words)
    ).cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            inter.alias("_inter"),
            (F.col("a.sz") + F.col("b.sz")).cast("double").alias("_sizes"),
        )
        .select(
            "id_a",
            "id_b",
            F.when(F.col("_sizes") - F.col("_inter") == 0, F.lit(1.0))
            .otherwise(F.col("_inter") / (F.col("_sizes") - F.col("_inter")))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_auto(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    max_block_rows: int = 10_000,
    dense_posting_len: int = 100,
    stats_sample_docs: int = 2048,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs with engine-chosen physical form.

    Applies the measured blocked↔prefix rule (see
    :func:`ngram_jaccard_pairs_prefix`) from cheap corpus stats instead
    of leaving the choice to the caller — the guard that keeps the
    O(block²) blocked join from ever running on a block too large for
    it:

    1. ``max(block rows) > max_block_rows`` → **prefix**, always. One
       dominant block (a single `source` at 100 TB) makes the blocked
       join quadratic death regardless of vocabulary density; prefix
       filtering degrades gracefully (posting-list joins stay linear in
       occurrences).
    2. otherwise, mean posting-list length = shingle occurrences /
       distinct shingles. ``>= dense_posting_len`` → **blocked**: a
       dense space (sf0.1 unigrams: 620-shingle vocabulary, mean
       posting ≈ 1600) defeats prefix filtering — every "rare" prefix
       shingle still lists ~every doc, so candidate generation
       approaches all-pairs while paying the extra freq/window stages
       (measured 11 s vs 3.9 s blocked). Sparse (sf0.1 bigrams: mean
       posting ≈ 7) → **prefix** (measured 7.9 s vs 11.2 s, gap grows
       with block size).

    The stats cost two small jobs at plan-construction time (a
    per-block row count, and shingle occurrence/distinct counts over a
    ``stats_sample_docs``-row limit — the density signal is orders of
    magnitude wide (sf0.1: mean posting 1600 dense vs 7 sparse), so a
    bounded sample decides it without shingling the corpus). This is
    the documented exception to "no driver actions in query
    construction", same class as the IVF KMeans fit: it picks the plan,
    it isn't part of it. At 100 TB both numbers come from table
    statistics you'd maintain anyway (ANALYZE / a shingle-index
    summary), not a scan.

    ``profile`` (r9, r8 verdict item 8 — the ``auto_join``-consumes-
    ``join_size_audit`` pattern): a :func:`posting_profile` table
    (batch-built, or live via
    ``streaming/sketch_stream.run_posting_profile_stream`` +
    ``read_posting_profile``) replaces the sampled density job — the
    dispatcher reads occurrences / distinct groups from the maintained
    profile instead of re-shingling a sample, so on a streamed corpus
    the blocked↔prefix choice tracks ingestion with no corpus access
    at plan time. Build the profile with the SAME shingle ``n`` (the
    streamed store stamps it); a blocked profile's per-(shingle, block)
    granularity is exactly the clustering the blocked pair join sees,
    so its mean posting length is the more faithful density signal.

    Output is identical across both forms (oracle-equal); only the
    physical strategy changes.
    """
    if block_col:
        max_block = (
            docs.groupBy(block_col).count().agg(F.max("count").alias("m")).head()["m"]
        )
    else:
        max_block = docs.count()
    if (max_block or 0) > max_block_rows:
        choice = "prefix"
    else:
        if profile is not None:
            occ = profile.agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("occ"),
                F.count(F.lit(1)).alias("distinct"),
            ).head()
        else:
            occ = (
                docs.limit(stats_sample_docs)
                .select(F.explode(word_shingles(F.col(text_col), n)).alias("s"))
                .agg(
                    F.count("*").alias("occ"),
                    F.approx_count_distinct("s").alias("distinct"),
                )
                .head()
            )
        choice = jaccard_dispatch_choice(
            max_block or 0, occ["occ"], occ["distinct"], max_block_rows, dense_posting_len
        )
    if choice == "blocked":
        # dense-small refinement: if the exact vocabulary fits a bitmask
        # (it usually does — small vocabulary IS what made the space
        # dense), pairs compare by AND+popcount instead of string-array
        # intersection. Falls back to the array form when the sampled
        # density was dense but the true vocabulary is large.
        try:
            return ngram_jaccard_pairs_bitset(
                docs, id_col, text_col, n, threshold, block_col
            )
        except ValueError:
            return ngram_jaccard_pairs(docs, id_col, text_col, n, threshold, block_col)
    return ngram_jaccard_pairs_prefix(docs, id_col, text_col, n, threshold, block_col)


def jaccard_dispatch_choice(
    max_block: int,
    occurrences: int,
    distinct_shingles: int,
    max_block_rows: int = 10_000,
    dense_posting_len: int = 100,
) -> str:
    """The pure dispatch rule of :func:`ngram_jaccard_pairs_auto`,
    separated so tests (and a stats-fed 100 TB planner) can exercise the
    routing without running the stats jobs."""
    if max_block > max_block_rows:
        return "prefix"
    mean_posting = occurrences / max(distinct_shingles, 1)
    return "blocked" if mean_posting >= dense_posting_len else "prefix"


# ---------------------------------------------------------------------------
# bucket pair expansion (shared by MinHash banding and SimHash chunking)
# ---------------------------------------------------------------------------


# r15 adjudicated NEGATIVE — size-gated EXPLICIT broadcast of the
# blocked pair joins' b-side (r14 verdict item 4): the before-plans
# (plans/r15/{containment_pairs,dedup_token_jaccard}_before.txt) show
# the checkpointed b-side is ALREADY auto-broadcast (BroadcastHashJoin
# BuildRight, probe = the spread() 32-partition checkpoint scan), so
# the assumed <=#blocks-task starvation does not exist at contract
# scale; the explicit gate's construction-time size-estimate job only
# added cost (interleaved min-of-6 vs beeb46c: dedup_token_jaccard
# 1.058, containment_pairs 1.084, curate_corpus_fuzzy 0.980) and at
# 100 TB would add a full extra pass over the checkpoint exactly when
# the gate fails. Auto-broadcast already makes the same decision from
# stats without the extra job.
#
# r14 adjudicated NEGATIVE — salted in-block self-join: the blocked
# pair joins' only equi-key is block_col (4 distinct sources on the
# contract corpus), so the quadratic stage hashes to <= 4 busy tasks.
# An id-hash salt on side a + width-fold replication of side b (width =
# P // n_blocks from a construction-time distinct-count, pair met
# exactly once on a._salt == b._salt), with explicit pinned-width
# repartitions so AQE's byte-based coalescing couldn't undo it, was
# implemented and interleaved-A/B'd twice vs ff70ac8: dedup_token_jaccard
# 1.16x, containment_pairs 1.18x, curate_corpus_fuzzy 1.17x (identical-
# code control 0.97x) — the replication + extra exchanges + per-side
# sorts cost more than the extra cores buy at this scale. REVERTED; at
# 100 TB the dispatcher already routes big-block corpora to the prefix
# form, whose posting-list keys spread fine.
def _bucket_pairs(
    rows: DataFrame, bucket_cols: list[str], payload: str
) -> DataFrame:
    """All unordered pairs of ``payload`` values sharing a bucket.

    groupBy(bucket) → sorted collect_list → expression-level pair
    expansion → explode. One shuffle, and — critically — the (possibly
    expensive) lineage that produced ``rows`` is evaluated ONCE; the
    self-join formulation re-executes it for both join sides (Catalyst
    plans a BroadcastExchange over a full second copy of the upstream
    aggregation — measured 2× the signature cost at sf0.1).

    Scale note: a bucket of size k expands to k(k-1)/2 pairs inside one
    row before the explode, so this shape wants bounded buckets. LSH
    buckets are bounded in practice once exact duplicates are removed
    first (identical docs share ALL buckets); for corpora where giant
    boilerplate buckets survive, prefer the self-join shape and let AQE
    skew-splitting distribute the blowup.
    """
    lst = F.sort_array(F.collect_list(payload)).alias("_ids")
    buckets = rows.groupBy(*bucket_cols).agg(lst).filter(F.size("_ids") >= 2)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("_ids") - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("_ids")),
                lambda j: F.struct(
                    F.element_at("_ids", i).alias("a"),
                    F.element_at("_ids", j).alias("b"),
                ),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("_p")).select("_p.a", "_p.b")


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


# Universal-hash MinHash parameters: g_i(x) = (a_i*x32 + b_i) mod p, p =
# 2^31-1 (Mersenne prime), x32 the shingle hash reduced to 32 bits. The
# mod is essential: a bare affine map is MONOTONIC, so min(g_i(S)) would
# equal g_i(min(S)) and all num_hashes functions would pick the same
# shingle — collapsing the signature to one effective hash and destroying
# the banding S-curve. Bounds keep a_i*x32 + b_i < 2^62 (ANSI mode raises
# on long overflow, so wrap-around arithmetic is off the table).
# Coefficients come from a seeded PRNG: signatures are reproducible.
MINHASH_PRIME = (1 << 31) - 1

# Version tag for the SIGNATURE DERIVATION itself — bump on any change
# to _minhash_coeffs, MINHASH_PRIME, the shingle construction, or the
# per-hash affine map. Persisted-index cache keys fold this in
# (r12 ADVICE): the parameter fingerprint in the index's column
# metadata covers (num_hashes, shingle_n, hash_fn) but NOT the
# derivation code, so a coefficient change would otherwise silently
# reuse indexes whose signatures no longer match freshly-computed
# delta signatures — zero band collisions, every duplicate readmitted.
MINHASH_SIG_VERSION = 1


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME) | 1, rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
) -> DataFrame:
    """Per-doc MinHash signature as `num_hashes` columns ``mh0..mhN`` —
    one Arrow map-side pass, NO shuffle.

    Each Arrow batch: shingle in Python (unique-token cache), hash each
    distinct shingle once (cached across the batch), then one numpy
    outer affine remix ``(a_i * h32 + b_i) mod p`` and a min over the
    shingle axis. The signature leaves the operator as 64 int columns
    per doc; nothing per-token ever crosses a stage boundary. Replaces
    the explode → 64 min-aggregates formulation
    (:func:`minhash_signatures_expr`): that kept tokens in their doc's
    partition (map-side partial min), but still paid the exploded-row
    HashAggregate — measured 1.31 s vs 0.26 s at sf0.1. At 100 TB the
    win is structural: signatures are a narrow map output, so the only
    shuffle in the whole dedup pipeline is the banded bucket join.

    ``hash_fn``: ``"crc32"`` (default shingle hash, fastest) or
    ``"md5_32"`` (first 8 hex chars of md5 as a 32-bit int — the same
    hash DuckDB computes with ``CAST('0x' || substr(md5(s),1,8) AS
    BIGINT)``, making the whole banding pipeline deterministic and
    oracle-checkable; the affine coeffs are already deterministic).
    Signatures equal :func:`minhash_signatures_expr`'s md5_32 output
    exactly (pinned in tests). Overflow-safe in both engines:
    a < 2³¹, h32 < 2³² ⇒ a·h32+b < 2⁶³.

    (An ``emit_shingles`` variant — shingle sets emitted from this same
    pass for the verify join — was tried in r11 and reverted in r12:
    measured 1.25× slower; see the plan-shape note on
    :func:`minhash_near_duplicates`.)
    """
    import zlib

    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    if hash_fn not in ("crc32", "md5_32"):
        raise ValueError(f"hash_fn must be 'crc32' or 'md5_32', got {hash_fn!r}")
    coeffs = _minhash_coeffs(num_hashes)
    a_vec = [a for a, _ in coeffs]
    b_vec = [b for _, b in coeffs]
    id_field = docs.schema[id_col]
    out_schema = StructType(
        [id_field]
        + [StructField(f"mh{i}", LongType()) for i in range(num_hashes)]
    )
    n = shingle_n
    prime = MINHASH_PRIME
    use_md5 = hash_fn == "md5_32"

    # self-contained closure: shipped by value to Python workers
    def process(batches):
        import hashlib
        import re as _re

        import numpy as _np
        import pandas as _pd

        _ws = _re.compile(r"[ \t\n\x0b\x0c\r]+")  # == _WS_ASCII
        A = _np.array(a_vec, dtype=_np.int64)[:, None]
        B = _np.array(b_vec, dtype=_np.int64)[:, None]
        hcache: dict[str, int] = {}

        def h32(s: str) -> int:
            v = hcache.get(s)
            if v is None:
                if use_md5:
                    v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
                else:
                    v = zlib.crc32(s.encode("utf-8"))
                hcache[s] = v
            return v

        for pdf in batches:
            ids, sig_rows = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in _ws.split((text or "").lower()) if t]
                if len(toks) <= n:
                    sh = [" ".join(toks)]
                else:
                    # dict.fromkeys: distinct, first-occurrence order ==
                    # word_shingles / array_distinct (min over a set is
                    # order-invariant, so signatures are unchanged)
                    sh = list(
                        dict.fromkeys(
                            " ".join(toks[j : j + n])
                            for j in range(len(toks) - n + 1)
                        )
                    )
                hs = _np.fromiter((h32(s) for s in sh), dtype=_np.int64, count=len(sh))
                sigs = ((A * hs + B) % prime).min(axis=1)  # (num_hashes,)
                ids.append(i)
                sig_rows.append(sigs)
            mat = _np.vstack(sig_rows) if sig_rows else _np.empty((0, len(A)), dtype=_np.int64)
            out = {id_col: ids}
            for k in range(mat.shape[1] if len(sig_rows) else len(A)):
                out[f"mh{k}"] = mat[:, k] if len(sig_rows) else []
            yield _pd.DataFrame(out)

    # Parallelism floor on the INPUT of the Python stage (r14, measured
    # at sf0.1): a single-file corpus scan is one partition, so the
    # whole signature pass ran on ONE Python worker — 0.91 s of the
    # 2.38 s candidate pipeline was this serial stage. spread() widens
    # the scan to defaultParallelism BEFORE the mapInPandas (sig 0.91 →
    # 0.46 s; candidate pipeline 2.38 → 0.99 s) and is a no-op at real
    # scale, where scans already carry ≥ cluster-width splits. NOTE
    # (r15 ADVICE correction): mapInPandas preserves partitioning, so
    # the widening DOES propagate into the checkpointed SIGNATURE table
    # (materialize_shared downstream) — what was A/B'd and rejected
    # earlier in r14 was widening the checkpointed Arrow SHINGLE tables
    # (minhash_near_duplicates / minhash_jaccard_estimate), whose wide
    # localCheckpoint layouts taxed every join consumer 3.8-4.5x
    # (OPTIMIZATION_r14.md "Inherited state"). The widened signature
    # table won its family A/B in aggregate (8 of 8 names 0.65-0.89x)
    # and is kept.
    from kafka_streams_spark.functions.partitioning import spread

    return spread(docs.select(id_col, text_col)).mapInPandas(
        process, schema=out_schema
    )


def minhash_signatures_expr(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pure-expression twin of :func:`minhash_signatures` (JVM-only
    pipelines): explode shingles → ONE hash per (doc, shingle), reduced
    to 32 bits → `num_hashes` affine remixes → min-aggregates.
    Map-side partial mins keep the shuffle to one row per doc, but the
    exploded-row HashAggregate still costs ~5× the Arrow pass.

    ``hash_fn``: ``"xxhash64"`` (default; differs from the Arrow twin's
    crc32, so signatures are not byte-identical across those twins —
    banding statistics are) or ``"md5_32"`` (bit-identical to the Arrow
    twin's md5_32 AND to the DuckDB oracle).
    """
    from kafka_streams_spark.functions.partitioning import spread

    if hash_fn == "xxhash64":
        h = F.xxhash64("shingle").bitwiseAND(F.lit(0xFFFFFFFF))
    elif hash_fn == "md5_32":
        h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_32', got {hash_fn!r}")
    sh = spread(docs).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).withColumn("h32", h)
    coeffs = _minhash_coeffs(num_hashes)
    return sh.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.col("h32") * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME))
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def _banded_keys(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    hash_fn: str,
) -> DataFrame:
    """Explode a signature table into (id, band_idx, band_hash) rows —
    the ONE place band keys are constructed (minhash_lsh_candidates and
    dedup_incremental_fuzzy both route here, and the DuckDB oracles
    encode the same rule). On the ``md5_32`` path the key is the
    concatenated sig tuple (bucket equality ⇔ tuple equality, no
    band-hash collision term, oracle-reproducible); otherwise xxhash64
    of the tuple."""
    r = num_hashes // bands
    if hash_fn == "md5_32":
        def band_key(b: int):
            return F.concat_ws("_", *[F.col(f"mh{b * r + i}") for i in range(r)])
    else:
        def band_key(b: int):
            return F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)])
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[band_key(b) for b in range(bands)])
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    sig → split into `bands` bands of r = num_hashes/bands rows → hash
    each band → explode → bucket pair expansion on (band_idx, band_hash)
    via :func:`_bucket_pairs` (signatures evaluated once; the previous
    self-join formulation re-ran the whole MinHash aggregation for the
    second join side). Two docs with Jaccard j collide w.p.
    1-(1-j^r)^bands (S-curve): the default 32 bands × 2 rows gives ~99%
    recall at j=0.5 (miss prob (1-0.25)^32); for higher thresholds,
    fewer/wider bands (e.g. 16×4 for j≳0.7) trade recall at the low end
    for fewer false-positive candidates.

    Scale shape: the explode produces n·bands rows; one shuffle on the
    band hash. Output: distinct (id_a, id_b), id_a < id_b.

    ``hash_fn``: shingle hash, passed to :func:`minhash_signatures`.
    On the ``md5_32`` path the band bucket key is the concatenated sig
    values (string) instead of xxhash64 — key equality is then EXACTLY
    tuple equality (no band-hash collisions), which both makes the
    output deterministic-reproducible in the DuckDB oracle and removes
    the (negligible but nonzero) collision term from the S-curve.
    """
    assert num_hashes % bands == 0
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, hash_fn)
    banded = _banded_keys(sig, id_col, num_hashes, bands, hash_fn)
    return (
        _bucket_pairs(banded, ["band_idx", "band_hash"], id_col)
        .toDF("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
) -> DataFrame:
    """MinHash-LSH candidates verified with exact shingle Jaccard.

    The standard two-phase shape: cheap recall via banding, exact
    precision via a join back to the shingle sets — only candidate pairs
    pay the exact-Jaccard cost. With ``hash_fn="md5_32"`` the banding is
    deterministic and DuckDB-reproducible, so the output is
    oracle-checkable (candidates = pairs sharing ≥1 exact band tuple).

    Verify-side pruning note (measured, sf0.1): semi-joining the
    shingle tables down to candidate ids before the Arrow shingler —
    the shape :func:`dedup_incremental_fuzzy` uses — LOSES here (3.3 s
    pruned vs 2.2 s full): whole-corpus banding at θ=0.5 makes half the
    corpus a candidate (2565/5000 docs), so the saved shingling doesn't
    cover the extra banding materialization + semi-joins. The fuzzy
    gate's candidates are sparse by construction (new×existing only),
    which is why the same prune wins there (4.9 → 2.9 s). If a corpus
    has rare duplicates AND a high threshold, borrow the pruned shape.

    Plan-shape note (r11→r12 adjudication): r11 tried emitting the
    shingle sets from the SAME Arrow pass as the signatures and
    localCheckpointing the combined (id, shingles, mh0..63) table for
    all three consumers ("one corpus text read, not two"). An
    interleaved same-session A/B at sf0.1 measured it 1.25× SLOWER
    (2.94 vs 2.36 s min-of-6): the verify-side shingling it saves is a
    cheap JVM expression (split+transform, not a second Arrow pass),
    while the combined checkpoint writes shingle arrays PLUS 64 longs
    per doc (~2 KB/doc — more bytes than the text read it saves) and
    every consumer deserializes the full wide row, columns it needs or
    not (RDD checkpoints don't column-prune). So: banding streams the
    signature Arrow pass unmaterialized, and only the shingle table —
    which two verify joins genuinely share — is checkpointed.
    """
    assert num_hashes % bands == 0
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, num_hashes, bands, shingle_n, hash_fn
    )
    # Joined twice (a/b sides) and expression subtrees don't share via
    # exchange reuse here — materialize the shingle table once (2.5 →
    # 1.7 s warm, 10 → 1.9 s cold at sf0.1; same lineage-cut caveat and
    # bucketed-table alternative as weighted_jaccard_pairs).
    sh = materialize_shared(
        docs.select(
            F.col(id_col),
            word_shingles(F.col(text_col), shingle_n).alias("shingles"),
        )
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            token_set_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
) -> None:
    """Materialize the corpus's MinHash signature table — (id, mh0..mhN)
    parquet, ~64 ints/doc — so recurring delta-ingest runs
    (:func:`dedup_incremental_fuzzy` with ``existing_sig``) never
    recompute signatures over the final corpus. Written once per corpus
    build; at 100 TB this is the difference between re-shingling
    yesterday's corpus every day and reading a few GB of integers.

    The signature parameters travel WITH the index as column metadata
    on ``mh0`` (Spark persists field metadata in the parquet footer):
    a reader whose hash_fn/shingle_n differ from the writer's would
    otherwise produce band keys that never collide — a silent
    every-duplicate-readmitted no-op that the gate now rejects loudly.
    """
    sig = minhash_signatures(
        docs, id_col, text_col, num_hashes, shingle_n, hash_fn
    )
    # sig_version covers the DERIVATION CODE (coefficients/prime/
    # shingling), which the parameter triple cannot: without it a
    # deployment-persisted index written before a derivation change is
    # silently accepted by a newer reader and band keys never collide
    # (r13 review finding — the /tmp bench-cache key already folded the
    # version in, but the public write/read contract did not).
    meta = {
        "num_hashes": num_hashes,
        "shingle_n": shingle_n,
        "hash_fn": hash_fn,
        "sig_version": MINHASH_SIG_VERSION,
    }
    sig = sig.withColumn("mh0", F.col("mh0").alias("mh0", metadata=meta))
    sig.write.mode("overwrite").parquet(path)


def read_minhash_index(spark, path: str) -> DataFrame:
    """Read a signature table written by :func:`write_minhash_index`."""
    return spark.read.parquet(path)


def dedup_incremental_fuzzy(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
    existing_sig: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy membership gate for a corpus increment: drop new docs whose
    shingle Jaccard against ANY existing doc reaches ``threshold`` —
    the near-dup companion to :func:`dedup_incremental`'s exact gate
    (recurring-crawl shape: today's delta must not re-admit paraphrased
    or boilerplate-shifted copies of yesterday's corpus).

    Pipeline: MinHash signatures on both sides (Arrow map pass, no
    shuffle), banded bucket keys, a new×existing equi-join on
    (band_idx, band_key) for candidates — never new×new, so the
    increment's internal near-dups are deliberately out of scope (run
    :func:`minhash_near_duplicates` on the survivors for that) — then
    exact Jaccard verify on candidates only, and a left-anti join back.

    At 100 TB the existing side's signatures are a PERSISTED table
    (64 ints/doc, written once per corpus build via
    :func:`write_minhash_index` — recompute nothing): pass it as
    ``existing_sig`` and the per-delta cost is signatures over the delta
    + one bucket join against the signature table (the existing TEXT is
    still read, but only for the candidate pairs' exact-verify join —
    id-pruned, not corpus-wide). With ``hash_fn="md5_32"`` the banding
    is deterministic and the whole gate is oracle-checkable.
    """
    matched = minhash_pairs_incremental(
        new_docs,
        existing,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        hash_fn=hash_fn,
        existing_sig=existing_sig,
    ).select(F.col("new_id").alias(id_col)).distinct()
    return new_docs.join(matched, id_col, "left_anti")


def minhash_pairs_incremental(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
    existing_sig: DataFrame | None = None,
    existing_bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Verified new×existing near-dup PAIRS — the pair-emitting core of
    :func:`dedup_incremental_fuzzy` (r9: extracted so consumers that
    need the edges, not just the gate verdict — the streaming split
    assigner's cluster maintenance — share one pipeline): banded
    candidate join on (band_idx, band_hash), exact shingle-Jaccard
    verify on candidates only. new×new pairs are deliberately out of
    scope (:func:`minhash_near_duplicates` on the delta covers them).

    ``existing_bands`` (r9): a pre-banded key table ((id, band_idx,
    band_hash) — e.g. the streaming store's per-batch band partitions)
    skips even the signature read for the existing side; takes
    precedence over ``existing_sig``. The existing TEXT is still read,
    id-pruned, for the candidate verify join.

    ``new_bands`` (r10): the same for the NEW side — a caller that
    already banded the delta (the streaming split assigner computes
    the batch's band keys once for the pricing audit and the index
    write) passes them here so the delta's Arrow signature pass runs
    exactly once per batch instead of once per consumer. MUST be built
    with the same (num_hashes, bands, shingle_n, hash_fn) or band keys
    silently never collide — the caller owns that invariant (the
    stream's frozen-parameter stamp does).

    Output: (new_id, ex_id) distinct — every new-side doc within
    ``threshold`` of an existing doc, one row per verified pair.
    """
    assert num_hashes % bands == 0

    if existing_sig is not None and "mh0" in existing_sig.columns:
        # a write_minhash_index table carries its parameters as column
        # metadata; a mismatched hash_fn/shingle_n would make band keys
        # that never collide (silent no-op gate) — fail loudly instead.
        meta = existing_sig.schema["mh0"].metadata or {}
        declared = {
            "num_hashes": num_hashes,
            "shingle_n": shingle_n,
            "hash_fn": hash_fn,
            # derivation-code version: an index written before a
            # signature-derivation change carries the old tag and must
            # be rebuilt — parameters alone can't see code changes.
            # Absent tag (pre-r13 index) is accepted, documented legacy.
            "sig_version": MINHASH_SIG_VERSION,
        }
        for key, want in declared.items():
            have = meta.get(key)
            if have is not None and have != want:
                raise ValueError(
                    f"existing_sig was built with {key}={have!r} but the "
                    f"gate was called with {key}={want!r} — signatures are "
                    "incomparable; rebuild the index or match parameters"
                )

    def banded(docs: DataFrame, sig: DataFrame | None = None) -> DataFrame:
        if sig is None:
            sig = minhash_signatures(
                docs, id_col, text_col, num_hashes, shingle_n, hash_fn
            )
        return _banded_keys(sig, id_col, num_hashes, bands, hash_fn)

    ex_banded = (
        existing_bands
        if existing_bands is not None
        else banded(existing, existing_sig)
    )
    new_banded = new_bands if new_bands is not None else banded(new_docs)
    # persisted: the candidate pairs are read THREE times below (both
    # verify joins plus the two id-pruning semi-joins) — without the
    # persist each consumer re-runs the banding subtree, including the
    # Arrow signature passes. Tiny (two id columns).
    cand = (
        new_banded
        .withColumnRenamed(id_col, "new_id")
        .join(
            ex_banded.withColumnRenamed(id_col, "ex_id"),
            ["band_idx", "band_hash"],
        )
        .select("new_id", "ex_id")
        .distinct()
        .persist()
    )
    # id-prune BEFORE shingling: the exact-verify pass must only shingle
    # candidate docs — without the semi-joins Catalyst cannot push the
    # candidate-id filter below the shingle projection and the whole
    # existing corpus pays the Arrow pass every delta run. Measured at
    # sf0.1 the prune LOSES ~0.7 s (2.2 vs 3.0 s: candidate
    # materialization overhead vs tiny shingle savings) — kept anyway
    # because the asymmetry inverts at scale: the delta is small, the
    # existing corpus is the 100 TB side, and candidates are a sparse
    # subset of it by construction.
    cand_new_ids = cand.select(F.col("new_id").alias(id_col)).distinct()
    cand_ex_ids = cand.select(F.col("ex_id").alias(id_col)).distinct()
    sh_new = new_docs.join(cand_new_ids, id_col, "left_semi").select(
        F.col(id_col).alias("new_id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh_n"),
    )
    sh_ex = existing.join(cand_ex_ids, id_col, "left_semi").select(
        F.col(id_col).alias("ex_id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh_e"),
    )
    return (
        cand.join(sh_new, "new_id")
        .join(sh_ex, "ex_id")
        .filter(token_set_jaccard(F.col("sh_n"), F.col("sh_e")) >= threshold)
        .select("new_id", "ex_id")
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "blake2b",
) -> DataFrame:
    """SimHash per document — one Arrow map-side pass, NO shuffle.

    Per Arrow batch: tokenize in Python, hash each distinct token once
    (cached — vocabularies repeat heavily), then numpy bit-unpack → ±1
    sums → sign vector packed into one int64. Replaces the explode →
    per-bit conditional-sum aggregates form (:func:`simhash_expr`): that
    computed full signatures map-side via partial aggregation, but the
    per-exploded-row 64-buffer HashAggregate measured 2.8 s at sf0.1 vs
    0.2 s for this pass. At 100 TB simhash becomes embarrassingly
    parallel: signature is a map output; only the (id, simhash) rows —
    and never tokens — move.

    ``hash_fn``: ``"blake2b"`` (default, 64-bit token hash; empty-token
    docs keep signature 0) or ``"md5_60"`` (first 15 hex chars of md5 as
    a 60-bit int — hashlib.md5 hexdigest is byte-identical to Spark
    F.md5 and DuckDB md5, so signatures equal :func:`simhash_expr`'s
    md5_60 output exactly, pinned in tests; empty-token docs are DROPPED
    to mirror the expression twin's explode / the oracle's unnest).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    if hash_fn not in ("blake2b", "md5_60"):
        raise ValueError(f"hash_fn must be 'blake2b' or 'md5_60', got {hash_fn!r}")
    id_field = docs.schema[id_col]
    out_schema = StructType([id_field, StructField("simhash", LongType())])
    use_md5 = hash_fn == "md5_60"

    # self-contained closure: shipped by value to Python workers
    def process(batches):
        import hashlib
        import re as _re

        import numpy as _np
        import pandas as _pd

        _ws = _re.compile(r"[ \t\n\x0b\x0c\r]+")  # == _WS_ASCII
        bits_n = 60 if use_md5 else 64
        shifts = _np.arange(bits_n, dtype=_np.uint64)
        hcache: dict[str, int] = {}

        def h64(tok: str) -> int:
            v = hcache.get(tok)
            if v is None:
                b = tok.encode("utf-8")
                if use_md5:
                    v = int(hashlib.md5(b).hexdigest()[:15], 16)
                else:
                    v = int.from_bytes(
                        hashlib.blake2b(b, digest_size=8).digest(), "little"
                    )
                hcache[tok] = v
            return v

        for pdf in batches:
            ids, sigs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in _ws.split((text or "").lower()) if t]
                if not toks:
                    if not use_md5:  # md5_60 mirrors explode: row drops
                        ids.append(i)
                        sigs.append(0)
                    continue
                hs = _np.fromiter((h64(t) for t in toks), dtype=_np.uint64, count=len(toks))
                bits = ((hs[:, None] >> shifts) & _np.uint64(1)).astype(_np.int64)
                vote = (2 * bits - 1).sum(axis=0) > 0  # sign vector
                packed = (vote.astype(_np.uint64) << shifts).sum(dtype=_np.uint64)
                ids.append(i)
                sigs.append(int(packed.astype(_np.int64)))  # two's-complement
            yield _pd.DataFrame({id_col: ids, "simhash": sigs})

    # r14: parallelism floor on the Python-stage input — a single-file
    # scan otherwise runs the whole signature pass on one worker (the
    # minhash_signatures finding); no-op at real scale.
    from kafka_streams_spark.functions.partitioning import spread

    return spread(docs.select(id_col, text_col)).mapInPandas(
        process, schema=out_schema
    )


def simhash_expr(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pure-expression twin of :func:`simhash` (JVM-only pipelines):
    explode tokens → hash → per-bit ±1 contributions summed per doc
    (conditional-sum aggregates) → sign vector packed into a bigint.

    ``hash_fn``: ``"xxhash64"`` (default, 64-bit signatures; different
    token hash than the Arrow twin's blake2b, so signatures are not
    byte-identical across twins but hamming statistics are) or
    ``"md5_60"`` (first 15 hex chars of md5 as a 60-bit integer —
    bit-identical to DuckDB's ``CAST('0x' || substr(md5(t),1,15) AS
    BIGINT)``, which makes the near-dup contract oracle-checkable;
    60-bit signatures, no sign-bit fold needed).

    Docs whose token list is empty drop out (explode of an empty array)
    — mirrored by the DuckDB oracle's ``unnest``.
    """
    from kafka_streams_spark.functions.partitioning import spread

    if hash_fn == "xxhash64":
        h, bits = F.xxhash64("tok"), SIMHASH_BITS
    elif hash_fn == "md5_60":
        h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
        bits = 60
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")

    tok = spread(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", h)
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(0) * F.lit(1 << i).cast("bigint"))
        for i in range(min(bits, 63))
    )
    if bits == 64:  # bit 63 would overflow signed; fold as the sign bit
        sig = sig + F.when(
            F.col("b63") > 0, F.lit(-(1 << 63)).cast("bigint")
        ).otherwise(0)
    return bit_sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "blake2b",
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming between SimHashes.

    Pigeonhole LSH: split the signature bits into (max_hamming+1) chunks
    — any pair within distance d shares at least one exact chunk, so the
    bucketing is EXACT (no false negatives) and the output deterministic
    given the hash. Bucket pair expansion on (chunk_idx, chunk_value) —
    same shape as MinHash banding, signature computed once, no cross
    join. Hamming distance verified exactly via bit_count(xor); the
    signature rides inside the bucket payload struct so no join back is
    needed.

    ``hash_fn``: ``"blake2b"`` (default — the Arrow :func:`simhash`
    pass, fastest), ``"md5_60"`` (the SAME Arrow pass with a 60-bit
    md5-derived token hash that DuckDB reproduces — the oracle-checked
    contract path; pigeonhole still covers all bits: 4 chunks × 15 bits
    at max_hamming=3), or ``"xxhash64"`` (the expression twin, for
    JVM-only pipelines).
    """
    if hash_fn in ("blake2b", "md5_60"):
        bits = 60 if hash_fn == "md5_60" else SIMHASH_BITS
        sigs = simhash(docs, id_col, text_col, hash_fn=hash_fn)
    else:
        bits = SIMHASH_BITS
        sigs = simhash_expr(docs, id_col, text_col, hash_fn=hash_fn)
    return hamming_pairs(sigs, id_col, "simhash", bits, max_hamming)


def _hamming_chunk_array(sig_col: str, bits: int, max_hamming: int):
    """The pigeonhole chunk expressions shared by :func:`hamming_pairs`
    and :func:`hamming_bucket_stats` — ONE definition, because the
    audit's guarantee ('measures the REAL buckets') is exactly that the
    two use byte-identical chunking. k = max_hamming+1 chunks covering
    all ``bits``, first bits%k chunks one wider. A width-64 chunk
    (radius 0 over a full int64 signature) takes the signature whole:
    (1 << 64) - 1 does not fit a long literal and no mask is needed."""
    k = max_hamming + 1
    base, rem = divmod(bits, k)
    widths = [base + (1 if i < rem else 0) for i in range(k)]
    offsets = [sum(widths[:i]) for i in range(k)]
    out = []
    for w, off in zip(widths, offsets):
        c = F.shiftrightunsigned(F.col(sig_col), off)
        if w < 64:
            c = c.bitwiseAND((1 << w) - 1)
        out.append(c)
    return F.array(*out)


def hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """All pairs of rows whose ``sig_col`` bit signatures differ in at
    most ``max_hamming`` of the low ``bits`` bits — the generic
    pigeonhole core shared by :func:`simhash_near_duplicates` (text)
    and multimodal perceptual-hash dedup
    (:func:`~kafka_streams_spark.operators.multimodal.dedup_media_near`).

    Pigeonhole LSH: split the bits into (max_hamming+1) chunks — any
    pair within distance d shares at least one exact chunk, so the
    bucketing is EXACT (no false negatives) and deterministic given the
    signatures. Bucket pair expansion on (chunk_idx, chunk_value); the
    signature rides inside the bucket payload struct so no join back is
    needed; Hamming distance verified exactly via bit_count(xor).

    Output: (id_a, id_b, hamming) with id_a < id_b, distinct.
    """
    chunks = sigs.select(
        F.struct(F.col(id_col).alias("id"), F.col(sig_col).alias("sig")).alias(
            "payload"
        ),
        F.posexplode(_hamming_chunk_array(sig_col, bits, max_hamming)).alias(
            "chunk_idx", "chunk_val"
        ),
    )
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        _bucket_pairs(chunks, ["chunk_idx", "chunk_val"], "payload")
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hamming_pairs_brute(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
) -> DataFrame:
    """Popcount cross-join twin of :func:`hamming_pairs` — identical
    output, no banding overhead. The right physical form when the
    radius is wide enough that pigeonhole candidates approach all-pairs
    anyway (see :func:`hamming_pairs_auto`)."""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("_ba"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("_bb"))
    return (
        sa.join(sb, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_ba").bitwiseXOR(F.col("_bb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_dispatch_choice(
    n_rows: int, n_candidates: int, max_candidate_frac: float = 0.25
) -> str:
    """The pure dispatch rule of :func:`hamming_pairs_auto` (the
    `jaccard_dispatch_choice` pattern — separated so tests and a
    stats-fed planner can exercise the routing without the stats jobs):
    the pigeonhole pays an explode + bucket-join + distinct on top of
    the candidate set, so once the audited candidate count approaches
    all-pairs (wide radius → dense chunks) the plain popcount cross
    join is strictly cheaper — same output, no banding overhead."""
    all_pairs = n_rows * (n_rows - 1) // 2
    if all_pairs == 0:
        return "pigeonhole"
    return "pigeonhole" if n_candidates <= max_candidate_frac * all_pairs else "brute"


def hamming_pairs_auto(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    max_hamming: int,
    max_candidate_frac: float = 0.25,
) -> DataFrame:
    """Engine-dispatched hamming pairs: price the radius with
    :func:`hamming_bucket_stats` (a bounded aggregate over the 8-byte
    signature table) and route — pigeonhole for tight radii, the
    popcount cross join once audited candidates approach all-pairs
    (wide radius → dense chunks → the banding explode/join/distinct is
    pure overhead; the round-6 scaling wave measured 3.9× at 4× rows
    before this dispatch). Output identical across both forms. The two
    stats jobs at plan construction are the documented exception class
    (the `ngram_jaccard_pairs_auto` precedent); at 100 TB both numbers
    come from the signature-index summary."""
    n_rows = sigs.count()
    n_cand = (
        hamming_bucket_stats(sigs, sig_col, bits, max_hamming)
        .agg(F.sum("n_candidate_pairs").alias("c"))
        .head()["c"]
    ) or 0
    if hamming_dispatch_choice(n_rows, n_cand, max_candidate_frac) == "brute":
        return hamming_pairs_brute(sigs, id_col, sig_col, max_hamming)
    return hamming_pairs(sigs, id_col, sig_col, bits, max_hamming)


def hamming_bucket_stats(
    sigs: DataFrame,
    sig_col: str,
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """Bucket-occupancy pre-flight for :func:`hamming_pairs` — the
    instrument that prices a radius BEFORE the pair join runs (the
    `lsh_bucket_stats` role for the pigeonhole family): per chunk, how
    many buckets are occupied, the largest bucket, and the EXACT
    candidate-pair count Σ n·(n−1)/2 the bucket equi-join will emit.
    The chunk width is bits/(max_hamming+1); a wide radius makes chunks
    narrow and buckets dense, and the candidate count degrades toward
    all-pairs — the round-6 scaling wave measured exactly that on the
    contract corpus (r=16 over 60 bits: 3.9× time at 4× rows). Run this
    narrow aggregate first; a blown-up n_candidate_pairs says "tighten
    the radius or switch family" before the cluster finds out.

    Same chunking arithmetic as :func:`hamming_pairs` (one wider for
    the first bits%k chunks), so the audit measures the REAL buckets.
    Output: (chunk_idx int, n_buckets bigint, max_bucket bigint,
    n_candidate_pairs bigint).
    """
    chunks = sigs.select(
        F.posexplode(_hamming_chunk_array(sig_col, bits, max_hamming)).alias(
            "chunk_idx", "chunk_val"
        ),
    )
    occ = chunks.groupBy("chunk_idx", "chunk_val").agg(F.count("*").alias("n"))
    return occ.groupBy("chunk_idx").agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("bigint").alias("n_candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components)
# ---------------------------------------------------------------------------


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every node gets
    ``cluster_id`` = the minimum id reachable through the pair graph —
    the step that turns pairwise matches into dedup groups with a
    canonical (min-id) representative.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — the
    published O(log² n)-round CC for exactly this execution model).
    Each round rewrites the EDGE SET:

    - large-star(u): every strictly-larger neighbor of u reconnects to
      m(u) = min(neighbors(u) ∪ {u});
    - small-star(u): every smaller neighbor, and u itself, reconnects
      to m(u).

    Both preserve connectivity; the fixpoint is a set of STARS, each
    centered at its component's minimum id, read off directly as the
    label table. Round count is logarithmic in component diameter where
    plain min-label propagation is LINEAR — measured on the embedding
    near-dup contract graph: 5 rounds vs 21 (its borderline-similarity
    chains have diameter ≈ 21, and real web-dedup graphs are worse);
    64-node chain: 7 vs 64. At a billion edges every round is a full
    edge shuffle, so round count IS the cost of this operator.
    (Pointer-jumping over min-label propagation was measured first and
    rejected: 21 → 16 rounds only — jumps compound poorly when ids are
    random relative to topology.)

    Per round: two grouped min-aggregations and two join+dedup edge
    rewrites — all map-side-combinable equi-shuffles on node keys, no
    windows. This is the engine's one deliberately ITERATIVE operator:
    each round is a declarative plan; the fixpoint check is driver-side
    (edge count equal, then one exceptAll emptiness probe — exact, not
    a hash checksum), the documented exception to "no driver loops",
    exactly like Spark's own GraphX/ML iterations.

    Lineage is cut per round with ``localCheckpoint(eager=True)``, NOT
    ``persist``: persist caches data but the logical plan keeps
    nesting, so after k rounds the plan tree is O(2^k) nodes and the
    driver dies building plan strings long before the data is large
    (observed as a driver OOM at sf0.1). Checkpointed rounds keep every
    plan O(1). localCheckpoint stores blocks on executors — on a real
    cluster with dynamic allocation, swap for reliable ``checkpoint``
    to durable storage; the loop shape is unchanged.

    Output: (node, cluster_id); singleton nodes never in ``pairs`` are
    absent (callers union them back as their own cluster if needed; a
    degenerate self-pair (x, x) registers x as its own singleton
    cluster only when x has no real edge — a node with both keeps
    exactly its star label, one row per node).
    """
    # A pair with a NULL endpoint carries no connectivity information
    # and is dropped up front (r12, ADVICE): greatest/least skip NULLs,
    # so (NULL, x) would otherwise canonicalize into a self-pair (x, x)
    # and register x as a singleton cluster — where the pre-r11
    # NULL-rejecting a!=b / a==b comparisons dropped such rows — a
    # silent behavior change shared by both CC paths.
    raw = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # canonical (big, small) rows INCLUDING self-pairs (big == small):
    # one checkpoint materializes the upstream pair plan exactly once —
    # the selfnodes leg used to re-derive it from `raw`, silently
    # re-running a corpus-scale banding/verify pipeline a second time
    # (measured ~3 s of the 6 s dedup_clusters_lsh contract at sf0.1;
    # r11 fix). Everything below reads the checkpointed table.
    E_all = (
        raw.select(
            F.greatest("a", "b").alias("big"), F.least("a", "b").alias("small")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical undirected edges, stored (big, small)
    E = E_all.filter(F.col("big") != F.col("small"))
    # A self-pair (x, x) registers x as its own singleton cluster ONLY
    # when x has no real edge: a node with both a self-pair and a real
    # edge must emit exactly one (node, cluster_id) row — the star
    # label — not a conflicting (x, x) row beside it (one-row-per-node
    # contract; downstream winner-joins break on duplicates).
    real_nodes = (
        E.select(F.col("big").alias("node"))
        .unionByName(E.select(F.col("small").alias("node")))
        .distinct()
    )
    selfnodes = (
        E_all.filter(F.col("big") == F.col("small"))
        .select(F.col("big").alias("node"), F.col("big").alias("cluster_id"))
        .join(real_nodes, "node", "left_anti")
    )

    def both(e: DataFrame) -> DataFrame:
        return e.select(
            F.col("big").alias("u"), F.col("small").alias("v")
        ).unionByName(e.select(F.col("small").alias("u"), F.col("big").alias("v")))

    def mins(e: DataFrame) -> DataFrame:
        # m(u) = min(neighbors(u) ∪ {u})
        return (
            both(e)
            .groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )

    n_prev = E.count()
    # Small-graph dispatch (r11): the edge count is already on the
    # driver (it seeds the fixpoint check), so when the CANONICAL edge
    # set fits the documented bounded-collect budget, solve the
    # components with driver-side union-find instead of paying 4-6
    # distributed rounds of ~12 scheduler-bound jobs each — the
    # hamming_pairs_auto pattern applied to CC (measured at sf0.1: the
    # 694-edge contract graph spends ~5 s on round scheduling for
    # sub-millisecond numpy-scale work). The labeling rule is identical
    # — every node maps to the minimum id reachable through the pair
    # graph; Python's str/int ordering matches Spark's binary string /
    # numeric ordering (UTF-8 byte order preserves code-point order) —
    # and tests pin both paths equal on the contract graphs. Above the
    # threshold the distributed O(log² n)-round loop below runs, so the
    # 100 TB path is unchanged. Driver cost at the 1M-edge default
    # (r12, ADVICE — collected via Arrow toPandas, not Row objects,
    # which cost ~300 bytes/edge): two int64 numpy columns ≈ 16 MB on
    # the wire, then up to 2M boxed Python ids + a 2M-entry parent dict
    # ≈ 300-400 MB peak for the union-find itself (more for string
    # ids). Fine for this engine's 128 GiB driver; on a small-driver
    # cluster pass a lower local_threshold.
    if n_prev <= local_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        edges_pd = E.toPandas()
        for b, s in zip(
            edges_pd["big"].tolist(), edges_pd["small"].tolist()
        ):
            parent.setdefault(b, b)
            parent.setdefault(s, s)
            rb, rs = find(b), find(s)
            if rb != rs:
                parent[rb] = rs
        label: dict = {}
        for node in parent:
            r = find(node)
            if r not in label or node < label[r]:
                label[r] = node
        rows = [(node, label[find(node)]) for node in parent]
        local = pairs.sparkSession.createDataFrame(
            rows,
            schema=_types.StructType(
                [
                    _types.StructField("node", E.schema["big"].dataType),
                    _types.StructField("cluster_id", E.schema["small"].dataType),
                ]
            ),
        )
        return local.unionByName(selfnodes)
    for _ in range(max_iter):
        m1 = mins(E)
        # large-star: (v, m(u)) for every neighbor v > u. v > u ≥ m(u),
        # so the emitted edge is already canonical (big=v, small=m).
        lg = (
            both(E)
            .filter(F.col("v") > F.col("u"))
            .join(m1, "u")
            .select(F.col("v").alias("big"), F.col("m").alias("small"))
            .filter(F.col("big") != F.col("small"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        m2 = mins(lg)
        # small-star: (v, m(u)) for every neighbor v < u, plus (u, m(u))
        sm_edges = (
            both(lg)
            .filter(F.col("v") < F.col("u"))
            .join(m2, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        sm_self = m2.select(F.col("u").alias("x"), F.col("m").alias("y"))
        E2 = (
            sm_edges.unionByName(sm_self)
            .filter(F.col("x") != F.col("y"))
            .select(
                F.greatest("x", "y").alias("big"), F.least("x", "y").alias("small")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n2 = E2.count()
        # star ops never grow the distinct edge set, so equal counts +
        # one-sided exceptAll emptiness ⇔ set equality (exact fixpoint
        # test, two cheap jobs on checkpointed frames).
        if n2 == n_prev and E2.exceptAll(E).isEmpty():
            E = E2
            break
        E, n_prev = E2, n2
    centers = E.select(
        F.col("small").alias("node"), F.col("small").alias("cluster_id")
    ).distinct()
    leaves = E.select(F.col("big").alias("node"), F.col("small").alias("cluster_id"))
    return leaves.unionByName(centers).unionByName(selfnodes).distinct()


def minhash_jaccard_estimate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "crc32",
) -> DataFrame:
    """Estimator-accuracy audit for the MinHash pipeline: every LSH
    candidate pair with its MinHash ESTIMATE of Jaccard (fraction of
    equal signature components — the unbiased estimator the S-curve
    math assumes, stderr ≈ √(j(1−j)/k)) next to the EXACT shingle
    Jaccard and the absolute error. Run it on a sample before trusting
    a (num_hashes, bands) configuration on the full corpus: if the
    observed error is fatter than √(j(1−j)/k), the shingle space is too
    small for the hash family (or docs too short) and the banding
    threshold needs margin.

    Plan shape: the signature table feeds THREE consumers (the banding
    and both estimate-join sides), and Arrow subtrees are never
    deduplicated by exchange reuse (the weighted_jaccard_pairs
    finding), so the narrow 64-ints/doc signature table is lazily
    localCheckpointed — the MinHash pass runs once instead of three
    times (7.4 → 2.5 s cold at sf0.1; warm parity). The
    component-equality sum is a `num_hashes`-term codegen CASE sum,
    same as the SimHash bit expressions. Exact Jaccard joins back to
    the shingle arrays for candidate pairs only. est_jaccard is an
    exact rational (matches/num_hashes) and jaccard a single int/int
    division, so no rounding pin is needed.

    Output: (id_a, id_b, est_jaccard, jaccard, abs_err).
    """
    assert num_hashes % bands == 0
    sig = materialize_shared(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, hash_fn)
    )
    banded = _banded_keys(sig, id_col, num_hashes, bands, hash_fn)
    cands = (
        _bucket_pairs(banded, ["band_idx", "band_hash"], id_col)
        .toDF("id_a", "id_b")
        .distinct()
    )
    a = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)]
    )
    b = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)]
    )
    matches = functools.reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(num_hashes)
        ],
    )
    est = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    # consumed by BOTH exact-Jaccard join sides — Arrow subtrees never
    # share through exchange reuse, so materialize the shingle table
    # once (the same fix minhash_near_duplicates carries; r7
    # self-review find: the audit paid one redundant full shingling
    # pass per run)
    sh = materialize_shared(
        docs.select(
            F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("shingles")
        )
    )
    return (
        est.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            token_set_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .withColumn("abs_err", F.abs(F.col("est_jaccard") - F.col("jaccard")))
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    block_col: str | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """idf-WEIGHTED Jaccard near-dup pairs: shingle ``s`` contributes
    weight ``w_s = log10(N / df_s)`` instead of 1, so two documents
    sharing RARE shingles score high while overlap made of boilerplate
    shingles (df→N ⇒ w→0) scores near zero — the precision upgrade over
    plain Jaccard for template-heavy corpora. wj(A,B) =
    Σ_{s∈A∩B} w_s / Σ_{s∈A∪B} w_s.

    Plan shape — posting lists, not array intersects: one shingle
    explode builds (doc, shingle) postings, immediately repartitioned
    BY SHINGLE, and document frequency is a count-over-window ON that
    partitioning rather than a separate aggregate joined back — so the
    whole weighted-posting table is ONE subtree whose single exchange
    every consumer (both self-join sides, per-doc totals) reuses, and
    the Arrow shingler runs once. The aggregate+join formulation looks
    equivalent but is not at plan level: column pruning gives each
    consumer a differently-pruned scan subtree, canonical equality
    fails, and the shingler re-runs per consumer (measured 4× the
    Python work, zero ReusedExchange). The pair join's clustering
    requirement (shingle [, block]) is satisfied by the shingle
    partitioning, so the quadratic stage adds NO shuffle and is
    bounded per POSTING LIST (max df), not per block row count; a hot
    shingle is visible directly as a long posting list (and is exactly
    the row a stop-shingle cut would drop). ``block_col`` confines
    pairs within blocks.

    Sharing caveat, measured: exchange reuse does NOT deduplicate this
    subtree — consumers prune different columns, and subtrees
    containing an ArrowEvalPython stage fail canonical equality even
    when column-identical — so without intervention the shingler runs
    once per consumer (4× the Python work). The weighted postings are
    therefore lazily ``localCheckpoint``ed: one materialization at
    first action, every consumer reads it (4.9 → 3.5 s at sf0.1).
    Lineage-cut caveat at cluster scale (a lost executor fails the job
    instead of recomputing); for recurring 100 TB runs materialize the
    weighted postings to a bucketed table instead (the
    write_minhash_index pattern) and this checkpoint disappears. Output
    rounds to 6 dp (weight sums are float sums in partition order —
    cross-engine agreement holds well past 6 dp); the threshold
    compares the ROUNDED value so the keep boundary is
    engine-identical.

    ``max_df`` (the stop-shingle cut both notes above point at; r8,
    sized by the :func:`posting_pair_stats` pre-flight): drop postings
    whose GLOBAL document frequency exceeds the cap before weighting.
    This changes the measure — weights, totals, and overlap are
    computed over the surviving shingles only, the classic stop-word
    treatment — in exchange for a hard bound on the quadratic stage:
    per-shingle pair fan-out is at most max_df², so total candidates
    are ≤ n_groups·max_df²/2 however large the corpus grows, instead
    of Θ(corpus²) on a dense vocabulary. A shingle every document
    carries scores ~0 under idf anyway (w = log10(N/df) → 0 as
    df → N), so on real template-heavy corpora the cap removes almost
    no signal. None (default) keeps the exact measure.

    Output: (id_a, id_b, weighted_jaccard), id_a < id_b. Pairs with an
    EMPTY shingle intersection are never emitted (a posting join only
    meets pairs that share a shingle), and pairs whose union weight is
    0 (all-ubiquitous overlap) are undefined and dropped — hence the
    threshold must be > 0, enforced here.
    """
    from pyspark.sql import Window

    from kafka_streams_spark.functions.partitioning import spread

    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0: the posting-list join never emits "
            f"zero-overlap pairs, got {threshold}"
        )
    # Pinned-width shingle exchange (r14): `.repartition("_s")` left the
    # partition COUNT to AQE, whose byte-based coalescing shrank the
    # sub-MB posting shuffle to ONE partition; the localCheckpoint below
    # froze that layout, so the quadratic pair join — partition-local by
    # design — ran on a single task (stage profile: 3.4 s CPU on 1 of 32
    # cores, the suite's single largest stable cost). The pinned count
    # is floor_width = max(defaultParallelism, shuffle.partitions)
    # (r15, verdict item 5): raw defaultParallelism = total CORES would
    # CAP the quadratic pair join at core count on a real cluster,
    # where a tuned shuffle.partitions is ≫ cores precisely so the
    # exploded-shingle shuffle (~10x corpus bytes at 100 TB) lands in
    # spill-safe partitions; the max can only raise the width AQE's
    # byte-cost model (partition cost ∝ bytes — wrong for a stage whose
    # cost is quadratic per posting list) would have collapsed.
    from kafka_streams_spark.functions.partitioning import floor_width

    post = spread(docs, block_col).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode(word_shingles(F.col(text_col), n)).alias("_s"),
    ).repartition(floor_width(docs.sparkSession), "_s")
    n_docs = docs.agg(F.count("*").cast("double").alias("_n"))
    pw = post.withColumn("_df", F.count("*").over(Window.partitionBy("_s")))
    if max_df is not None:
        # stop-shingle cut ON the already-computed df — no extra pass;
        # the filter rides the same shingle partitioning
        pw = pw.filter(F.col("_df") <= int(max_df))
    pw = (
        pw.join(F.broadcast(n_docs))
        .withColumn("_w", F.log10(F.col("_n") / F.col("_df")))
        .drop("_n", "_df")
    )
    pw = materialize_shared(pw)
    tot = pw.groupBy(id_col).agg(F.sum("_w").alias("_tw"))
    a = pw.alias("a")
    b = pw.alias("b")
    cond = (F.col("a._s") == F.col("b._s")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.sum("a._w").alias("_iw"))
    )
    ta = tot.select(F.col(id_col).alias("id_a"), F.col("_tw").alias("_ta"))
    tb = tot.select(F.col(id_col).alias("id_b"), F.col("_tw").alias("_tb"))
    # Zero union weight (every shingle of A∪B is corpus-ubiquitous,
    # w=0 all round) makes wj 0/0 — undefined, and an ANSI
    # divide-by-zero error if computed. Such pairs drop out (the null
    # fails the threshold filter), matching the oracle, where 0/0 → NaN
    # also fails the comparison. Found by the hypothesis model test.
    denom = F.col("_ta") + F.col("_tb") - F.col("_iw")
    wj = F.when(denom > 0, F.round(F.col("_iw") / denom, 6))
    return (
        inter.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", wj.alias("weighted_jaccard"))
        .filter(F.col("weighted_jaccard") >= threshold)
    )


def posting_pair_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Pre-flight pricing of a posting-list pair join — the audit
    :func:`weighted_jaccard_pairs` (and the prefix form's candidate
    stage) was missing from the lsh_bucket_stats / hamming_bucket_stats
    family: the EXACT candidate-pair count Σ_groups df·(df−1)/2 the
    shingle self-join will emit, from one linear posting aggregate,
    before the quadratic stage runs.

    Found by the r8 sf1 spot-check: on a dense-vocabulary corpus every
    document shares shingles with ~every other, the candidate (and
    TRUE OUTPUT) pair count grows quadratically in corpus size, and
    wall-clock tracks output — correct and output-bound, but a number
    you want priced up front, not discovered 200 s in. A blown-up
    ``n_candidate_pairs`` says: raise the shingle ``n`` (sparser
    space), add/narrow ``block_col``, cut stop-shingles, or accept
    that the answer itself is that large.

    Output 1 row: (n_postings, n_groups, n_candidate_pairs,
    max_posting BIGINT, top_shingle STRING) — group = (shingle [,
    block]), exactly the pair join's clustering; top_shingle ties
    break on the larger shingle string like the join-audit top_key.
    """
    return posting_pair_stats_from_profile(
        posting_profile(docs, text_col=text_col, n=n, block_col=block_col)
    )


def posting_profile(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """The per-(shingle [, block]) COUNT profile behind
    :func:`posting_pair_stats` — the persistable/streamable state, like
    :func:`~kafka_streams_spark.operators.profiling.key_profile` for
    the join audit: build it once per corpus snapshot (one grouped
    shuffle), or maintain it live
    (``streaming/sketch_stream.run_posting_profile_stream``), and price
    any posting pair join from it without re-shingling the corpus.
    Mergeable by grouped sum. Output: (_s [, block], cnt BIGINT)."""
    post = docs.select(
        *([F.col(block_col)] if block_col else []),
        F.explode(word_shingles(F.col(text_col), n)).alias("_s"),
    )
    return post.groupBy(
        "_s", *([block_col] if block_col else [])
    ).agg(F.count("*").cast("bigint").alias("cnt"))


def _profile_pair_price(profile: DataFrame):
    """The per-group candidate-pair price cnt·(cnt−1)/2 with the
    NULL-block-prices-0 rule, shared by the audit read-off and the cap
    sizer so the two can never drift. The block column is detected as
    the single column besides (_s, cnt); a profile carrying MORE than
    one extra column (multi-column blocking, or a leaked partition
    column like ingest_batch) would be silently mis-priced — NULLs in
    the undetected columns would still count pairs — so that shape
    raises instead (r10 advice fix)."""
    blk = [c for c in profile.columns if c not in ("_s", "cnt")]
    if len(blk) > 1:
        raise ValueError(
            "posting profile has more than one non-(_s, cnt) column "
            f"{blk}; single-column blocking is the only priced shape — "
            "drop extra columns (e.g. partition columns) before pricing"
        )
    pair_cnt = F.expr("cnt * (cnt - 1) div 2")
    if blk:
        pair_cnt = F.when(F.col(blk[0]).isNotNull(), pair_cnt).otherwise(
            F.lit(0)
        )
    return pair_cnt


def posting_pair_stats_from_profile(profile: DataFrame) -> DataFrame:
    """The :func:`posting_pair_stats` read-off from an already-built
    (or stream-maintained) :func:`posting_profile` — O(distinct groups)
    with no corpus access. Shared by the batch audit and the streaming
    twin so the two can never drift.

    NULL-block convention (r9, advisor find): the pair join this audit
    prices (:func:`weighted_jaccard_pairs`, the prefix candidate stage)
    joins blocks with plain equality, so postings whose block value is
    NULL never pair — their groups contribute **0** to
    ``n_candidate_pairs``. They stay counted in ``n_postings`` /
    ``n_groups`` / ``max_posting`` (the profile describes the corpus;
    only the pair price reflects the join's NULL-key drop), the same
    split :func:`~kafka_streams_spark.operators.profiling.join_size_audit`
    uses for NULL join keys (counted in n_rows_*, priced as 0 matches).
    """
    pair_cnt = _profile_pair_price(profile)
    return profile.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_postings"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum(pair_cnt), F.lit(0))
        .cast("bigint")
        .alias("n_candidate_pairs"),
        F.coalesce(F.max("cnt"), F.lit(0)).cast("bigint").alias("max_posting"),
        F.max(F.struct(F.col("cnt"), F.col("_s"))).getField("_s").alias(
            "top_shingle"
        ),
    )


def max_df_for_budget(profile: DataFrame, pair_budget: int) -> DataFrame:
    """Size the :func:`weighted_jaccard_pairs` ``max_df`` stop-shingle
    cap FROM the measured :func:`posting_profile`, given a candidate-
    pair budget — the r9 advisor follow-through: the capped contract's
    pinned ``max_df=350`` is corpus-relative (70% of 500 docs, 7% of
    5000), so a production cap should be derived from the profile at
    the actual corpus scale, not copied from a contract constant.

    Returns the LARGEST cap such that the posting groups surviving it
    (``cnt <= cap``) emit at most ``pair_budget`` candidate pairs —
    computed from the per-length histogram of the profile: one grouped
    aggregate over distinct posting lengths, a cumulative sum + lead
    over that histogram, one read-off. O(distinct posting lengths)
    state, no corpus access (the posting_pair_stats_from_profile
    convention). NULL-block groups price 0 pairs here exactly as in
    the audit (the plain-equality block join never pairs them).

    "Largest" is exact across histogram GAPS (r10 advice fix): with
    observed lengths {2, 100} and a budget admitting only df<=2
    groups, every cap in 2..99 admits the same groups and the true
    largest is 99 — the boundary row's cap is ``lead(cnt) - 1`` when a
    next observed length exists. Two bounded-by-convention edges:
    when EVERY group fits the budget there is no next length and no
    finite largest cap, so the max observed posting length is returned
    (any larger cap is equivalent); when NO group fits (or the profile
    is empty), 0 is returned (caps below the smallest observed length
    are all equivalent to it).

    Output 1 row: (max_df BIGINT — 0 if even df=1 groups blow the
    budget (or the profile is empty: nothing survives ANY cap, and a
    0 cap excludes everything, consistent), n_candidate_pairs BIGINT —
    the exact pair count the chosen cap admits).

    Direction-of-error note for BLOCKED profiles:
    :func:`weighted_jaccard_pairs`' ``max_df`` cut drops postings by
    GLOBAL document frequency, while this histogram groups per
    (shingle, block) — a group with cnt <= cap can still be cut there
    when its shingle's cross-block df exceeds the cap. The capped run
    therefore admits a SUBSET of the groups this estimate counts:
    actual pairs <= n_candidate_pairs <= pair_budget. The sizing is
    conservative in the safe direction, never an under-estimate of the
    cut's strength. On unblocked profiles the two df notions coincide
    and the count is exact.
    """
    from pyspark.sql import Window

    if pair_budget < 0:
        raise ValueError("pair_budget must be >= 0")
    pair_cnt = _profile_pair_price(profile)
    per_len = profile.groupBy("cnt").agg(
        F.sum(pair_cnt).cast("bigint").alias("_pairs")
    )
    # global-window-bounded(distinct posting lengths): input is the
    # posting-length histogram — the value_histogram bucket-table class,
    # one row per distinct df value, never per posting
    cum_w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    # global-window-bounded(distinct posting lengths): same histogram
    # input as cum_w above — one row per distinct df value
    lead_w = Window.orderBy("cnt")
    cum = per_len.withColumn("_cum", F.sum("_pairs").over(cum_w)).withColumn(
        # the largest cap equivalent to admitting up through this
        # length: everything below the NEXT observed length; at the
        # histogram's top the length itself (see docstring)
        "_cap",
        F.coalesce(F.lead("cnt").over(lead_w) - 1, F.col("cnt")),
    )
    return cum.agg(
        F.coalesce(
            F.max(F.when(F.col("_cum") <= pair_budget, F.col("_cap"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("max_df"),
        F.coalesce(
            F.max(F.when(F.col("_cum") <= pair_budget, F.col("_cum"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_candidate_pairs"),
    )


def band_pair_price(
    new_bands: DataFrame, existing_bands: DataFrame
) -> DataFrame:
    """Per-band-key price of an incremental banded candidate join — the
    bands-occupancy analog of :func:`posting_profile` for the
    new×existing stage of :func:`minhash_pairs_incremental` (and the
    streaming split assigner built on it): for every (band_idx,
    band_hash) present in the NEW side, how many candidate rows the
    equi-join will emit (``n_new · n_ex``) and how occupied the band is
    in total.

    The existing side is aggregated only for keys the new batch
    touches (semi-join prune before the grouped count), so the cost is
    one column-pruned aggregate over the band index, never a pair join.
    Output: (band_idx, band_hash, n_new, n_ex, occupancy, price) — all
    counts BIGINT; one row per new-side band key.
    """
    new_occ = new_bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").cast("bigint").alias("n_new")
    )
    ex_occ = (
        existing_bands.join(
            new_occ.select("band_idx", "band_hash"),
            ["band_idx", "band_hash"],
            "left_semi",
        )
        .groupBy("band_idx", "band_hash")
        .agg(F.count("*").cast("bigint").alias("n_ex"))
    )
    return (
        new_occ.join(ex_occ, ["band_idx", "band_hash"], "left")
        .withColumn("n_ex", F.coalesce(F.col("n_ex"), F.lit(0)))
        .withColumn("occupancy", (F.col("n_new") + F.col("n_ex")))
        .withColumn("price", (F.col("n_new") * F.col("n_ex")))
    )


def stop_band_cap_for_budget(priced: DataFrame, pair_budget: int) -> DataFrame:
    """Derive a stop-band occupancy cap from a :func:`band_pair_price`
    audit, given a candidate-pair budget — :func:`max_df_for_budget`
    for band keys: the largest occupancy cap such that band keys with
    ``occupancy <= cap`` emit at most ``pair_budget`` new×existing
    candidates. Band keys ABOVE the cap are "stop bands" (boilerplate
    bands shared by too many documents — the stop-word analog); a
    consumer drops them from candidate generation, trading bounded
    recall loss on boilerplate-heavy families for a priced, bounded
    join.

    Same gap-exact cap semantics as :func:`max_df_for_budget`
    (lead-1 at the boundary row, max observed occupancy when every key
    fits, 0 when none do). Output 1 row: (priced_pairs BIGINT — the
    UNCAPPED total, so the consumer can decide whether a cut is needed
    at all, stop_band_occupancy BIGINT, admitted_pairs BIGINT).
    """
    from pyspark.sql import Window

    if pair_budget < 0:
        raise ValueError("pair_budget must be >= 0")
    per_occ = priced.groupBy("occupancy").agg(
        F.sum("price").cast("bigint").alias("_pairs")
    )
    # global-window-bounded(distinct occupancy values): input is the
    # occupancy histogram, one row per distinct value, never per band
    cum_w = Window.orderBy("occupancy").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # global-window-bounded(distinct occupancy values): same histogram
    # input as cum_w above — one row per distinct occupancy, never per band
    lead_w = Window.orderBy("occupancy")
    cum = per_occ.withColumn(
        "_cum", F.sum("_pairs").over(cum_w)
    ).withColumn(
        "_cap",
        F.coalesce(F.lead("occupancy").over(lead_w) - 1, F.col("occupancy")),
    )
    return cum.agg(
        F.coalesce(F.sum("_pairs"), F.lit(0))
        .cast("bigint")
        .alias("priced_pairs"),
        F.coalesce(
            F.max(F.when(F.col("_cum") <= pair_budget, F.col("_cap"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("stop_band_occupancy"),
        F.coalesce(
            F.max(F.when(F.col("_cum") <= pair_budget, F.col("_cum"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("admitted_pairs"),
    )


def cluster_size_stats(labels: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """Duplicate-cluster size histogram — the report every dedup run
    ends with: how many clusters of each size the near-dup graph
    contains (2 = simple pairs; a heavy tail of large clusters means
    boilerplate families that pair-wise thresholds alone under-count).

    Input is :func:`duplicate_clusters` output (node, cluster_id), which
    covers only nodes with at least one duplicate edge — so every
    cluster here has size ≥ 2 and singletons (the non-duplicated
    majority of the corpus) are excluded by construction.

    Two aggregations, both tiny on the reduce side: per-cluster size
    (map-side partial over |duplicate nodes| rows), then the histogram
    over |clusters| rows. The expensive part is whatever built the
    pair list; this summary adds no scan of the corpus itself.

    Output: (cluster_size bigint, n_clusters bigint).
    """
    sizes = labels.groupBy(cluster_col).agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    )


def dedup_substring_remove(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring span REMOVAL (the RefinedWeb/MassiveText policy:
    arXiv 2306.01116 §3.3 removes duplicated spans instead of dropping
    whole near-dup documents): every token k-gram that also appears in a
    LOWER-id document is treated as duplicated text, the covered token
    intervals are merged per document, the covered tokens are cut, and
    the remaining tokens are reassembled in order. The first document
    containing a span keeps it; later documents lose exactly the
    duplicated tokens and keep their novel text — the surgical
    complement of :func:`dedup_exact` (whole-doc drop) and
    :func:`substring_overlap_pairs` (pair REPORT, no rewrite).

    Everything is JVM expressions — no Python stage:

    1. one scan explodes (doc, pos, k-gram) rows (1-based pos);
    2. the gram table aggregates to min-doc-per-gram (map-side partial)
       and joins back to tag occurrences whose gram has a lower-id
       owner — the gram subtree has those TWO consumers, so it is
       materialized once (`materialize_shared`, ROUND4_NOTES §19);
    3. covered intervals [pos, pos+k-1] merge per doc with the classic
       running-max window (new-group flag where pos > max end of all
       preceding intervals + 1 step, cumulative-sum group ids) — the
       per-doc window partitions on the doc key, so no global sort;
    4. merged intervals collect per doc (bounded: ≤ n_tokens/1 rows)
       and a positional `F.filter((tok, i) -> no interval covers i+1)`
       cuts covered tokens; `array_join(..., ' ')` reassembles.

    Output text is the SPACE-JOINED kept tokens — original inter-token
    whitespace is not preserved (the tokenizer collapsed it; testdata
    is single-space already). Docs shorter than k tokens emit no grams
    and pass through unchanged. A doc whose every token is covered
    survives with empty text (drop-empty is a policy gate downstream,
    not this operator's call).

    At corpus scale the cost is the gram shuffle (n·k rows of (hash,
    doc, pos)) + one join back — the same posting-table shape as the
    prefix-AllPairs family; the window and interval merge are per-doc
    local after one hash exchange on the doc key.

    Output: (id, text_clean, n_tokens bigint, n_tokens_removed bigint).
    """
    from kafka_streams_spark.functions.partitioning import materialize_shared, spread

    if k < 1:
        raise ValueError("k must be >= 1")

    toks = tokens(F.col(text_col))
    base = spread(docs).select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = materialize_shared(_gram_table(base, k))
    first = grams.groupBy("gram").agg(F.min("_id").alias("_first"))
    dup = (
        grams.join(first, "gram")
        .filter(F.col("_id") > F.col("_first"))
        .select("_id", "pos")
    )
    return _cut_covered_spans(base, dup, k, id_col)


def _gram_table(base: DataFrame, k: int) -> DataFrame:
    """(_id, pos, gram) token k-gram occurrences (1-based pos, md5 gram
    digests) from a (_id, _toks) frame — the posting-table primitive the
    span-removal family shares. Docs shorter than k emit no rows."""
    return (
        base.filter(F.size("_toks") >= k)
        .select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - k + 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i, k))),
                )
            ).alias("_off", "gram"),
        )
        .select("_id", (F.col("_off") + 1).alias("pos"), "gram")
    )


def _cut_covered_spans(
    base: DataFrame, dup: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Shared tail of the span-removal family: merge the covered token
    intervals ``[pos, pos+k-1]`` per doc (classic running-max window —
    partitioned by doc key, no global sort), cut the covered tokens
    positionally, reassemble. ``base`` is (_id, _toks); ``dup`` is
    (_id, pos) duplicated-gram occurrences."""
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new", F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1).otherwise(0)
    )
    grouped = flagged.withColumn("_grp", F.sum("_new").over(w))
    merged = grouped.groupBy("_id", "_grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + (k - 1)).alias("e")
    )
    spans = merged.groupBy("_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_spans")
    )
    joined = base.join(spans, "_id", "left").withColumn(
        "_spans", F.coalesce("_spans", F.array().cast("array<struct<s:bigint,e:bigint>>"))
    )
    covered = lambda i: F.exists(  # noqa: E731 — positional-lambda helper
        F.col("_spans"), lambda iv: (i >= iv["s"]) & (i <= iv["e"])
    )
    kept = F.filter(F.col("_toks"), lambda x, i: ~covered(i + 1))
    return joined.select(
        F.col("_id").alias(id_col),
        F.array_join(kept, " ").alias("text_clean"),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_tokens_removed"),
    )


def write_gram_index(
    docs: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the corpus's DISTINCT token-k-gram digest table —
    one md5 string per distinct k-gram — so recurring delta-ingest span
    removal (:func:`dedup_substring_remove_incremental` with
    ``existing_grams``) never re-shingles the final corpus. The
    companion of :func:`write_minhash_index` for the exact-substring
    policy: written once per corpus build; each day's delta then joins
    its grams against this table instead of re-reading 100 TB of text.

    ``k`` travels with the index as column metadata on ``gram`` (same
    loud-mismatch gate as the MinHash index: a reader whose k differs
    would silently remove nothing).
    """
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = _gram_table(base, k).select("gram").distinct()
    meta = {"k": k}
    grams = grams.withColumn("gram", F.col("gram").alias("gram", metadata=meta))
    grams.write.mode("overwrite").parquet(path)


def read_gram_index(spark, path: str) -> DataFrame:
    """Read a gram-digest table written by :func:`write_gram_index`."""
    return spark.read.parquet(path)


def dedup_substring_remove_incremental(
    new_docs: DataFrame,
    existing: DataFrame | None = None,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    existing_grams: DataFrame | None = None,
) -> DataFrame:
    """Delta-ingest exact-substring span removal: every token k-gram of
    a NEW document that already appears ANYWHERE in the existing corpus
    is duplicated text — the covered intervals are merged and cut
    exactly as in :func:`dedup_substring_remove`. This is the policy a
    continuously-ingesting pipeline actually runs (RefinedWeb removes
    duplicated spans, and a recurring crawl must apply it against
    yesterday's corpus, not just within today's batch): the existing
    corpus keeps its text; today's documents keep only their novel
    spans. Spans duplicated WITHIN the increment are deliberately out
    of scope — run :func:`dedup_substring_remove` on the survivors for
    that (the same division of labor as `dedup_incremental_fuzzy`).

    Shape: the new side explodes to (id, pos, gram) postings; the
    existing side reduces to DISTINCT gram digests (map-side partial,
    16-byte strings — the text never shuffles); a semi-join marks
    covered occurrences; the per-doc interval merge + positional cut
    run exactly as in the batch form (shared `_cut_covered_spans`).

    At 100 TB the existing side is a PERSISTED digest table written
    once per corpus build (:func:`write_gram_index`) — pass it as
    ``existing_grams`` and the per-delta cost is shingling the delta
    plus one hash semi-join against the index. With ``existing`` given
    instead, the digests are computed inline (one extra corpus scan —
    fine for tests, wrong shape for recurring production runs).

    Output: (id, text_clean, n_tokens bigint, n_tokens_removed bigint)
    for the NEW documents only.
    """
    from kafka_streams_spark.functions.partitioning import spread

    if k < 1:
        raise ValueError("k must be >= 1")
    if (existing is None) == (existing_grams is None):
        raise ValueError("pass exactly one of existing / existing_grams")
    if existing_grams is None:
        # spread(): the existing side's k-gram md5 explode + partial
        # distinct run on the scan partitioning — one task on a
        # single-file corpus (r15 stage profile: 0.90 s serial CPU at
        # sf0.1; the NEW side below already had the floor). No-op at
        # real scale (guide §2.5).
        ex_base = spread(existing).select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
        )
        existing_grams = _gram_table(ex_base, k).select("gram").distinct()
    else:
        meta = existing_grams.schema["gram"].metadata
        if meta and "k" in meta and int(meta["k"]) != k:
            raise ValueError(
                f"gram index was written with k={meta['k']}, caller wants k={k}: "
                "band digests would never match — rebuild the index or match k"
            )
        existing_grams = existing_grams.select("gram")
    base = spread(new_docs).select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    dup = (
        _gram_table(base, k)
        .join(existing_grams, "gram", "left_semi")
        .select("_id", "pos")
    )
    return _cut_covered_spans(base, dup, k, id_col)


def keep_best_per_cluster(
    docs: DataFrame,
    labels: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware duplicate-cluster survivorship: per near-dup
    cluster keep the HIGHEST-scoring member (ties break to the lowest
    id), instead of the arbitrary min-id canonical that
    :func:`duplicate_clusters` / ``curate_corpus_fuzzy`` use. This is
    the survivorship rule production pipelines actually want — inside
    a boilerplate family the members differ (truncation, ads, OCR
    noise), and dropping by id throws away the cleanest copy whenever
    it happens to carry a larger id.

    Inputs: ``docs`` (the corpus — only ``id_col`` is read), ``labels``
    = :func:`duplicate_clusters` output (node, cluster_id) covering
    ONLY clustered nodes, ``score`` = (id_col, score_col) e.g.
    :func:`~kafka_streams_spark.operators.text.quality_score`.

    Scale shape: ALL heavy work happens on the clustered subset, which
    is tiny next to a 100 TB corpus (near-dup rates are single-digit
    percent). The argmax is a map-side-combinable ``max_by`` aggregate
    over |clustered nodes| rows keyed on cluster_id — no window over
    the full corpus — and the winners table (|clusters| rows) joins
    back broadcast-sized. The corpus itself is touched by exactly two
    joins against small sides; singletons (no label row) short-circuit
    to kept=true through the left join's NULL.

    Output: (id_col, cluster_id bigint — the node's cluster, or its
    own id for singletons, score_col double, kept boolean).
    """
    lab = labels.select(
        F.col("node").alias(id_col), F.col("cluster_id").cast("bigint").alias("cluster_id")
    )
    sc = score.select(F.col(id_col), F.col(score_col).cast("double").alias(score_col))
    clustered = lab.join(sc, id_col)
    # max_by with an explicit (score, -id) sort key: SQL max_by on a
    # struct picks the lexicographically greatest, so negating the id
    # makes the LOWEST id win score ties deterministically on both
    # engines.
    winners = clustered.groupBy("cluster_id").agg(
        F.expr(
            f"max_by({id_col}, struct({score_col} as s, -{id_col} as ni))"
        ).alias("_keep_id")
    )
    return (
        docs.select(F.col(id_col))
        .join(lab, id_col, "left")
        .join(sc, id_col, "left")
        .join(winners, "cluster_id", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col).cast("bigint")).alias(
                "cluster_id"
            ),
            F.col(score_col),
            (F.col("_keep_id").isNull() | (F.col("_keep_id") == F.col(id_col))).alias(
                "kept"
            ),
        )
    )
