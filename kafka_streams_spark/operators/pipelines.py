"""End-to-end corpus-curation pipeline: the composition a training-data
team actually runs — quality gate → PII gate → exact dedup → token
budget — expressed as ONE fused scan + ONE window shuffle.

Composability is the point: every stage reuses the text-operator
expression vocabulary (tokens / bpe_ish_count / quality_expr /
PII_PATTERNS / md5 fingerprints), and because each stage is a pure
Column expression over the same row, Catalyst evaluates the whole gate
in a single pass over the corpus — no joins between the quality, PII,
and fingerprint "stages". The only shuffle is the dedup window keyed on
the content hash. At 100 TB: one read of the corpus, one hash exchange
of (md5, winner) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_spark.operators.dedup import tokens
from kafka_streams_spark.operators.text import (
    PII_PATTERNS,
    bpe_ish_count,
    quality_expr,
)


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated corpus manifest: docs passing the quality gate, with no
    PII hits, exact-deduplicated (min-id winner per normalized-text md5),
    with their BPE-ish token budget.

    Output: (doc_id, source, n_tokens_bpe, quality) — the manifest a
    downstream tokenizer run consumes.
    """
    t = F.col(text_col)
    has_pii = None
    for rx in PII_PATTERNS.values():
        c = F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0))) > 0
        has_pii = c if has_pii is None else has_pii | c
    base = docs.select(
        F.col(id_col),
        F.col("source"),
        quality_expr(t).alias("quality"),
        has_pii.alias("has_pii"),
        F.md5(F.concat_ws(" ", tokens(t))).alias("exact_md5"),
        bpe_ish_count(t).alias("n_tokens_bpe"),
    )
    gated = base.filter((F.col("quality") >= min_quality) & ~F.col("has_pii"))
    # the exact-dedup step IS dedup.dedup_exact_rows (min-id winner per
    # content hash) — composed, not re-implemented, so the shared
    # contract has one definition
    from kafka_streams_spark.operators.dedup import dedup_exact_rows

    return dedup_exact_rows(gated, ["exact_md5"], id_col).select(
        F.col(id_col), "source", "n_tokens_bpe", "quality"
    )


def curate_corpus_fuzzy(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    min_quality: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curation with NEAR-duplicate removal: token-Jaccard pairs (blocked
    by source) → connected components → drop every non-canonical cluster
    member (min-id survives) → the standard gates (quality, PII, exact
    dedup, token budget).

    The full production shape: pair generation and clustering run over
    the raw corpus, then the manifest gates run over survivors only.
    Composition of three independently oracle-checked operators, itself
    oracle-checked end-to-end (recursive CTE reproduces the cluster
    fixpoint in SQL).
    """
    from kafka_streams_spark.operators.dedup import (
        dedup_exact_rows,
        duplicate_clusters,
        ngram_jaccard_pairs_auto,
    )

    # exact dedup FIRST (word_shingles' documented guard): exact
    # duplicates share every shingle, so they always land in one
    # cluster whose min-id member survives — identical output — but
    # running the pair stage over the raw corpus quadratically
    # expanded exact-duplicate bulk (and every blank doc shares the
    # single [''] shingle: B blanks = O(B^2) candidate pairs before
    # any gate could intervene; r10 review fix)
    reps = dedup_exact_rows(docs, [text_col], id_col)
    # engine-dispatched pair stage (r11): at this pipeline's high
    # threshold the AllPairs prefix filter collapses the candidate
    # space (measured 2.4 s vs 15.5 s blocked at sf0.1 n=1 θ=0.8) and
    # the auto form prices the corpus and routes — output identical
    # across forms by the pinned auto==blocked==prefix equality
    pairs = ngram_jaccard_pairs_auto(
        reps, id_col=id_col, text_col=text_col, n=1,
        threshold=jaccard_threshold, block_col="source",
    )
    clusters = duplicate_clusters(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    kept = reps.join(losers, id_col, "left_anti")
    return curate_corpus(kept, min_quality=min_quality, id_col=id_col, text_col=text_col)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Test-set-leak guard: flag training documents sharing word
    n-grams with an evaluation/benchmark corpus — the decontamination
    pass every LLM data pipeline runs before training (the reference
    engine has no analog; this is §2.5 north-star scope).

    Scale shape: eval suites are tiny next to a 100 TB training corpus,
    so the benchmark's DISTINCT n-gram set builds once and BROADCASTS;
    the training side explodes to (doc, shingle) and probes the hash
    table in-place — no shuffle of the exploded corpus. Only the
    matching incidences (rare by construction) reach the per-doc count
    aggregation, and the final left join marks clean docs with 0.

    Output: (id_col, n_overlap, contaminated) — n_overlap counts
    DISTINCT shared shingles (word_shingles de-dups per doc).

    SHORT-ITEM BLIND SPOT (r10 review): a benchmark item shorter than
    ``n`` words shingles to its WHOLE text, which can never equal an
    n-word gram from the training side — a 2-word eval answer pasted
    verbatim into training text reports n_overlap=0. For suites with
    short items, lower ``n`` (n=1 compares vocabularies) or run
    :func:`~kafka_streams_spark.operators.text.decontaminate_exact`,
    whose substring probe has no length floor. The same applies to
    :func:`contamination_report`'s leak_share.
    """
    from pyspark.sql.functions import broadcast

    from kafka_streams_spark.operators.dedup import word_shingles

    bench_ngrams = benchmark.select(
        F.explode(word_shingles(F.col(bench_text_col), n)).alias("s")
    ).distinct()
    doc_ngrams = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("s")
    )
    overlap = (
        doc_ngrams.join(broadcast(bench_ngrams), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        docs.join(overlap, id_col, "left_outer")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
        .select(id_col, "n_overlap", "contaminated")
    )


def curate_increment(
    new_docs: DataFrame,
    existing: DataFrame,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "crc32",
    existing_sig: DataFrame | None = None,
) -> DataFrame:
    """The recurring-crawl curation pipeline end-to-end: curate a corpus
    INCREMENT against an already-final corpus — exact membership gate
    (:func:`~kafka_streams_spark.operators.dedup.dedup_incremental`:
    anti-join on content hash + internal exact dedup), fuzzy membership
    gate (:func:`~kafka_streams_spark.operators.dedup.
    dedup_incremental_fuzzy`: MinHash bands vs the existing corpus,
    exact Jaccard verify), then the manifest gates
    (:func:`curate_corpus`: quality, PII, normalized-text dedup, token
    budget).

    Ordering is the cost ladder: the exact gate is the cheapest (hashes
    only) and removes re-crawled bulk before the fuzzy gate pays for
    signatures; the expression gates run last, over survivors only.
    At 100 TB pass the persisted signature table (written once per
    corpus build by ``write_minhash_index``) as ``existing_sig``: the
    existing side then contributes its hash column, its signature table,
    and an id-pruned read of just the candidate pairs' text for the
    exact verify — never a full-corpus text pass.

    Output: (doc_id, source, n_tokens_bpe, quality) — the delta-day
    manifest to append to the corpus.
    """
    from kafka_streams_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_fuzzy,
    )

    fresh = dedup_incremental(new_docs, existing, id_col=id_col, text_col=text_col)
    survivors = dedup_incremental_fuzzy(
        fresh,
        existing,
        id_col=id_col,
        text_col=text_col,
        threshold=jaccard_threshold,
        hash_fn=hash_fn,
        existing_sig=existing_sig,
    )
    return curate_corpus(
        survivors, min_quality=min_quality, id_col=id_col, text_col=text_col
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-benchmark-item leak report — the mirror image of
    :func:`decontaminate`: instead of flagging TRAINING docs that share
    n-grams with the benchmark, score each BENCHMARK item by how much of
    its n-gram set already appears anywhere in the training corpus.
    ``leak_share`` near 1.0 means the eval item is effectively inside
    the training set and its score is memorization, not generalization —
    the per-item audit table behind a decontamination sign-off.

    Shape: the training side collapses to a DISTINCT n-gram set (the
    expensive step — one shuffle, map-side partial dedup; at corpus
    scale this is the same persisted gram table decontaminate would
    reuse), the benchmark side explodes per (item, gram), and one left
    join + per-item aggregate scores each item. The benchmark is tiny
    relative to training, so AQE broadcasts the exploded benchmark side
    of the join, and the training gram table never moves twice.

    ``leak_share`` is one double division (IEEE-identical in the DuckDB
    oracle); every doc emits ≥1 shingle, so no zero guard is needed.

    Output: (id, n_grams bigint, n_leaked bigint, leak_share double).
    """
    from kafka_streams_spark.operators.dedup import word_shingles

    bsh = bench.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    tset = train.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    ).distinct()
    # decontaminate's join shape, mirrored: the corpus-scale distinct
    # gram table streams past a BROADCAST of the tiny benchmark grams
    # (the old left join preserved the benchmark on the left, which
    # Spark can only satisfy by shuffling the big right side in full —
    # r10 review fix); per-(id, gram) rows are unique on both sides, so
    # the inner-join count per item equals the old hit count exactly
    totals = bsh.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    hits = (
        tset.join(F.broadcast(bsh), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_leaked"))
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_leaked", F.coalesce(F.col("n_leaked"), F.lit(0).cast("bigint")))
        .withColumn(
            "leak_share",
            F.col("n_leaked").cast("double") / F.col("n_grams").cast("double"),
        )
    )


def quality_gate_agreement(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Gate-agreement audit: evaluate the three document-quality gates
    the engine ships (Gopher rules, C4 cleaning survival, the composite
    ``quality_expr`` threshold) on every document IN ONE SCAN and count
    each verdict combination. The 2³ contingency table is how a curation
    team picks gates: cells where gates disagree are exactly the docs to
    sample and eyeball before betting a training run on one gate.

    All three verdicts are pure Column expressions over the same row
    (``gopher_passes_expr`` / ``c4_passes_expr`` / ``quality_expr``), so
    Catalyst fuses them into a single map-only projection — one corpus
    read, one tiny aggregate exchange collapsing to ≤ 8 rows map-side.
    ``share`` divides by the total via a window over the 8-row result,
    not a second scan.

    Output: (passes_gopher, passes_c4, passes_quality boolean,
    n_docs bigint, share double).
    """
    from kafka_streams_spark.operators.text import c4_passes_expr, gopher_passes_expr

    t = F.col(text_col)
    flags = docs.select(
        gopher_passes_expr(t).alias("passes_gopher"),
        c4_passes_expr(
            t,
            min_words_per_line=min_words_per_line,
            require_terminal_punct=require_terminal_punct,
        ).alias("passes_c4"),
        (quality_expr(t) >= F.lit(min_quality)).alias("passes_quality"),
    )
    counts = flags.groupBy("passes_gopher", "passes_c4", "passes_quality").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return counts.withColumn(
        "share", F.col("n_docs").cast("double") / total.cast("double")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Id-level diff between two corpus versions — the release audit a
    recurring pipeline runs before shipping snapshot N+1: every doc id
    classified ``added`` / ``removed`` / ``changed`` / ``unchanged``
    (changed = same id, different text). Complements
    :func:`~kafka_streams_spark.operators.text.corpus_overlap`'s
    n-gram-content Venn with exact id accounting — together they answer
    "what changed" and "does it still cover the same content".

    Texts compare by md5 digest computed MAP-SIDE, so the full outer
    join shuffles (id, 32-byte digest) — document bodies never move,
    the digest-only-shuffle rule. One shuffle per side.

    NULL text is in-contract: presence is carried by an explicit flag
    per side (md5(NULL) is NULL, so the digest cannot double as the
    presence marker), and digests compare null-safely — two NULL-text
    versions of a doc are ``unchanged``, NULL vs non-NULL is
    ``changed``.

    Output: (doc_id, status) for every id in either version.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_ho"), F.lit(1).alias("_po")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_hn"), F.lit(1).alias("_pn")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(~F.col("_ho").eqNullSafe(F.col("_hn")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def corpus_scorecard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus release scorecard: document count and how many
    pass each curation gate — Gopher rules, C4 cleaning, the blocklist,
    and PII presence — in ONE scan (every gate is a map-only
    expression, so they all fold into a single partial+final
    aggregate). The executive twin of ``quality_gate_agreement``'s
    2³ contingency table; run per snapshot and trend the columns.

    Output: (n_docs, n_gopher_pass, n_c4_pass, n_badword_free,
    n_pii_free) — exact integers.
    """
    from kafka_streams_spark.operators.text import (
        BADWORDS,
        PII_PATTERNS,
        c4_passes_expr,
        gopher_passes_expr,
    )
    from kafka_streams_spark.operators.dedup import tokens

    t = F.col(text_col)
    # NULL text trivially contains neither badwords nor PII — scan the
    # coalesced empty string so those docs count as FREE instead of
    # falling through when()'s NULL to the failing branch (r7
    # self-review find; a crawl batch with missing text fields
    # otherwise reads as a PII spike). Gopher/C4 stay failing for NULL
    # text: no content is not a quality pass.
    t_s = F.coalesce(t, F.lit(""))
    bad_lit = F.array(*[F.lit(w) for w in BADWORDS])
    n_bad = F.size(F.filter(tokens(t_s), lambda x: F.array_contains(bad_lit, x)))
    pii_hit = None
    for rx in PII_PATTERNS.values():
        c = F.size(F.regexp_extract_all(t_s, F.lit(rx), F.lit(0))) > 0
        pii_hit = c if pii_hit is None else pii_hit | c
    return docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(gopher_passes_expr(t).cast("int")).cast("bigint").alias("n_gopher_pass"),
        F.sum(c4_passes_expr(t).cast("int")).cast("bigint").alias("n_c4_pass"),
        F.sum(F.when(n_bad == 0, 1).otherwise(0)).cast("bigint").alias("n_badword_free"),
        F.sum(F.when(~pii_hit, 1).otherwise(0)).cast("bigint").alias("n_pii_free"),
    )
