"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Pure Column expressions (whole-stage codegen)
except where measurement says otherwise — `repetition_stats` is an
Arrow-batched pandas UDF (see its docstring for the numbers). Each
operator has an ANSI-SQL twin for the DuckDB oracle (see
__spark_entry__), so semantics are pinned cross-engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_spark.functions.partitioning import materialize_shared
from kafka_streams_spark.operators.dedup import tokens

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + frozen: the heuristic must be reproducible in SQL.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "un"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
}

# A BPE-ish word/number/punctuation segmentation: word pieces, numbers,
# single punctuation marks — the shape tokenizers like GPT-2's regex use.
# The whitespace exclusion is the EXPLICIT ASCII class, not \s: this
# literal is shared verbatim with the DuckDB oracles, and Java's \s
# includes \x0b (vertical tab) while RE2's does not — with \s a \x0b
# character counted as a token in DuckDB but not in Spark (r8
# divergence find, pinned by the fuzz corpus's \x0b documents).
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\x0C\r]"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_count(text: Column) -> Column:
    """Token count under the BPE-ish regex segmentation (closer to LLM
    token budgeting than whitespace splitting)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), F.lit(0)))


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document statistics used by quality filters: char/word/token
    counts, mean word length, punctuation density, stopword ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        bpe_ish_count(t).alias("n_tokens_bpe"),
        (n_chars.cast("double") / F.greatest(n_words, F.lit(1))).alias("chars_per_word"),
        (punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (stop_hits.cast("double") / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))).alias(
            "stopword_ratio"
        ),
    )


def quality_expr(t: Column) -> Column:
    """Composite quality heuristic in [0,1] as a single Column expression
    over the raw text — C4/Gopher-style: length in a sane band, words
    not too long, some punctuation, some stopwords. Deterministic
    arithmetic only (reproducible in SQL); expression form so pipelines
    can fuse the gate into a wider single-scan projection."""
    toks = tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    chars_per_word = n_chars.cast("double") / F.greatest(n_words, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(t, r"[^.!?,;:]", "")).cast(
        "double"
    ) / F.greatest(n_chars, F.lit(1))
    stopword_ratio = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    ).cast("double") / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))
    length_ok = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.0)
    wordlen_ok = F.when((chars_per_word >= 3) & (chars_per_word <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio > 0, 1.0).otherwise(0.0)
    return (length_ok + wordlen_ok + punct_ok + stop_ok) / 4.0


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc composite quality score (see :func:`quality_expr`)."""
    return docs.select(F.col(id_col), quality_expr(F.col(text_col)).alias("quality"))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: count distinct-token hits against
    each language's frozen stopword list; argmax wins, ties broken by
    STOPWORDS declaration order (en, es, de, fr — NOT alphabetical
    code order; the when-chain takes the first maximal entry, and the
    language_confusion twin pins the identical chain), zero hits →
    'und' (unknown).

    This is the classic cheap LID for corpus triage; swap in a real
    model (fastText etc.) behind the same (id, lang) contract when the
    container has one.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    hit_cols = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(f"hits_{lang}")
        for lang, ws in STOPWORDS.items()
    ]
    scored = docs.select(F.col(id_col), *hit_cols)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    # reversed: earlier languages win ties via later .when() precedence
    for lang in reversed(langs):
        guess = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    return scored.select(F.col(id_col), guess.alias("lang_guess"))


def winnowing_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al.): rolling k-gram
    hashes, min-sampled per sliding window — the standard local-similarity
    fingerprint (MOSS). Output: (id, sorted distinct selected hashes).

    Pure Column expressions: token k-grams → hash → per-window
    ``array_min`` over a slice — guarantees at least one fingerprint per
    window, so any shared substring of ≥ k+window-1 tokens yields a
    shared fingerprint (the winnowing detection guarantee).

    ``hash_fn``: ``"xxhash64"`` (default, fastest — JVM codegen, not
    reproducible outside Spark) or ``"md5_60"`` (first 15 hex chars of
    md5 parsed as a 60-bit big-endian integer — bit-identical to DuckDB's
    ``CAST('0x' || substr(md5(g),1,15) AS BIGINT)``, which is what makes
    the contract query oracle-checkable; ~same plan shape, one extra
    string stage per gram).
    """
    from pyspark.sql import Window as W

    from kafka_streams_spark.functions.partitioning import spread

    # Flat explode + window-min formulation. A nested
    # transform(seq, i -> array_min(slice(grams, i, w))) re-evaluates the
    # grams subtree per outer element in interpreted HOF eval — O(n²·k)
    # per doc, measured 186s at sf0.1. Exploding to (doc, pos, hash) rows
    # and taking min() over a rows-window keeps everything in codegen:
    # one narrow shuffle on doc id, linear work.
    if hash_fn == "xxhash64":
        def gram_hash(g):
            return F.xxhash64(g)
    elif hash_fn == "md5_60":
        def gram_hash(g):
            return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")

    toks = tokens(F.col(text_col))  # positional k-grams (not deduped)
    n_grams = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: gram_hash(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    # zero-token (empty/NULL/whitespace-only) docs emit NO fingerprints:
    # the min-1 gram count would otherwise hash the empty string, every
    # blank page would share that fingerprint, and
    # substring_overlap_pairs would both report blank-pair "verbatim
    # spans" over zero tokens and expand the single hash('') bucket
    # quadratically (r7 self-review find; oracle mirrored). Docs with
    # 1..k-1 tokens keep the whole-doc single gram.
    exploded = (
        spread(docs)
        .filter(F.size(toks) >= 1)
        .select(F.col(id_col), F.posexplode(grams).alias("pos", "h"))
    )
    w_ahead = (
        W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    )
    w_all = W.partitionBy(id_col)
    wmins = (
        exploded.withColumn("wmin", F.min("h").over(w_ahead))
        .withColumn("n", F.count("*").over(w_all))
        # full windows only (winnowing defines n_grams - window + 1 of
        # them); short docs (n <= window) keep their single window at pos 0
        .filter((F.col("pos") <= F.col("n") - window) | (F.col("pos") == 0))
    )
    return wmins.groupBy(id_col).agg(
        F.array_sort(F.collect_set("wmin")).alias("fingerprints")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Two content fingerprints per doc:
    - exact_md5: md5 of whitespace-normalized lowercase text (byte dedup)
    - bag_md5: md5 of the sorted distinct token set (order/word-shuffle
      invariant — catches paraphrase-by-reordering duplicates)
    md5 (not xxhash64) so the DuckDB oracle can reproduce it exactly.
    """
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col(text_col)))))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("exact_md5"),
        F.md5(bag).alias("bag_md5"),
    )


def top_tokens(docs: DataFrame, k: int = 20, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k most frequent tokens. explode → count is one
    shuffle with map-side partial counts (per-task token tallies), and
    the top-k is a TakeOrderedAndProject heap, not a global sort.
    Deterministic tiebreak on the token itself."""
    from kafka_streams_spark.functions.partitioning import spread

    tok = spread(docs).select(F.explode(tokens(F.col(text_col))).alias("tok"))
    return (
        tok.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(k)
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams — the language-model corpus
    statistic behind boilerplate detection (over-frequent n-grams) and
    LM smoothing tables.

    All expression-level: per doc, the n-gram list is built by sliding
    `slice(toks, i, n)` over `sequence(1, len-n+1)` (guarded — Spark's
    sequence(1, 0) generates a DESCENDING [1,0], so short docs must
    produce an empty array, not an inverted range). Then one explode →
    map-side-partial count → TakeOrderedAndProject heap top-k: the same
    single-shuffle shape as `top_tokens`, with n·|tokens| intermediate
    rows instead of |tokens|.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from kafka_streams_spark.functions.partitioning import spread

    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        spread(docs)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram"))
        .limit(k)
    )


def doc_length_buckets(docs: DataFrame, bucket_chars: int = 200) -> DataFrame:
    """Document length histogram — the standard first look at a new
    corpus. Buckets are fixed-width on n_chars; one partial-aggregated
    shuffle of (bucket) pairs."""
    b = F.floor(F.col("n_chars") / bucket_chars).alias("bucket")
    return (
        docs.groupBy(b)
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the Gopher-rules family): duplicate
    line ratio and the fraction of all word bigrams taken by the single
    most frequent bigram. High values flag boilerplate/spam for corpus
    filtering.

    Shape: ZERO shuffles — both signals are per-row statistics, so the
    operator is an Arrow-batched pandas UDF: embarrassingly parallel,
    no exchange, C-speed dict counting. This is the measured exception
    to "built-in expressions first": the explode → groupBy(doc, gram) →
    groupBy(doc) expression form pays two exchanges of every bigram
    occurrence (≈2× the corpus shuffled, twice, for a per-row stat) and
    ran 9× slower at sf0.1; a codegen'd run-length fold over sorted
    bigram arrays (F.aggregate with a struct accumulator) avoided the
    shuffles but fell out of whole-stage codegen and ran 35× slower.

    The UDF body matches the DuckDB oracle's tokenizer exactly:
    the ASCII ``_WS_ASCII`` split == the \\s+ expression/oracle
    tokenizers (never bare ``str.split()`` — unicode whitespace); bigrams as token
    TUPLES equal the concat_ws(' ') form since tokens contain no
    whitespace.
    """
    from collections import Counter

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("dup_line_ratio", DoubleType()),
            StructField("top_bigram_fraction", DoubleType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def rep_stats(text: pd.Series) -> pd.DataFrame:
        import re as _re

        _ws = _re.compile(r"[ \t\n\x0b\x0c\r]+")  # == dedup._WS_ASCII
        dup, top = [], []
        for s in text:
            # blank-line rule on the ASCII whitespace class only —
            # bare str.strip() also eats \xa0/\u2009 and would call a
            # nbsp-only line blank while the SQL twin keeps it (the r8
            # _WS_ASCII convention)
            lines = [
                ln
                for ln in (s or "").split("\n")
                if ln.strip(" \t\x0b\x0c\r")
            ]
            dup.append(1.0 - len(set(lines)) / len(lines) if lines else 0.0)
            toks = [t for t in _ws.split((s or "").lower()) if t]
            if len(toks) >= 2:
                counts = Counter(zip(toks, toks[1:]))
                top.append(max(counts.values()) / (len(toks) - 1))
            else:
                top.append(0.0)
        return pd.DataFrame({"dup_line_ratio": dup, "top_bigram_fraction": top})

    return docs.select(
        F.col(id_col), rep_stats(F.col(text_col)).alias("_r")
    ).select(id_col, "_r.*")


PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # explicit whitespace class, NOT \s: Java \s includes U+000B
    # (vertical tab) while RE2's does not — the same divergence
    # normalize_text documents. The explicit class is identical in
    # both engines, so redaction spans agree on \x0B too.
    "urls": r"https?://[^ \t\n\x0B\f\r]+",
    "ipv4s": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scan(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII indicator counts (emails / URLs / IPv4s) — the
    redaction pre-pass of a training-data pipeline. Patterns are RE2-safe
    (no backrefs/lookaround) so Spark and DuckDB agree exactly; counting
    is `regexp_extract_all` + `size`, all codegen."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0))).alias(name)
        for name, rx in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col), *counts)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        flag = c if flag is None else flag | c
    return out.withColumn("has_pii", flag)


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus vocabulary profile: document count, total token
    occurrences, distinct vocabulary size, hapax count (tokens seen
    exactly once) and the top token's frequency — the Heaps/Zipf numbers
    a corpus audit starts with (hapax share predicts OOV rate; top-token
    mass flags boilerplate).

    Two shuffles, both tiny on the reduce side: explode → per-token
    count (map-side partial, reduces to |vocab| rows), then a single
    1-row rollup over the vocabulary table. The corpus is scanned once.
    """
    from kafka_streams_spark.functions.partitioning import spread

    tok = spread(docs).select(F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("n"))
    # coalesce: an empty (or all-blank-text) corpus is counts 0, not
    # NULL — the same pinned convention as corpus_drift/corpus_overlap
    # (r7 self-review find; sums/max over the zero-row vocab table are
    # otherwise NULL). top_token_freq 0 = "no tokens".
    stats = vocab.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct_tokens"),
        F.coalesce(F.sum(F.when(F.col("n") == 1, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.coalesce(F.max("n"), F.lit(0)).cast("bigint").alias("top_token_freq"),
    )
    # Doc count joins in as a broadcast 1-row aggregate (the tf_idf
    # pattern) — no driver-side count() job during construction.
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    return stats.crossJoin(F.broadcast(n_docs)).select(
        "n_docs", "n_tokens", "n_distinct_tokens", "n_hapax", "top_token_freq"
    )


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact PII spans in place — the action step after :func:`pii_scan`
    flags documents: emails/URLs/IPv4s are replaced with fixed
    ``<TYPE>`` sentinels so downstream token statistics stay stable.

    Order is pinned (emails, then urls, then ipv4s) and nested matches
    resolve by that order: an email inside a URL query string becomes
    <EMAIL> first, and the URL pass then swallows the whole remainder —
    including the <EMAIL> sentinel, which has no whitespace — into
    <URL>; an IP that is a URL host likewise disappears into <URL>.
    Pure chained `regexp_replace` — map-only, zero shuffle, codegen;
    the same RE2-safe patterns as pii_scan so scan/redact agree on
    what PII is. The DuckDB oracle applies the identical order and
    patterns, so the contract is exact.

    Output: (id, redacted text, n_redactions). n_redactions counts all
    three patterns over the ORIGINAL text, so nested matches (an email
    inside a URL, an IP as a URL host) are counted once per pattern —
    it can exceed the number of sentinels actually left in the text.
    It is a PII-density signal for curation gates (drop documents that
    are mostly PII), not a count of replaced spans.
    """
    t = F.col(text_col)
    n = F.lit(0)
    for name in ("emails", "urls", "ipv4s"):
        n = n + F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS[name]), F.lit(0)))
    red = t
    for name, tag in (("emails", "<EMAIL>"), ("urls", "<URL>"), ("ipv4s", "<IP>")):
        red = F.regexp_replace(red, PII_PATTERNS[name], tag)
    return docs.select(
        F.col(id_col),
        red.alias("text"),
        n.cast("bigint").alias("n_redactions"),
    )


def dedup_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level line deduplication (the C4-style boilerplate pass):
    every non-blank line that occurs at more than one (doc, position)
    in the corpus keeps only its FIRST occurrence (min doc id, then min
    position); navigation chrome, cookie banners and licence footers
    collapse to one copy corpus-wide. Docs whose every line is a later
    duplicate drop out entirely.

    Shape: posexplode lines → the first occurrence per line is an
    AGGREGATE (``min(struct(doc, pos))`` with map-side partial combine),
    NOT a window — a window would hash-partition by line and sort
    within line groups, and the super-common lines (exactly the ones
    being deduped) are maximal skew; the min-struct aggregate reduces
    them map-side to one row per line per task. Join back (broadcast
    when the distinct-line table is small, AQE otherwise), keep rows
    that ARE their line's first occurrence, reassemble per doc with an
    expression-level sort of (pos, line) structs. Two shuffles total:
    line agg+join key, then the doc regroup.

    Output: (id, text, n_lines) — the reassembled text and surviving
    line count. Docs with NO content lines at all (NULL text, blank
    text) are KEPT with text='' and n_lines=0: a mid-pipeline rewrite
    operator must not silently delete documents (split(NULL) explodes
    to zero rows — the remove_boilerplate r7 fix, applied to this
    sibling in r10). Docs whose every line is a LATER duplicate still
    drop out — that is the operator's documented job.
    """
    from kafka_streams_spark.functions.partitioning import spread

    raw_lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    lines = spread(docs).select(
        F.col(id_col), F.posexplode(raw_lines).alias("pos", "ln")
    ).filter(F.trim(F.col("ln")) != "")
    firsts = lines.groupBy("ln").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("_first")
    )
    kept = lines.join(firsts, "ln").filter(
        (F.col(id_col) == F.col("_first.d")) & (F.col("pos") == F.col("_first.p"))
    )
    ordered = F.array_sort(F.collect_list(F.struct("pos", "ln")))
    deduped = kept.groupBy(id_col).agg(
        F.array_join(F.transform(ordered, lambda s: s["ln"]), "\n").alias("text"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    # restore content-less docs (NULL/blank text: zero non-blank lines)
    blanks = (
        docs.filter(
            F.size(
                F.filter(raw_lines, lambda l: F.trim(l) != F.lit(""))
            )
            == 0
        )
        .select(
            F.col(id_col),
            F.lit("").alias("text"),
            F.lit(0).cast("bigint").alias("n_lines"),
        )
    )
    return deduped.unionByName(blanks)


def remove_boilerplate(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency-threshold boilerplate stripping: every non-blank line
    that appears in at least ``min_docs`` DISTINCT documents is removed
    from ALL of them (navigation chrome, cookie banners, licence
    footers). The policy complement of :func:`dedup_lines` — that keeps
    each duplicated line's first occurrence; a boilerplate line is junk
    *everywhere*, including its first home.

    Every input document survives with a row (possibly empty text) —
    curation gates decide drops, this operator only edits; keeping the
    doc count stable is what lets it sit mid-pipeline. Blank lines are
    neither counted nor kept (the C4 line discipline `dedup_lines`
    follows).

    Shape: posexplode lines → per-line distinct-doc counts (two-phase
    aggregate, map-side partial; the super-common lines being removed
    are maximal skew and collapse map-side) → line-key join back
    (broadcast when the boilerplate table is small, AQE otherwise) →
    one per-doc regroup with an expression-level (pos, line) sort.
    Empty/fully-stripped docs keep their row because every doc
    posexplodes to ≥1 line row and the regroup aggregates ALL of them,
    flagging kept lines inside the aggregate instead of filtering rows
    before it (the `oov_rate` zero-row lesson). NULL text is
    coalesced to '' BEFORE the split for the same reason —
    split(NULL) is NULL and posexplode of NULL emits no row, which
    would silently drop the doc (round-7 advice fix); a NULL-text doc
    survives as (id, '', 0, 0).

    Output: (id, text, n_kept, n_removed).
    """
    from kafka_streams_spark.functions.partitioning import spread

    lines = spread(docs).select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "ln"),
    )
    nonblank = F.trim(F.col("ln")) != ""
    boiler = (
        lines.filter(nonblank)
        .groupBy("ln")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("ln", F.lit(True).alias("_bp"))
    )
    flagged = lines.join(boiler, "ln", "left")
    kept = nonblank & F.col("_bp").isNull()
    removed = nonblank & F.col("_bp").isNotNull()
    ordered = F.array_sort(
        F.collect_list(F.when(kept, F.struct("pos", "ln")))
    )  # collect_list skips the NULLs the when() leaves for dropped lines
    return flagged.groupBy(id_col).agg(
        F.array_join(F.transform(ordered, lambda s: s["ln"]), "\n").alias("text"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.sum(removed.cast("bigint")).alias("n_removed"),
    )


def lm_unigram_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-unigram language-model score per document — the cheap
    perplexity proxy used as a quality gate in large-corpus curation
    (docs whose tokens are improbable under the corpus's own unigram
    distribution are boilerplate, binary junk, or wrong-language):
    mean log10 probability of the document's token occurrences under
    the add-one-smoothed corpus unigram model,
    p(tok) = (count(tok) + 1) / (total_tokens + |vocab|).

    Shape: one explode pass feeds BOTH the vocabulary aggregation and
    the scoring join (Spark reuses the scan); the (token, count) table
    joins back on the token key — broadcast when the vocabulary is
    small, AQE-planned shuffle join otherwise (token-key skew on
    stopwords is exactly what AQE skew-splitting handles); the 1-row
    totals ride a broadcast cross join (the corpus_stats pattern — no
    driver action). Per-doc mean folds in one map-side-partial
    aggregation. Output: (id, n_tokens, avg_logprob), rounded 6 dp —
    cross-engine double sums agree well past that.
    """
    from kafka_streams_spark.functions.partitioning import spread

    tok = spread(docs).select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("_n"))
    totals = vocab.agg(
        F.sum("_n").alias("_t"), F.count("*").alias("_vsz")
    )
    scored = tok.join(vocab, "tok").crossJoin(F.broadcast(totals))
    logp = F.log10((F.col("_n") + F.lit(1.0)) / (F.col("_t") + F.col("_vsz")))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(F.avg(logp), 6).alias("avg_logprob"),
    )


def lm_bigram_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-bigram conditional LM score per document — the order-aware
    upgrade of :func:`lm_unigram_score`: mean log10 of the add-one
    smoothed conditional p(w2|w1) = (c(w1 w2) + 1) / (c1(w1) + |V|)
    over the document's bigram occurrences, where c1(w1) counts w1 as a
    bigram CONTEXT (occurrences as a bigram's first token) and |V| is
    the distinct unigram vocabulary. A document whose tokens are
    corpus-plausible but shuffled scores high under the unigram model
    and low here — the scrambled-text / template-spam gate.

    Plan shape: one bigram explode feeds both the count aggregation and
    the scoring join (scan reuse, the lm_unigram_score pattern); context
    counts derive from the already-aggregated bigram table (groupBy its
    first token — no second corpus pass); |V| rides a 1-row broadcast.
    The scoring join is token-keyed — stopword-context skew is AQE
    skew-split territory, same note as lm_unigram_score. Docs with < 2
    tokens have no bigrams and drop out. Output: (id, n_bigrams,
    avg_logprob) rounded 6 dp.
    """
    from kafka_streams_spark.functions.partitioning import spread

    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = spread(docs).select(F.col(id_col), F.explode(grams).alias("_g"))
    gc = ng.groupBy("_g").agg(F.count("*").alias("_cg"))
    cc = gc.groupBy(F.substring_index("_g", " ", 1).alias("_w1")).agg(
        F.sum("_cg").alias("_cw")
    )
    vsz = docs.select(F.explode(toks).alias("_t")).agg(
        F.countDistinct("_t").alias("_v")
    )
    scored = (
        ng.join(gc, "_g")
        .join(cc, F.substring_index(F.col("_g"), " ", 1) == F.col("_w1"))
        .crossJoin(F.broadcast(vsz))
    )
    logp = F.log10((F.col("_cg") + 1.0) / (F.col("_cw") + F.col("_v")))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.avg(logp), 6).alias("avg_logprob"),
    )


def dsir_logratio(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    n: int = 2,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public arXiv
    2302.03169): score every document by how much more likely its hashed
    n-gram features are under a TARGET distribution (the high-quality
    reference corpus) than under the raw corpus's own distribution.
    Documents with high log-ratio resemble the target; feeding the
    weights to ``sampling.hash_sample``/``reservoir_sample`` completes
    the importance-resampling pipeline.

    Features are word n-grams hashed into ``n_buckets`` buckets
    (md5_32 % n_buckets — engine-reproducible, same construction as the
    MinHash contract path). Per occurrence of a feature in bucket b:

        log10((t_b + 1) / (T + B)) - log10((r_b + 1) / (R + B))

    with t/r the target/raw bucket counts, T/R their totals, B the
    bucket count (add-one smoothing both sides). Output per doc:
    ``(id, n_features, logratio)`` rounded 6 dp; docs with fewer than
    ``n`` tokens have no features and drop out (pinned by the oracle).

    Plan shape at 100 TB: both bucket-count tables collapse to
    ≤ n_buckets rows (one shuffle each, map-side partials); their join +
    windowed totals stay on that tiny table (the corpus_drift
    one-scan-per-side rule — no 1-row crossjoin re-planning the count
    subtree); the scoring join is a BROADCAST of the ≤4096-row stats
    table against the exploded corpus — map-only — and the per-doc sum
    is the only full-width shuffle. The raw corpus is scanned twice
    (count pass + score pass); at scale, persist the exploded features
    or fold this into the ingest pipeline's existing tokenize pass.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from pyspark.sql import Window

    from kafka_streams_spark.functions.partitioning import spread

    def features(frame: DataFrame, cols: list[Column]) -> DataFrame:
        toks = tokens(F.col(text_col))
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = F.explode(grams).alias("_g")
        out = spread(frame).select(*cols, g)
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        )
        return out.withColumn("_b", bucket)

    raw = features(docs, [F.col(id_col)])
    base_counts = raw.groupBy("_b").agg(F.count("*").alias("_rn"))
    tgt_counts = features(target, []).groupBy("_b").agg(F.count("*").alias("_tn"))
    w = Window.partitionBy()
    # FULL outer: a bucket the target populates but the raw corpus
    # never touches must still count toward T (the formula's target
    # total) — a LEFT join here silently shrank T whenever the target
    # was not a subset of the raw corpus (r7 self-review find; the
    # oracle always totaled the full target table). Target-only rows
    # carry _rn=0 and are never matched by the scoring join below
    # (raw buckets are base buckets by construction).
    stats = (
        base_counts.join(tgt_counts, "_b", "full_outer")
        .withColumn("_rn", F.coalesce(F.col("_rn"), F.lit(0)))
        .withColumn("_tn", F.coalesce(F.col("_tn"), F.lit(0)))
        .withColumn("_R", F.sum("_rn").over(w))
        .withColumn("_T", F.coalesce(F.sum("_tn").over(w), F.lit(0)))
    )
    contrib = F.log10((F.col("_tn") + 1.0) / (F.col("_T") + F.lit(n_buckets))) - F.log10(
        (F.col("_rn") + 1.0) / (F.col("_R") + F.lit(n_buckets))
    )
    return (
        raw.join(F.broadcast(stats), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_features"),
            F.round(F.sum(contrib), 6).alias("logratio"),
        )
    )


def keyword_search_bm25(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 keyword search over the corpus: rank documents for a
    bag-of-terms query (Robertson & Spärck Jones; the public BM25
    formula as used by Lucene/Elasticsearch). idf uses the
    non-negative variant log10(1 + (N - df + 0.5)/(df + 0.5)).

    Output: top-``k`` ``(id, score)`` rows, score rounded 6 dp, ordered
    by (score desc, id) — the rounded score is what's ranked so the
    cut-off is engine-reproducible.

    Plan shape: one pass over the text carries the document length
    through the explode (no lengths join); tokens are filtered to the
    query's terms BEFORE the tf aggregation, so the shuffle holds only
    docs that matched at least one term. The per-term df table is ≤
    |query| rows (broadcast), corpus N/avgdl ride the 1-row broadcast
    cross join (corpus_stats pattern), and the final top-k is a
    TakeOrderedAndProject heap — no global sort. The corpus text is
    scanned twice (N/avgdl pass + tf pass); at scale, maintain corpus
    stats as a tiny side table updated at ingest instead.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = [t.lower() for t in query_terms]
    toks = tokens(F.col(text_col))
    stats = docs.agg(
        F.count("*").alias("_N"), F.avg(F.size(toks)).alias("_avgdl")
    )
    tf = (
        docs.select(
            F.col(id_col),
            F.size(toks).alias("_dl"),
            F.explode(F.filter(toks, lambda t: t.isin(terms))).alias("_t"),
        )
        .groupBy(id_col, "_t")
        .agg(F.count("*").alias("_tf"), F.first("_dl").alias("_dl"))
    )
    df_t = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    scored = tf.join(F.broadcast(df_t), "_t").crossJoin(F.broadcast(stats))
    idf = F.log10(
        1.0 + (F.col("_N") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    term_score = idf * (
        F.col("_tf")
        * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


# explicit whitespace class for the \x0B Java-vs-RE2 parity reason
# documented at PII_PATTERNS["urls"]
DOMAIN_REGEX = r"https?://([^/ \t\n\x0B\f\r]+)"


def domain_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-domain URL statistics over the corpus — the source-mix /
    blocklist audit step of web-corpus curation (which domains dominate,
    what to down-sample). Extract group-1 domains from every URL,
    lowercase, aggregate: documents touching the domain + total URL
    occurrences. One explode + one aggregation shuffle on domain; hot
    domains are classic reduce skew — count-distinct partials still
    combine map-side, and `salted_aggregate` is the escape hatch if one
    domain dominates a crawl."""
    t = F.col(text_col)
    doms = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(t, F.lit(DOMAIN_REGEX), F.lit(1))).alias("_d"),
    ).select(F.col(id_col), F.lower(F.col("_d")).alias("domain"))
    return doms.groupBy("domain").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_urls"),
    )


def tf_idf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count in doc; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    sklearn-style). Shape: one explode+groupBy for per-(doc,term)
    counts, a groupBy for document frequencies, a broadcast-able join of
    the small df table back, and a per-doc window top-k — no pass ever
    carries more than (doc, term) pairs. Deterministic tiebreak
    (score desc, term asc); scores rounded to pin cross-engine double
    log/division ulps.

    N (the corpus size the idf needs) is a 1-row count aggregate
    broadcast-cross-joined into the tiny per-term df table — not a
    driver-side ``docs.count()``, which would be a second full corpus
    scan per invocation at 100 TB.
    """
    from pyspark.sql import Window as W

    from kafka_streams_spark.functions.partitioning import spread

    n_docs = docs.agg(F.count("*").alias("_n_docs"))  # 1-row, broadcast below
    tok = spread(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df")).join(
        F.broadcast(n_docs)
    )
    idf = F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(df_, "term").select(
        F.col(id_col),
        "term",
        F.round(F.col("tf") * idf, decimals).alias("tf_idf"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("tf_idf").desc(), F.col("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col(id_col), "term", "tf_idf", F.col("_rk").cast("int").alias("rk"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into fixed-size training
    chunks with overlap — the sequence-windowing step between curation
    and tokenization (pack_token_shards assigns whole docs to shards;
    this splits docs that exceed the context budget).

    Chunk k covers tokens [k·stride, k·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the last chunk is the remainder
    (never empty, never duplicated: a doc shorter than chunk_tokens
    yields exactly one chunk). Pure expressions: one tokens() split,
    a sequence() of chunk starts, posexplode, slice + concat_ws — per
    row fan-out only, NO shuffle, so chunking is embarrassingly
    parallel at any corpus size. Output: (doc_id, chunk_idx,
    chunk_text, n_tokens), deterministic.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_k"),
    )
    piece = F.slice(F.col("_toks"), F.col("_k") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def chunk_dup_stats(
    docs: DataFrame,
    chunk_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level duplication score — the RefinedWeb/Dolma-style
    sub-document dedup signal: split each doc into non-overlapping
    ``chunk_tokens`` windows (:func:`chunk_documents` with overlap 0),
    count how many of a doc's chunks also occur elsewhere in the corpus,
    and report per-doc totals. Output: (doc_id, n_chunks, n_dup_chunks,
    dup_per_mille) with dup_per_mille = floor(1000 * dup/total) — an
    exact integer, safe for the driver's value hash.

    A chunk is "duplicated" when its text occurs in more than one
    (doc, chunk) slot corpus-wide — within-doc repeats count too, which
    is what a boilerplate detector wants. Shape: chunking is map-only
    fan-out; chunk-text counts are one hash aggregation on the chunk
    hash (64-bit xxhash64, never the text itself, so shuffle rows are
    ~16 bytes); the count joins back to the chunk stream on the same
    hash key and rolls up per doc. Two shuffles total, both on compact
    keys, each with map-side partial aggregation — at 100 TB the wide
    chunk text stays columnar in the scan and never crosses the wire.
    """
    # The narrow (id, hash) chunk table feeds the count aggregate AND
    # the join-back — materialize the chunk explode once (see
    # weighted_jaccard_pairs for the reuse mechanics and caveats).
    chunks = materialize_shared(
        chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=0, id_col=id_col, text_col=text_col
        ).select(id_col, F.xxhash64("chunk_text").alias("_h"))
    )
    counts = chunks.groupBy("_h").agg(F.count("*").alias("_n"))
    return (
        chunks.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_dup_chunks",
            F.floor(F.lit(1000) * F.col("n_dup_chunks") / F.col("n_chunks"))
            .cast("long")
            .alias("dup_per_mille"),
        )
    )


def corpus_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Unigram distribution drift between two corpus slices — the QA
    check a data-mixing pipeline runs before swapping in a new crawl
    snapshot or re-weighting sources: did the token distribution move?

    The drift metric is total variation distance, computed EXACTLY in
    integer arithmetic: per shared-vocabulary token the numerator term
    is ``|cnt_a·T_b − cnt_b·T_a|`` (bigint — order-independent sum,
    unlike a float Σ|p_a−p_b| whose result depends on partition
    ordering; that exactness is what makes the number comparable across
    engines and re-runs), and TVD = numerator / (2·T_a·T_b) as a single
    scalar division at the end. KL/JS variants need per-token ``ln``
    whose last ulp differs across libm implementations — TVD is the
    drift metric that stays bit-deterministic.

    Shape: one token-count aggregate per side (the only corpus-sized
    shuffles), a full-outer merge of the two ~vocabulary-sized count
    tables, totals as a plain 1-row aggregate over the merged table
    broadcast-crossjoined back (the engine's 1-row-broadcast pattern,
    :func:`corpus_stats`), and a final scalar aggregate. The totals
    branch references the same count subtrees, and AQE's runtime stage
    reuse resolves both copies to ``ReusedExchange`` — each corpus is
    scanned ONCE per side at execution (pinned post-execution in
    ``test_plan_audit.py``). No step funnels unbounded rows to a single
    partition: the r4 form computed totals with an unpartitioned window
    over the vocabulary table — a 10⁸–10⁹-row single-partition sort at
    web-corpus scale (round-4 verdict, "What's wrong #1"); only the
    final 1-row aggregates use SinglePartition exchanges, and those
    reduce map-side first. Overflow bound: the summed numerator reaches
    2·TVD·T_a·T_b ≤ 2·T_a·T_b, so bigint safety needs
    2·T_a·T_b < 2^63 — beyond ~2·10^9 tokens per side, divide counts by
    a common 10^3 scale first (the ratio is unchanged).

    Output: 1 row — n_tokens_a/b, vocab_a/b, shared_vocab, tvd.
    """
    from kafka_streams_spark.operators.dedup import tokens

    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias(name))
        )

    joined = (
        counts(docs_a, "cnt_a")
        .join(counts(docs_b, "cnt_b"), "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    # coalesce(…, 0): a completely token-less side leaves `joined` with
    # zero rows, where a bare global aggregate returns NULLs — the
    # contract is counts 0 and tvd NULL.
    totals = joined.agg(
        F.coalesce(F.sum("cnt_a"), F.lit(0)).alias("_ta"),
        F.coalesce(F.sum("cnt_b"), F.lit(0)).alias("_tb"),
    )
    agg = joined.crossJoin(F.broadcast(totals)).agg(
        F.coalesce(F.max("_ta"), F.lit(0)).alias("n_tokens_a"),
        F.coalesce(F.max("_tb"), F.lit(0)).alias("n_tokens_b"),
        F.coalesce(F.sum((F.col("cnt_a") > 0).cast("long")), F.lit(0)).alias(
            "vocab_a"
        ),
        F.coalesce(F.sum((F.col("cnt_b") > 0).cast("long")), F.lit(0)).alias(
            "vocab_b"
        ),
        F.coalesce(
            F.sum(((F.col("cnt_a") > 0) & (F.col("cnt_b") > 0)).cast("long")),
            F.lit(0),
        ).alias("shared_vocab"),
        F.coalesce(
            F.sum(
                F.abs(
                    F.col("cnt_a") * F.col("_tb") - F.col("cnt_b") * F.col("_ta")
                )
            ),
            F.lit(0),
        ).alias("_numer"),
    )
    return agg.select(
        "n_tokens_a",
        "n_tokens_b",
        "vocab_a",
        "vocab_b",
        "shared_vocab",
        # NULL, not NaN, when a side has no tokens at all — there is no
        # distribution to compare (0/0 under IEEE would yield NaN here).
        F.when(
            (F.col("n_tokens_a") > 0) & (F.col("n_tokens_b") > 0),
            F.round(
                F.col("_numer")
                / (F.lit(2.0) * F.col("n_tokens_a") * F.col("n_tokens_b")),
                9,
            ),
        ).alias("tvd"),
    )


def length_outliers(
    docs: DataFrame,
    value_col: str = "n_chars",
    stratum_col: str = "source",
    id_col: str = "doc_id",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-stratum outlier gate: flag rows where
    ``|value − median| > k·MAD`` (median absolute deviation) — the
    quality filter that survives heavy-tailed length distributions where
    a mean/stddev z-score would let one 10 MB page drag the threshold.

    Exactness: the inputs are integers, so the exact median (and MAD)
    land on a .0/.5 grid — every comparison operand is an exact double
    and the flag is bit-deterministic cross-engine (no rounding pin
    needed, unlike pow/ln-based scores).

    Shape: two small per-stratum aggregates (median, then MAD over the
    median-joined values) broadcast back onto the scan; the corpus
    itself never shuffles. Exact percentile is a sort-based aggregate —
    at 100 TB swap ``percentile`` for ``percentile_approx`` (the
    operator's only order-N·logN piece) and keep the same gate; the
    exact form stays as the oracle twin at test scale.

    Output: the flagged rows — (id, stratum, value, med, mad).
    """
    v = F.col(value_col).cast("double")
    med = docs.groupBy(stratum_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = docs.join(F.broadcast(med), stratum_col)
    mad = with_med.groupBy(stratum_col).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), stratum_col)
        .filter(F.abs(v - F.col("med")) > F.lit(float(k)) * F.col("mad"))
        .select(
            id_col,
            stratum_col,
            F.col(value_col).cast("long").alias(value_col),
            "med",
            "mad",
        )
    )


def quality_calibrated(
    docs: DataFrame,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum quality calibration: each document's quality score
    mapped to its percent rank WITHIN its source — so one global
    threshold (e.g. "keep the top 60%") is source-fair instead of
    letting a verbose source crowd out a terse one (raw-score
    thresholds encode the sources' score distributions, not their
    relative quality).

    ``pct_rank`` is ``(rank-1)/(n-1)`` with a unique (quality, id)
    ordering, so it is exact rational arithmetic — deterministic
    cross-engine without a rounding pin (rounded to 9 dp for display
    only). One window per stratum; at 100 TB substitute the rank with
    a bucketed ECDF (aggregate per (stratum, score-bucket), cumulative
    sum over the tiny bucket table) if single strata outgrow a
    partition's sort budget.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col("quality"), F.col(id_col))
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            quality_expr(F.col(text_col)).alias("quality"),
        )
        .withColumn("pct_rank", F.round(F.percent_rank().over(w), 9))
    )


def substring_overlap_pairs(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    max_bucket: int | None = None,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing VERBATIM token spans — exact-substring
    cross-document duplication (quotations, mirrored boilerplate,
    copy-paste) found by joining winnowing fingerprints instead of
    scanning substrings: any common span of ≥ k+window-1 tokens
    guarantees ≥1 shared fingerprint (:func:`winnowing_fingerprint`'s
    detection guarantee), so recall for long spans is 1.0 and the whole
    search is one bucket equi-join on fingerprint values — the LSH cost
    shape, never O(n²) text compare.

    ``max_bucket`` drops fingerprints appearing in more than that many
    documents BEFORE pair expansion — the stop-fingerprint guard for
    corpus-wide boilerplate (a navbar span shared by a million pages
    would otherwise expand to ~10¹² pairs in one bucket). Spans shared
    by > max_bucket docs stop being reported pairwise — at 100 TB you
    want them surfaced by :func:`dedup_lines`-style line counts anyway,
    not as pairs. ``None`` keeps the exact guarantee (and is what the
    oracle-checked contract uses at test scale).

    Output: (id_a, id_b, n_shared_fps) with n_shared_fps ≥ min_shared.
    """
    from kafka_streams_spark.operators.dedup import _bucket_pairs

    fps = winnowing_fingerprint(
        docs, id_col=id_col, text_col=text_col, k=k, window=window,
        hash_fn=hash_fn,
    )
    # The exploded fingerprint table feeds the bucket-width counts AND
    # both sides of the bucket self-join; none of those consumers share
    # the (expensive) winnowing expression tree through exchange reuse,
    # so materialize it once (4.0 → 1.5 s warm at sf0.1 — same caveats
    # as weighted_jaccard_pairs).
    ex = materialize_shared(
        fps.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    )
    if max_bucket is not None:
        df_counts = ex.groupBy("fp").agg(F.count("*").alias("_df"))
        ex = (
            ex.join(df_counts.filter(F.col("_df") <= max_bucket), "fp")
            .drop("_df")
        )
    pairs = _bucket_pairs(ex, ["fp"], id_col).toDF("id_a", "id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical text normalization for hashing/dedup keys: lowercase,
    collapse all whitespace runs to single spaces, trim. Running exact
    dedup on ``norm_text`` (instead of raw text) is what catches the
    re-crawl that only changed indentation or line wrapping — the
    cheapest recall win in any dedup stack. Map-only expression; at
    100 TB it fuses into whatever scan feeds the hasher.

    (Unicode NFKC folding belongs here too when a normalizer is
    available in the container; the whitespace/case canon is the
    engine-portable core that the oracle can reproduce.)

    The whitespace class is pinned EXPLICITLY rather than ``\\s``: Java
    regex ``\\s`` includes vertical tab (U+000B) but RE2 (DuckDB) does
    not, so a bare ``\\s+`` silently diverges across engines on that
    character.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+", " ")
    )
    return docs.select(F.col(id_col), norm.alias("norm_text"))


def decontaminate_exact(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Verbatim eval-set leak check: flag training documents that contain
    a FULL benchmark document as a substring — the strictest
    decontamination predicate (n-gram overlap finds paraphrase-level
    leaks; this finds the benchmark pasted wholesale into a web page).

    Shape: benchmark suites are tiny next to the training corpus, so
    the benchmark texts BROADCAST and each training doc runs |bench|
    `contains` probes map-side (a BroadcastNestedLoopJoin — the
    deliberate broadcast-cross pattern, not a flag); only hit
    incidences reach the per-doc count. At 100 TB cost is
    |corpus| · |bench| substring probes, linear in the corpus because
    |bench| is a constant; for large suites, pre-filter with the
    n-gram :func:`~kafka_streams_spark.operators.pipelines.decontaminate`
    and run this exact pass on its flagged survivors.

    Output: (id, n_bench_hits, contaminated). Empty/NULL benchmark rows
    are excluded from the probe set: ``contains(text, '')`` is true for
    EVERY document, so one blank row in the suite (a trailing blank
    record, an empty answer field) used to flag the entire training
    corpus contaminated — and a downstream drop-contaminated gate would
    delete it wholesale (r10 review fix).
    """
    bench = (
        benchmark.select(F.col(bench_text_col).alias("_bench_text"))
        .filter(F.length("_bench_text") > 0)
        .distinct()
    )
    hits = (
        docs.select(F.col(id_col), F.col(text_col))
        .join(F.broadcast(bench))
        .filter(F.expr(f"contains({text_col}, _bench_text)"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bench_hits"))
    )
    return (
        docs.join(hits, id_col, "left_outer")
        .withColumn("n_bench_hits", F.coalesce(F.col("n_bench_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("n_bench_hits") >= 1)
        .select(id_col, "n_bench_hits", "contaminated")
    )


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", public arXiv
    2112.11446, Table A1): the repetition-free subset of the published
    document-quality heuristics, each emitted as its measured value plus
    a single ``passes_gopher`` verdict — word-count band, mean word
    length band, symbol-to-word ratio (``#`` and ``...``), bullet-line
    and ellipsis-line ratios, alphabetic-word ratio, and a minimum
    stopword-hit count (the frozen ``STOPWORDS['en']`` list, so the rule
    is reproducible in SQL). :func:`repetition_stats` covers the paper's
    repetition rules; compose both for the full gate.

    Pure per-row Column expressions — map-only, zero shuffles, fuses
    into any wider single-scan projection. Ratios are single int/int
    divisions (IEEE-identical cross-engine, no rounding pin needed).

    Output: (id, n_words bigint, mean_word_len, symbol_ratio,
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    stop_hits bigint, passes_gopher boolean).
    """
    t = F.col(text_col)
    m = _gopher_metric_exprs(t)
    passes = _gopher_passes(
        m,
        min_words,
        max_words,
        min_word_len,
        max_word_len,
        max_symbol_ratio,
        max_bullet_ratio,
        max_ellipsis_ratio,
        min_alpha_ratio,
        min_stop_hits,
    )
    return docs.select(
        F.col(id_col),
        *[m[name].alias(name) for name in _GOPHER_METRICS],
        passes.alias("passes_gopher"),
    )


def _gopher_metric_exprs(t: Column) -> dict[str, Column]:
    """The Gopher Table-A1 metric expressions over one text Column, in
    ``_GOPHER_METRICS`` order — shared by :func:`gopher_quality` (which
    aliases them into output columns) and :func:`gopher_passes_expr`
    (which folds them straight into the verdict predicate so gate
    compositions stay single-scan)."""
    toks = tokens(t)
    n_words = F.size(toks).cast("bigint")
    denom_w = F.greatest(n_words, F.lit(1)).cast("double")
    # sum of token lengths == non-whitespace char count (tokens() drops
    # only whitespace), so mean word length needs no per-token pass.
    mean_word_len = F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / denom_w
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), F.lit(0)))
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / denom_w
    lines = F.split(t, "\n")
    denom_l = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("- ")
            | F.ltrim(l).startswith("* ")
            | F.ltrim(l).startswith("•"),
        )
    )
    ellipsis_l = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    ).cast("bigint")
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "bullet_line_ratio": bullet.cast("double") / denom_l,
        "ellipsis_line_ratio": ellipsis_l.cast("double") / denom_l,
        "alpha_word_ratio": alpha.cast("double") / denom_w,
        "stop_hits": stop_hits,
    }


_GOPHER_METRICS = (
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "bullet_line_ratio",
    "ellipsis_line_ratio",
    "alpha_word_ratio",
    "stop_hits",
)


def _gopher_passes(
    m: dict[str, Column],
    min_words: int,
    max_words: int,
    min_word_len: float,
    max_word_len: float,
    max_symbol_ratio: float,
    max_bullet_ratio: float,
    max_ellipsis_ratio: float,
    min_alpha_ratio: float,
    min_stop_hits: int,
) -> Column:
    return (
        m["n_words"].between(min_words, max_words)
        & m["mean_word_len"].between(min_word_len, max_word_len)
        & (m["symbol_ratio"] <= max_symbol_ratio)
        & (m["bullet_line_ratio"] <= max_bullet_ratio)
        & (m["ellipsis_line_ratio"] <= max_ellipsis_ratio)
        & (m["alpha_word_ratio"] >= min_alpha_ratio)
        & (m["stop_hits"] >= min_stop_hits)
    )


def gopher_passes_expr(
    t: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The ``passes_gopher`` verdict of :func:`gopher_quality` as a bare
    Column expression, for single-scan gate compositions (see
    :func:`~kafka_streams_spark.operators.pipelines.quality_gate_agreement`)."""
    return _gopher_passes(
        _gopher_metric_exprs(t),
        min_words,
        max_words,
        min_word_len,
        max_word_len,
        max_symbol_ratio,
        max_bullet_ratio,
        max_ellipsis_ratio,
        min_alpha_ratio,
        min_stop_hits,
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style line/document cleaning (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", public arXiv 1910.10683 §2.2): keep only lines that
    end in a terminal punctuation mark (``.!?"``) and contain at least
    ``min_words_per_line`` words, drop lines mentioning ``javascript``,
    and drop whole documents containing ``lorem ipsum`` or a ``{`` (the
    paper's code/boilerplate tells). Documents keep ≥ ``min_kept_lines``
    cleaned lines or drop out (the paper uses 5 sentences; default 1
    here so the gate composes rather than dictates).

    ``require_terminal_punct=False`` disables the punctuation rule for
    corpora that aren't sentence-structured (transcripts, logs, the
    synthetic testdata) — the word-count and token rules still apply.

    Map-only per-row array expressions: split → filter → rejoin, zero
    shuffles, no Python workers. (:func:`dedup_lines` is the companion
    CORPUS-level C4 pass — cross-document duplicate lines — and needs
    the shuffle this one avoids.)

    Output: (id, n_lines bigint, n_lines_kept bigint, text_clean) for
    surviving documents.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = _c4_kept_lines(lines, min_words_per_line, require_terminal_punct)
    return (
        docs.filter(_c4_doc_ok(t))
        .select(
            F.col(id_col),
            F.size(lines).cast("bigint").alias("n_lines"),
            F.size(kept).cast("bigint").alias("n_lines_kept"),
            F.array_join(kept, "\n").alias("text_clean"),
        )
        .filter(F.col("n_lines_kept") >= min_kept_lines)
    )


def _c4_kept_lines(
    lines: Column, min_words_per_line: int, require_terminal_punct: bool
) -> Column:
    """The C4 line filter shared by :func:`c4_clean` and
    :func:`c4_passes_expr`: lines surviving the word-count /
    javascript / (optional) terminal-punctuation rules."""

    def _kept(l: Column) -> Column:
        trimmed = F.trim(l)
        words_ok = F.size(
            F.filter(F.split(trimmed, r"\s+"), lambda w: w != "")
        ) >= F.lit(min_words_per_line)
        no_js = ~F.lower(l).contains("javascript")
        cond = words_ok & no_js
        if require_terminal_punct:
            punct_ok = (
                trimmed.endswith(".")
                | trimmed.endswith("!")
                | trimmed.endswith("?")
                | trimmed.endswith('"')
            )
            cond = cond & punct_ok
        return cond

    return F.filter(lines, _kept)


def _c4_doc_ok(t: Column) -> Column:
    return ~F.lower(t).contains("lorem ipsum") & ~t.contains("{")


def c4_passes_expr(
    t: Column,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 1,
) -> Column:
    """Boolean: would this document survive :func:`c4_clean` with the
    same parameters? A bare Column expression so gate compositions stay
    single-scan (c4_clean itself also rewrites the text)."""
    kept = _c4_kept_lines(F.split(t, "\n"), min_words_per_line, require_terminal_punct)
    return _c4_doc_ok(t) & (F.size(kept) >= F.lit(min_kept_lines))


def _cms_bucket(tok: Column, row_idx: int, w: int) -> Column:
    """Deterministic CMS hash row ``row_idx``: first 8 hex chars of
    md5('<j>:' + token) as a 32-bit int, mod ``w`` — the same md5_32
    family as the MinHash/DSIR hashes, reproducible in DuckDB as
    ``CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT) % w``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row_idx}:"), tok)), 1, 8), 16, 10
    ).cast("bigint")
    return h % F.lit(w)


def cms_token_sketch(
    docs: DataFrame,
    d: int = 4,
    w: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) over the
    corpus token stream, as a TABLE of counters: ``(row_idx, bucket,
    counter)`` with at most ``d·w`` rows. Fully deterministic (md5-keyed
    hash rows, no randomness), so the sketch itself is oracle-checkable
    — unlike HLL++/KLL sketches whose internals are implementation-
    defined.

    Why a table and not a driver-side array: ``d·w`` is fixed and tiny,
    but the INPUT is the 100 TB token stream — this shape is one explode
    (d rows per token occurrence) into one aggregation shuffle whose
    map-side partial combine collapses every partition to ≤ d·w rows
    before any network transfer. Sketches of two corpora merge by
    summing counters on (row_idx, bucket) — the mergeability that makes
    CMS the per-shard/per-day frequency summary at scale.

    Point estimates: :func:`cms_token_estimates` (min over rows; always
    ≥ the true count — one-sided error ≤ e·N/w with prob 1−e^−d).
    """
    from kafka_streams_spark.functions.partitioning import spread

    # spread(): the d·|tokens| md5 probes run BEFORE the first exchange,
    # i.e. on the scan partitioning — a single-file corpus scan put the
    # whole hash pass on ONE task (r15 stage profile: 0.96 s serial CPU
    # at sf0.1). The floor widens it; no-op at real scale (guide §2.5).
    tok = spread(docs.select(F.col(text_col))).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    probes = F.array(*[_cms_bucket(F.col("tok"), j, w) for j in range(d)])
    rows = tok.select(F.posexplode(probes).alias("row_idx", "bucket"))
    return rows.groupBy("row_idx", "bucket").agg(F.count("*").alias("counter"))


def cms_token_estimates(
    docs: DataFrame,
    terms: list[str],
    d: int = 4,
    w: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-min point estimates for ``terms`` next to their true
    counts: ``(token, cms_count, exact_count)``. cms_count =
    min over hash rows of the probed counter (0 if a bucket is empty);
    the CMS guarantee cms_count ≥ exact_count is pinned by a property
    test. The exact side filters the token stream to ``terms`` BEFORE
    aggregating, so the full-vocabulary aggregation never runs — at
    scale the only unbounded work is the sketch build itself.

    Terms are lowercased on entry (the keyword_search_bm25 convention):
    the sketched token stream is lowercased by ``tokens``, so probing
    'Paris' verbatim would hash into buckets holding pure collision
    noise while exact_count read 0 — silently meaningless numbers for
    the term the caller asked about (r10 review fix).
    """
    terms = [t.lower() for t in terms]
    spark = docs.sparkSession
    sketch = cms_token_sketch(docs, d=d, w=w, id_col=id_col, text_col=text_col)
    tdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in terms])).alias("token")
    )
    probes = tdf.select(
        "token",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("token"), j, w) for j in range(d)])
        ).alias("row_idx", "bucket"),
    )
    est = (
        probes.join(sketch, ["row_idx", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_count"))
    )
    from kafka_streams_spark.functions.partitioning import spread

    # same serial-scan floor as the sketch build (the exact side pays
    # its own tokenize pass before the first exchange)
    exact = (
        spread(docs.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token").isin(list(terms)))
        .groupBy("token")
        .agg(F.count("*").alias("exact_count"))
    )
    return est.join(exact, "token", "left").select(
        "token", "cms_count", F.coalesce("exact_count", F.lit(0)).alias("exact_count")
    )


def hashed_bow_embedding(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing bag-of-words document embedding (Weinberger et
    al. 2009, "Feature Hashing for Large Scale Multitask Learning",
    public arXiv 0902.2206): each token occurrence lands in bucket
    ``(md5_32(tok) >> 1) % dim`` with sign from bit 0 (the signed hash
    kernel — unbiased inner products), summed per document and
    L2-normalized. The model-free way to put a text corpus into the
    similarity family: the output schema matches the ``embeddings``
    table, so knn/near-dup/decontaminate/semdedup all compose on it.

    Scale shape: one token explode → one (id, bucket) aggregation
    shuffle with map-side combine (≤ dim rows per doc survive) → one
    per-doc reassembly aggregation. The dense vector is rebuilt with a
    map lookup over 0..dim-1 (absent buckets → 0.0); norm is
    √(sum of squared ints) so every component is a single int/√int
    division — deterministic cross-engine with no rounding pin.

    Output: (id, embedding array<double>).
    """
    from kafka_streams_spark.functions.partitioning import spread

    tok = spread(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    h32 = F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10).cast("bigint")
    hashed = tok.select(
        F.col(id_col),
        (F.shiftright(h32, 1) % F.lit(dim)).alias("_bucket"),
        F.when(h32.bitwiseAND(F.lit(1)) == 0, F.lit(1)).otherwise(F.lit(-1)).alias("_sgn"),
    )
    sums = hashed.groupBy(id_col, "_bucket").agg(F.sum("_sgn").alias("_v"))
    per_doc = sums.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_bucket", "_v"))).alias("_m"),
        F.sqrt(F.sum(F.col("_v") * F.col("_v")).cast("double")).alias("_nrm"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.col("_nrm") == 0, F.lit(0.0)
        ).otherwise(F.coalesce(F.col("_m")[i], F.lit(0)).cast("double") / F.col("_nrm")),
    )
    return per_doc.select(F.col(id_col), dense.alias("embedding"))


def zipf_fit(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the top-``k`` corpus tokens: least-squares
    slope/intercept of log10(freq) against log10(rank) — the corpus
    health number (natural text ≈ −1; template spam and synthetic
    word-salad flatten toward 0, tokenizer glitches steepen it).

    Scale shape: the full-vocabulary aggregation is the only unbounded
    stage; the fit itself runs on the top-``k`` rows delivered by a
    heap top-k (freq desc, token asc tiebreak), so the rank window and
    the closed-form regression touch ≤ k rows — fitting the HEAD is
    also statistically right, since the tail (hapax plateau) isn't
    Zipfian and would bias the slope. Output doubles are sums of ≤ k
    log terms → rounded 6 dp to absorb summation-order ulps.

    Output: one row (n_ranked_tokens bigint — the number of distinct
    top-k tokens the regression used, min(k, |vocab|), NOT a corpus
    token count (renamed from the misleading `n_tokens`, r7
    self-review find); slope, intercept).
    """
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").alias("_f"))
        .orderBy(F.col("_f").desc(), F.col("_t"))
        .limit(k)
    )
    # global-window-bounded(k): rank window runs on the ≤ k-row top-k
    # result above — bounded by design
    ranked = freq.withColumn(
        "_r", F.row_number().over(Window.orderBy(F.col("_f").desc(), F.col("_t")))
    )
    xy = ranked.select(
        F.log10(F.col("_r").cast("double")).alias("_x"),
        F.log10(F.col("_f").cast("double")).alias("_y"),
    )
    s = xy.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    # With one distinct token every x is log10(1)=0 and the regression
    # denominator is 0 — slope is undefined (null), not an ANSI error.
    denom = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom != 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
    )
    return s.select(
        F.col("_n").cast("bigint").alias("n_ranked_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("_sy") - slope * F.col("_sx")) / F.col("_n"), 6).alias(
            "intercept"
        ),
    )


def split_sentences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Naive sentence segmentation: maximal runs of non-terminal
    characters plus their trailing ``.!?`` run, trimmed, empties
    dropped — the primitive under sentence-level dedup, per-sentence
    quality scoring, and sentence-pair mining. Deliberately
    abbreviation-blind ("Mr. Smith" splits) so the rule stays a single
    regex reproducible in any engine; swap a model segmenter behind the
    same (id, sent_idx, sentence) contract when one is available.

    The pattern avoids lookbehind on purpose: RE2-based engines (DuckDB,
    Go) don't support it, so extraction (`[^.!?]+[.!?]*`) is the
    portable formulation of terminal-punctuation splitting.

    Map-only: one regexp extraction + posexplode per row, zero shuffles.
    Output: (id, sent_idx int, sentence).
    """
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    return docs.select(
        F.col(id_col), F.posexplode(sents).alias("sent_idx", "sentence")
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    public arXiv 1911.00359): score every document with the corpus LM
    proxy (:func:`lm_unigram_score`) and split each LANGUAGE into
    equal-thirds head/middle/tail buckets — head = most corpus-plausible
    (highest avg log-prob = lowest perplexity), the slice CCNet keeps
    for LM training; tail = the junk candidate pool.

    Bucketing is ntile(3) over the deterministic (avg_logprob desc, id)
    order within each language — reproducible in ANSI SQL. The per-lang
    sort is a real shuffle+sort at 100 TB; when ranks aren't needed
    downstream, the cheaper two-pass form is percentile_approx tercile
    thresholds per lang broadcast back as a CASE filter (the
    length_outliers pattern) — same buckets up to threshold ties.

    Output: (id, lang, n_tokens, avg_logprob, bucket ∈ head|middle|tail).
    """
    from pyspark.sql import Window

    scored = lm_unigram_score(docs, id_col, text_col).join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col)
    )
    t = F.ntile(3).over(w)
    bucket = (
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail")
    )
    return scored.select(
        F.col(id_col),
        F.col(lang_col),
        "n_tokens",
        "avg_logprob",
        bucket.alias("bucket"),
    )


def ngram_novelty(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram novelty: the share of a document's distinct
    word n-grams that appear in NO other document — the memorization /
    boilerplate mirror image of :func:`corpus_drift`'s distribution
    view. High novelty marks genuinely new text worth keeping; near-zero
    novelty marks templated or duplicated content that n-gram dedup
    should have caught (so this doubles as a post-dedup audit metric).

    Shape: one corpus scan shingles every doc (Arrow shingler, distinct
    n-grams per doc), the exploded gram table aggregates to document
    frequencies (map-side partial → |distinct grams| rows), and a join
    back on gram tags each doc's grams as unique-to-it or shared. The
    exploded gram subtree has TWO consumers (the frequency aggregate and
    the join probe), so it is materialized once via
    ``materialize_shared`` (ROUND4_NOTES §19: exchange reuse cannot
    deduplicate Arrow-stage subtrees); the recurring-run form at corpus
    scale is a written gram posting table, bucketed by gram.

    Novelty frequency is DOCUMENT frequency over per-doc DISTINCT grams
    (a gram repeated inside one doc is still novel if no other doc has
    it). ``novelty`` is a single double division — IEEE-identical in the
    DuckDB oracle, no rounding pin needed. Every doc emits ≥1 shingle
    (docs shorter than n words shingle to the whole doc), so no
    zero-denominator guard is needed.

    Output: (id, n_grams bigint, n_novel bigint, novelty double).
    """
    from kafka_streams_spark.functions.partitioning import spread
    from kafka_streams_spark.operators.dedup import word_shingles

    g = materialize_shared(
        spread(docs).select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
    )
    freq = g.groupBy("gram").agg(F.count("*").alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint")
    return (
        g.join(freq, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            novel.alias("n_novel"),
        )
        .withColumn(
            "novelty", F.col("n_novel").cast("double") / F.col("n_grams").cast("double")
        )
    )


def corpus_overlap(
    a: DataFrame, b: DataFrame, n: int = 1, text_col: str = "text"
) -> DataFrame:
    """Vocabulary-overlap audit between two corpus slices: how many
    distinct word n-grams each side has, how many they share, and the
    Jaccard of the two n-gram sets — the set-membership companion to
    :func:`corpus_drift`'s mass-shift view (drift says the token
    DISTRIBUTION moved; overlap says whether the n-gram INVENTORIES
    even intersect — the first question when merging two crawls or
    diffing two snapshot dates).

    Each side is scanned once: explode n-grams → distinct (map-side
    partial dedup), then one full-outer join on the gram aligns the two
    sets and a single 1-row aggregate counts the Venn regions. No
    driver-side collection; both distinct tables shuffle once on the
    gram key and AQE broadcast-joins whichever side is small. Empty ∪
    empty follows the :func:`~kafka_streams_spark.operators.dedup.token_set_jaccard`
    convention (Jaccard 1.0).

    INVENTORY DEFINITION NOTE (r10 review): for n >= 2 the gram set is
    the dedup family's shingle definition — docs shorter than n words
    contribute their WHOLE text as one pseudo-gram and blank docs the
    '' gram — while n == 1 uses plain distinct tokens (no artifacts).
    Deliberate: the n >= 2 audit measures the same inventory the
    MinHash/Jaccard operators actually hash, so its overlap predicts
    THEIR cross-slice collisions; but it means overlap numbers are not
    comparable ACROSS different n values, and two slices sharing only
    blank/short docs show nonzero n >= 2 overlap.

    Output: 1 row (n_grams_a, n_grams_b, n_shared bigint, overlap_jaccard).
    """
    from kafka_streams_spark.operators.dedup import word_shingles

    def gram_set(df: DataFrame, flag: str) -> DataFrame:
        grams = (
            F.array_distinct(tokens(F.col(text_col)))
            if n == 1
            else word_shingles(F.col(text_col), n)
        )
        return (
            df.select(F.explode(grams).alias("gram"))
            .distinct()
            .withColumn(flag, F.lit(True))
        )

    j = gram_set(a, "in_a").join(gram_set(b, "in_b"), "gram", "full_outer")
    # coalesce: two all-empty-doc slices join to ZERO rows, and a sum
    # over an empty frame is NULL — the empty Venn must count 0, not
    # NULL (hypothesis-found edge, test_corpus_overlap_matches_set_model)
    n_a = F.coalesce(F.sum(F.when(F.col("in_a"), 1).otherwise(0)), F.lit(0)).cast(
        "bigint"
    )
    n_b = F.coalesce(F.sum(F.when(F.col("in_b"), 1).otherwise(0)), F.lit(0)).cast(
        "bigint"
    )
    shared = F.coalesce(
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)), F.lit(0)
    ).cast("bigint")
    out = j.agg(
        n_a.alias("n_grams_a"), n_b.alias("n_grams_b"), shared.alias("n_shared")
    )
    union = (F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared")).cast(
        "double"
    )
    return out.withColumn(
        "overlap_jaccard",
        F.when(union == 0, F.lit(1.0)).otherwise(
            F.col("n_shared").cast("double") / union
        ),
    )


def language_confusion(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Declared-vs-predicted language confusion matrix: cross-tabulate
    the corpus's ``lang`` metadata column against :func:`language_id`'s
    stopword-heuristic guess. Off-diagonal mass is either mislabeled
    metadata or LID failure — the first audit before trusting either
    side for per-language sampling/filtering decisions (`ccnet_buckets`,
    `token_budget_mix` keyed on lang are only as good as this matrix).

    The LID scores are pure per-row expressions, so the whole matrix is
    one scan + one tiny aggregate exchange (≤ |langs|² + und rows);
    `share_of_declared` normalizes per declared language via a window
    over the grouped result, not a second scan.

    Output: (lang, lang_guess, n_docs bigint, share_of_declared double).
    """
    from pyspark.sql import Window

    # language_id projects (id, lang_guess) and a re-join on id would
    # cost a shuffle; the guess is a pure expression, so carry the
    # declared column through the SAME scan instead. The expression is
    # language_id's verbatim (equality pinned in tests).
    t = F.col(text_col)
    toks = F.array_distinct(tokens(t))
    hit_cols = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    best = F.greatest(*hit_cols.values())
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    counts = (
        docs.select(F.col(lang_col).alias("lang"), guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return counts.withColumn(
        "share_of_declared", F.col("n_docs").cast("double") / total.cast("double")
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary counts against the corpus's own
    top-``vocab_size`` token vocabulary — the coverage signal a
    tokenizer/vocab decision starts from (a doc whose tokens mostly
    miss the head vocabulary is boilerplate, another language, or
    junk; the corpus-level OOV mass bounds <unk> rates downstream).

    Vocabulary selection is deterministic: count per token, then top-V
    by (count desc, token asc) — compiles to TakeOrderedAndProject, so
    each partition forwards at most V candidate rows and only V rows
    ever centralize. The per-doc pass uses ``explode_outer`` (empty
    docs keep a null-token row, so zeros survive WITHOUT a join back
    to the doc spine — an n×n join the first draft paid), left-joins
    the V-row vocabulary as a BROADCAST, and folds n_tokens/n_oov in
    one map-side-combined aggregation keyed on the doc id: one shuffle
    total. The corpus is scanned twice (once per pass) — at 100 TB two
    cheap scans beat materializing the exploded token table, and a
    recurring pipeline reuses a persisted vocabulary anyway.

    Recurring-run form: pass ``vocab`` (a ``tok``-column frame, e.g.
    :func:`read_vocab`) to skip the vocabulary pass entirely — one scan,
    and the OOV definition stays FIXED across daily increments instead
    of drifting with each day's counts (the write_minhash_index
    pattern).

    Output: (doc_id, n_tokens, n_oov), both bigint.
    """
    from kafka_streams_spark.functions.partitioning import spread

    toks = tokens(F.col(text_col))
    if vocab is None:
        vocab = (
            spread(docs)
            .select(F.explode(toks).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("_n"))
            .orderBy(F.col("_n").desc(), F.col("tok"))
            .limit(vocab_size)
        )
    vocab = vocab.select("tok", F.lit(1).alias("_in_vocab"))
    tok = spread(docs).select(
        F.col(id_col), F.explode_outer(toks).alias("tok")
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("tok").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("tok").isNotNull() & F.col("_in_vocab").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_oov"),
        )
    )


def dedup_normalized(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the NORMALIZED text (:func:`normalize_text`'s
    lowercase/whitespace canon) — the cheapest recall win over raw
    exact dedup: re-crawls that only changed case, indentation, or line
    wrapping collapse into one group. RefinedWeb/C4-style stacks run
    exactly this before any fuzzy stage.

    The group key that shuffles is the 64-hex SHA-256 of the normalized
    text, not the text itself — at 100 TB the exchange carries 64 bytes
    per row regardless of document size (the digest-only-shuffle rule
    every dedup operator here follows). Winner is min id, count kept,
    same contract as :func:`~kafka_streams_spark.operators.dedup.dedup_exact`.

    Output: (norm_hash, keep_id, dup_count).
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+", " ")
    )
    return (
        docs.select(F.col(id_col), F.sha2(norm, 256).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )


def write_vocab(
    docs: DataFrame,
    path: str,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> None:
    """Materialize the corpus's top-``vocab_size`` token vocabulary —
    a (tok, n) parquet of V rows — so recurring :func:`oov_rate` runs
    (``vocab=read_vocab(...)``) skip the vocabulary pass AND measure
    every increment against the SAME fixed vocabulary (a vocabulary
    recomputed per increment silently redefines "out of vocabulary"
    each day). ``vocab_size`` travels as column metadata on ``tok``
    (parquet footer), so a reader expecting a different V fails loudly
    instead of comparing incompatible coverage numbers.
    """
    from kafka_streams_spark.functions.partitioning import spread

    vocab = (
        spread(docs)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(vocab_size)
        .withMetadata("tok", {"vocab_size": vocab_size})
    )
    vocab.write.mode("overwrite").parquet(path)


def read_vocab(spark, path: str, expect_vocab_size: int | None = None) -> DataFrame:
    """Read a vocabulary written by :func:`write_vocab`; rejects a
    ``vocab_size`` mismatch loudly (the index-metadata gate every
    persisted artifact here uses)."""
    df = spark.read.parquet(path)
    if expect_vocab_size is not None:
        meta = df.schema["tok"].metadata
        if meta.get("vocab_size") != expect_vocab_size:
            raise ValueError(
                f"vocabulary at {path} was built with vocab_size="
                f"{meta.get('vocab_size')}, reader expects {expect_vocab_size}"
            )
    return df


# Tiny frozen placeholder blocklist — the real deployments swap in the
# full "Dirty, Naughty, Obscene..." list (C4 §2.2) or a policy list;
# frozen + lowercase so the oracle reproduces the gate exactly.
BADWORDS = ["badword", "slur1", "slur2", "obscene1"]


def badword_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: list[str] | None = None,
) -> DataFrame:
    """C4-style blocklist gate (C4 §2.2 dropped any page containing a
    word from the "Dirty, Naughty, Obscene or Otherwise Bad Words"
    list): per document, the count of blocklisted TOKEN occurrences and
    the drop flag. Token-level membership, not substring — "class"
    must not trip an "ass" entry (the classic blocklist false-positive)
    — so the check is an ``array_intersect`` on the lowercased
    whitespace tokens plus an exploded count, both codegen; the
    blocklist is a literal array (wordlists are KBs even in full form,
    broadcast-free as plan constants).

    Map-only: fuses into whatever scan feeds the curation pipeline,
    same as the Gopher/C4 rule gates it composes with.

    Output: (doc_id, n_badwords, drop) — drop = any hit, the C4 rule.
    """
    words = [w.lower() for w in (badwords if badwords is not None else BADWORDS)]
    toks = tokens(F.col(text_col))
    bad_lit = F.array(*[F.lit(w) for w in words])
    n_bad = F.size(F.filter(toks, lambda t: F.array_contains(bad_lit, t)))
    return docs.select(
        F.col(id_col),
        n_bad.cast("bigint").alias("n_badwords"),
        (n_bad > 0).alias("drop"),
    )


def collocations(
    docs: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-bigram collocation mining by pointwise mutual
    information (Church & Hanks 1990): pairs that co-occur far more
    than their unigram frequencies predict — multiword entities and
    fixed phrases ("new york", "machine learning"). The corpus-analysis
    staple for vocabulary design (what should become one token) and for
    spotting templated text (boilerplate phrases rank top).

    PMI = log(p(ab) / (p(a)·p(b))) with p from occurrence counts
    (bigrams over the bigram total, unigrams over the token total).
    ``min_count`` drops the unstable low-count tail FIRST (a pair seen
    once has huge spurious PMI), then the top-``top_k`` ranks on
    ROUNDED pmi (6 dp) with a (tok_a, tok_b) tiebreak so the cut is
    engine-reproducible.

    Shape: one token explode feeds the unigram aggregation; one
    zip_with-shifted explode feeds the bigram aggregation (both
    map-side combined); totals ride 1-row broadcasts; the two unigram
    joins are vocabulary-sized (broadcast when small, AQE otherwise);
    the final cut is a TakeOrderedAndProject heap. No window touches
    the corpus. Output: (tok_a, tok_b, n_pair, pmi).
    """
    from kafka_streams_spark.functions.partitioning import spread

    toks = tokens(F.col(text_col))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
    )
    big_all = (
        spread(docs)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count("*").alias("n_pair"))
    )
    big = big_all.filter(F.col("n_pair") >= min_count)
    uni = (
        spread(docs)
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    tot = uni.agg(F.sum("n_tok").alias("_t"))
    # p(ab) denominator is the FULL bigram total — computing it after
    # the min_count cut inflated every PMI by log(total/kept-total)
    # (r7 self-review find; the documented Church & Hanks definition
    # normalizes over all bigram occurrences). Ranking was unchanged
    # (uniform shift); the emitted values were not.
    tot_pairs = big_all.agg(F.sum("n_pair").alias("_tp"))
    a = uni.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    b = uni.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    scored = (
        big.join(a, "tok_a")
        .join(b, "tok_b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot_pairs))
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("_tp"))
                    / ((F.col("n_a") / F.col("_t")) * (F.col("n_b") / F.col("_t")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "tok_a", "tok_b"
    ).limit(top_k)


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document with the standard cheap
    heuristics (vowel-group syllables, terminal-punctuation sentences)
    — the readability leg of the quality-gate family: training corpora
    routinely floor/ceiling this score to drop word-salad (score ≪ 0)
    and trivial boilerplate (score ≈ 100+ short-sentence chrome).

    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    with sentences = max(1, count of [.!?]+ runs) and syllables =
    per-word count of [aeiouy]+ groups, min 1 per word. Everything is
    regexp_count/size expressions — map-only, zero shuffles, and DuckDB
    reproduces each count exactly so the 6-dp score is oracle-checked.

    Output: (id, n_words, n_sentences, n_syllables, flesch).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1).cast("bigint"),
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("bigint"),
    )
    syl = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.lit(1).cast("bigint"),
                F.regexp_count(w, F.lit(r"[aeiouy]+")).cast("bigint"),
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    wf = F.greatest(n_words, F.lit(1)).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (wf / n_sentences.cast("double"))
        - F.lit(84.6) * (syl.cast("double") / wf)
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        n_sentences.alias("n_sentences"),
        syl.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    )


def compression_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the entropy-proxy quality
    gate modern curation stacks run beside Gopher/C4 (Dolma's zlib
    filter is the public reference): templated/repetitive text
    compresses far below ~0.3, while binary junk and encrypted blobs
    sit near 1.0; both tails are drop candidates that word-level rules
    miss.

    zlib at a FIXED level is bit-deterministic for a given input
    (pinned against direct zlib in tests), so results are stable across
    replays and partitionings — but the DEFLATE stream is not
    SQL-expressible, making this a rows-only contract (the engine's
    deterministic-but-not-oracle class, like the Arrow k-center loop).
    Arrow mapInPandas, map-only, no shuffle; the closure is
    self-contained (shipped by value).

    Output: (id, n_bytes, n_compressed, ratio) — ratio rounded 6 dp;
    empty docs report ratio NULL (nothing to compress).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_field = docs.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("ratio", DoubleType()),
        ]
    )
    lvl = int(level)

    # self-contained closure: shipped by value to Python workers
    def process(batches):
        import zlib

        import pandas as _pd

        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, lvl)
                ids.append(i)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(round(len(comp) / len(raw), 6) if raw else None)
            yield _pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc, "ratio": ratio}
            )

    # r14 note: a spread() parallelism floor here was A/B'd and
    # REVERTED (1.81x): the zlib pass is so cheap at contract scale
    # that the probe + exchange cost more than the serial stage.
    return docs.select(id_col, text_col).mapInPandas(process, schema=out_schema)
