"""Deterministic sampling and shard-packing operators for training-data
pipelines.

Both operators are reproducibility-first: re-running the pipeline on the
same corpus yields byte-identical output — no RNG state, no
arrival-order dependence, no partition-count dependence. That property
is what makes 100 TB corpus builds auditable (a re-run after a cluster
failure must produce the same training set), and it is exactly what
`df.sample()` does NOT give you (seeded per-partition RNG: the sample
changes when partitioning changes).

Capability lineage: north-star scope from BASELINE.json (the reference
has no sampling/sharding surface); the same role as hash-based document
selection and shard assignment in public LLM-corpus pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_id(col: Column | str, salt: str | None) -> Column:
    """The string every hash in this module digests: ``salt + ':' +
    cast(id as string)``, or the bare id string when ``salt`` is None.

    WHY SALTS (r10 review fix, verified by simulation): every operator
    here used to read a slice of the SAME md5(id), so composed
    operators were fully correlated instead of independent — a
    rate-0.1 sample followed by :func:`assign_splits` left the TRAIN
    split literally EMPTY (every surviving id had u < 0.1, i.e. first
    byte < 0x1a — entirely inside the test/val boundary), and chaining
    two samplers kept min(r1, r2) of rows instead of r1·r2. Each
    sampler now digests a distinct operator salt; the split rule
    (:func:`split_expr`) stays UNSALTED deliberately — it is the
    published identity rule whose stability standing assignments (and
    the frozen splits-stream stores) depend on."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.concat(F.lit(salt + ":"), s) if salt else s


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_256: int = 32,
) -> DataFrame:
    """Deterministic content-hash sample: keep rows whose
    md5('hash_sample:' || id) falls below a threshold — rate
    ``rate_256``/256 (salted so the sample is independent of the other
    samplers and of the split rule — see :func:`salted_id`).

    The predicate compares the first two hex chars lexicographically
    against the threshold byte; lowercase hex strings order identically
    to their numeric values, so the same predicate is expressible in
    ANSI SQL verbatim (DuckDB oracle) with no bit-twiddling functions
    required. md5 is engine-portable (Spark and DuckDB emit identical
    lowercase hex); xxhash64 would be faster but is Spark-only and
    therefore un-oracle-able.

    Scale shape: a narrow filter on a projected hash — pushdown-friendly,
    no shuffle, and stable under repartitioning (unlike ``df.sample``).
    Membership is decided per id, so the sample composes across tables:
    joining two hash-sampled tables on the id keeps referential
    integrity (same ids survive on both sides). Rows with a NULL id are
    dropped (md5(NULL) is NULL): an id-less row has no deterministic
    identity to sample on.
    """
    if not 0 < rate_256 <= 256:
        raise ValueError("rate_256 must be in (0, 256]")
    if rate_256 == 256:
        # format(256,'02x') is the 3-char '100'; comparing the 2-char
        # prefix against it lexicographically would keep only buckets
        # '00'..'10' (~17/256) instead of everything. Still drop NULL
        # ids (r10 advice fix): every other rate rejects them via the
        # NULL md5 predicate, so a bare `return df` would break the
        # documented contract — and cross-table referential integrity —
        # discontinuously at the boundary rate.
        return df.filter(F.col(id_col).isNotNull())
    threshold = format(rate_256, "02x")
    bucket = F.substring(F.md5(salted_id(id_col, "hash_sample")), 1, 2)
    return df.filter(bucket < F.lit(threshold))


def uniform_unit(col: Column | str, salt: str | None = None) -> Column:
    """Deterministic uniform-[0,1) value per id: the first 8 hex chars of
    md5(salted id) as an integer over 16^8. Engine-portable (md5 + conv
    are ANSI-expressible; DuckDB twin uses the same arithmetic),
    partition-invariant, and reproducible — the sampling primitive every
    operator here builds on. Pass a distinct ``salt`` per operator so
    composed operators draw INDEPENDENT uniforms (see
    :func:`salted_id`); None digests the bare id (the split rule's
    identity hash). NULL ids yield NULL (callers decide: the samplers
    coalesce to 0.0 = always-kept so a sampled table and its
    :func:`assign_splits` table agree on which rows exist)."""
    return F.conv(
        F.substring(F.md5(salted_id(col, salt)), 1, 8), 16, 10
    ).cast("double") / F.lit(float(16**8))


def temperature_mix(
    docs: DataFrame,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-flattened source mixing — the standard LLM-corpus
    recipe for up-weighting small/high-quality sources: target share of
    stratum s ∝ (n_s)^(1/T). T=1 keeps natural proportions; T→∞ gives
    uniform shares. Implemented as *downsampling only* (no replication,
    so the output is a subset and stays deduplicated): the keep rate
    ``rate_s = (n_s/n_min)^(1/T - 1)`` anchors the smallest stratum at
    1.0; with the negative exponent every larger stratum downsamples
    toward the flattened share (post-mix counts ∝ n_s^(1/T)).

    Shape: one tiny per-stratum count aggregate broadcast back (no
    driver-side collect), then a deterministic per-row hash predicate
    (:func:`uniform_unit`) — partition-invariant, reproducible, and
    pushdown-friendly. One narrow shuffle for the counts; the corpus
    itself never shuffles.
    """
    if temperature < 1:
        # 0 < T < 1 flips the exponent positive: every rate computes
        # >= 1 and the least(1, ...) clamp silently turns the operator
        # into a no-op instead of the sharpened mixture the formula
        # promises (sharpening would need to anchor on the LARGEST
        # stratum — a different operator). Reject rather than no-op
        # (r10 review fix).
        raise ValueError(
            "temperature must be >= 1 (flattening); T < 1 sharpening "
            "is not what this downsampling-only operator computes"
        )
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("_n_s"))
    n_min = counts.agg(F.min("_n_s").alias("_n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        F.col(stratum_col).alias("_stratum_r"),
        # rounded to 9 dp: pow() is not IEEE-correctly-rounded, so the
        # last ulp may differ across engines; rounding pins the boundary
        # so the keep predicate is bit-identical in Spark and the oracle
        F.round(
            F.least(
                F.lit(1.0),
                F.pow(F.col("_n_s") / F.col("_n_min"), F.lit(1.0 / temperature - 1.0)),
            ),
            9,
        ).alias("_keep_rate"),
    )
    # null-safe join: groupBy keeps a NULL stratum as a real group (its
    # count participates in n_min like any other), but an equi-join
    # would drop every NULL-stratum row on the way back — the group
    # contaminated the anchor AND vanished from the output (r10 review
    # fix). uniform_unit coalesces to 0.0 so NULL-id rows stay, agreeing
    # with assign_splits on which rows exist.
    return (
        docs.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("_stratum_r")),
        )
        .filter(
            F.coalesce(uniform_unit(id_col, "temperature"), F.lit(0.0))
            < F.col("_keep_rate")
        )
        .drop("_stratum_r", "_keep_rate")
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep each row iff
    uniform_unit(id) < rate(stratum) — the standard language/source
    re-balancing primitive (e.g. cap English at 100%, keep 50% German).

    The rate table is a literal CASE expression, not a join: rates are
    configuration (a handful of entries), so they compile into the scan
    filter — map-only, zero shuffle, pushdown-friendly, and
    partition-invariant (unlike `df.sampleBy`, whose per-partition RNG
    changes with partitioning). Sampling per id keeps referential
    integrity across tables sampled with the same rates.
    """
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    rate = None
    for k, r in sorted(rates.items()):
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1]")
        cond = F.col(stratum_col) == F.lit(k)
        rate = (
            F.when(cond, F.lit(float(r)))
            if rate is None
            else rate.when(cond, F.lit(float(r)))
        )
    rate_expr = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    return docs.filter(
        F.coalesce(uniform_unit(id_col, "stratified"), F.lit(0.0)) < rate_expr
    )


def upsample_epochs(
    docs: DataFrame,
    epochs: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_epochs: float = 1.0,
) -> DataFrame:
    """Per-stratum epoch weighting with FRACTIONAL epochs — the corpus
    mixing recipe where high-quality sources repeat (e.g. wiki ×2.5)
    and low-quality ones downsample (×0.4): every row gets
    ``floor(e)`` full copies, plus one more iff uniform_unit(id) falls
    under the fractional remainder. e < 1 therefore degrades to a
    deterministic subsample; e = 0 drops the stratum.

    Map-only fan-out: the copy count is a literal CASE expression and
    the copies come from ``explode(sequence(1, n))`` — no shuffle, no
    RNG, reproducible byte-for-byte. ``copy_idx`` disambiguates copies
    so a downstream global shuffle spreads them apart instead of
    emitting them adjacent.

    Output: (id_col, stratum_col, copy_idx). At 100 TB the output is
    |corpus| · mean(e) rows — the fan-out happens in the scan stage and
    never materializes per-executor state.
    """
    if default_epochs < 0:
        raise ValueError("default_epochs must be >= 0")
    e = None
    for k, v in sorted(epochs.items()):
        if v < 0:
            raise ValueError(f"epochs for {k!r} must be >= 0")
        cond = F.col(stratum_col) == F.lit(k)
        e = (
            F.when(cond, F.lit(float(v)))
            if e is None
            else e.when(cond, F.lit(float(v)))
        )
    e_expr = (
        e.otherwise(F.lit(float(default_epochs)))
        if e is not None
        else F.lit(float(default_epochs))
    )
    base = F.floor(e_expr).cast("int")
    extra = (
        F.coalesce(uniform_unit(id_col, "epochs"), F.lit(0.0))
        < (e_expr - F.floor(e_expr))
    ).cast("int")
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            (base + extra).alias("_n_copies"),
        )
        # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark —
        # guard so dropped rows explode an empty array instead.
        .filter(F.col("_n_copies") >= 1)
        .select(
            id_col,
            stratum_col,
            F.explode(F.expr("sequence(1, _n_copies)")).alias("copy_idx"),
        )
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: assign each row a
    shard (md5-hash mod n_shards) and a position within the shard
    (rank by the full md5 hex, id tiebreak). Reading shards 0..n-1
    sequentially yields a reproducible pseudorandom permutation of the
    corpus — what a training run needs from "shuffle the data" without
    any RNG state or single-writer global sort.

    One shuffle keyed on shard_id + one per-shard sort; shards are
    uniform by construction (hash mod), so no skew. At 100 TB pick
    n_shards ≈ corpus_bytes / target_shard_bytes and write with
    ``partitionBy(shard_id)`` — each shard sorts independently, no
    global ordering barrier.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hex8 = F.substring(F.md5(salted_id(id_col, "shuffle")), 1, 8)
    shard = F.pmod(F.conv(hex8, 16, 10).cast("bigint"), F.lit(n_shards))
    with_shard = docs.select(
        F.col(id_col),
        shard.cast("int").alias("shard_id"),
        F.md5(salted_id(id_col, "shuffle")).alias("_h"),
    )
    w = Window.partitionBy("shard_id").orderBy("_h", id_col)
    return with_shard.select(
        id_col,
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
    )


def assign_splits(
    docs: DataFrame,
    id_col: str = "doc_id",
    test_256: int = 13,
    val_256: int = 26,
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(id) bucket < test_256
    → 'test', < val_256 → 'val', else 'train' (boundaries over 256, so
    defaults give ~5% test, ~5% val).

    The split every training pipeline needs, with the properties
    `randomSplit` cannot give: disjoint by construction, stable under
    repartitioning and re-runs, and id-keyed so joining any other table
    hash-split with the same rule lands rows in the same split
    (referential integrity across the corpus and its metadata tables).
    Map-only — a projected CASE on a hash, no shuffle, no RNG.
    """
    return docs.select(
        F.col(id_col),
        split_expr(F.col(id_col), test_256, val_256).alias("split"),
    )


def split_expr(key: Column | str, test_256: int = 13, val_256: int = 26) -> Column:
    """:func:`assign_splits`' bucket rule as a reusable expression —
    md5(key) first byte < test_256 → 'test', < val_256 → 'val', else
    'train' — so any operator that needs the SAME deterministic split
    on a different key (:func:`leakage_safe_splits` keys on the dup
    cluster) cannot drift from the contract rule. Deliberately UNSALTED
    (unlike every sampler — see :func:`salted_id`): this is the
    published identity rule whose stability standing assignments and
    the frozen splits-stream stores depend on; the samplers salt
    themselves so sample→split compositions stay independent."""
    if not 0 <= test_256 <= val_256 <= 256:
        raise ValueError("need 0 <= test_256 <= val_256 <= 256")
    key = F.col(key) if isinstance(key, str) else key
    bucket = F.substring(F.md5(key.cast("string")), 1, 2)

    # format(256,'02x') is the 3-char '100', which breaks the 2-char
    # lexicographic compare (same pitfall hash_sample special-cases):
    # a boundary of 256 means "everything below" — always true.
    def below(boundary: int):
        if boundary >= 256:
            return F.lit(True)
        return bucket < F.lit(format(boundary, "02x"))

    return (
        F.when(below(test_256), F.lit("test"))
        .when(below(val_256), F.lit("val"))
        .otherwise(F.lit("train"))
    )


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    test_256: int = 13,
    val_256: int = 26,
) -> DataFrame:
    """Train/val/test assignment that CANNOT leak near-duplicates across
    splits — the eval-integrity upgrade of :func:`assign_splits`: a doc
    hash-split independently of its near-twin lands the pair on both
    sides of the train/test boundary, silently inflating eval scores
    (the contamination the decontaminate ops hunt, created by your own
    splitter). Here the split key is the duplicate CLUSTER id
    (:func:`~kafka_streams_spark.operators.dedup.duplicate_clusters`
    output — the min member id) for clustered docs and the doc's own id
    for singletons, then :func:`split_expr` applies the exact
    assign_splits rule to that key — so every cluster moves as one unit
    and singleton assignments are IDENTICAL to plain assign_splits
    (same rule, same key).

    At 100 TB: one id-keyed equi-join against the cluster table (dup
    nodes only — a small fraction of the corpus; AQE broadcasts it when
    it fits), then the map-only hash CASE. No extra shuffle of the
    corpus beyond the join.

    Output: (id_col, split_key, split) — split_key kept so the
    cluster-atomicity property is itself checkable downstream.
    """
    reps = clusters.select(
        F.col("node").alias(id_col), F.col("cluster_id").alias("_rep")
    )
    return (
        docs.select(id_col)
        .join(reps, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_rep"), F.col(id_col)).alias("split_key"),
        )
        .withColumn("split", split_expr(F.col("split_key"), test_256, val_256))
    )


def leakage_safe_splits_incremental(
    new_docs: DataFrame,
    existing_splits: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    test_256: int = 13,
    val_256: int = 26,
) -> DataFrame:
    """Assign splits to a NEW delta of documents without disturbing the
    standing assignment — the ingestion-time twin of
    :func:`leakage_safe_splits` (the dedup_incremental pattern: the
    batch form re-derives the world; this form answers "where do
    today's docs go, given where yesterday's already went").

    Rules, per new doc:

    1. Its cluster contains already-assigned docs → ADOPT the split of
       the minimum-id existing member (deterministic, and by induction
       the whole cluster converges on one split as it grows). If those
       existing members span MORE than one split — two previously
       separate clusters merged via a new bridge doc, or the standing
       assignment predates leakage safety — the doc is additionally
       flagged ``leak_conflict=true``: the leak already exists among
       immutable past assignments, so the right move (hold the doc out /
       quarantine the cluster) is a policy call this operator surfaces
       rather than hides.
    2. All-new cluster → the :func:`split_expr` hash rule on the
       cluster id (min member), exactly the batch form.
    3. No cluster → the hash rule on the doc's own id, bit-identical to
       :func:`assign_splits`.

    Inputs: ``existing_splits`` (id, split) — the standing assignment;
    ``clusters`` (node, cluster_id) — duplicate clusters over the
    COMBINED corpus (new×existing links are what matter; feed the
    incremental pair stage's output through
    :func:`~kafka_streams_spark.operators.dedup.duplicate_clusters`).

    Scale shape: two id-keyed equi-joins against cluster-sized tables
    (dup nodes only) and one grouped aggregate over the clustered
    existing members — the corpus itself is never shuffled.

    Output: (id_col, split, leak_conflict boolean).
    """
    reps = clusters.select(F.col("node").alias(id_col), "cluster_id")
    ex = existing_splits.select(F.col(id_col), "split").join(reps, id_col)
    adopt = ex.groupBy("cluster_id").agg(
        F.min(F.struct(F.col(id_col), F.col("split")))
        .getField("split")
        .alias("_adopt"),
        (F.count_distinct("split") > 1).alias("_conflict"),
    )
    return (
        new_docs.select(id_col)
        .join(reps, id_col, "left")
        .join(adopt, "cluster_id", "left")
        .select(
            id_col,
            F.coalesce(
                F.col("_adopt"),
                split_expr(
                    F.coalesce(F.col("cluster_id"), F.col(id_col)),
                    test_256,
                    val_256,
                ),
            ).alias("split"),
            F.coalesce(F.col("_conflict"), F.lit(False)).alias(
                "leak_conflict"
            ),
        )
    )


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    max_rows: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group document cap — the per-domain cap every
    web-corpus recipe applies (C4/RefinedWeb-style: no single host may
    dominate the mix): keep at most ``max_rows`` docs per group, the
    winners chosen by md5(id) rank (id tiebreak) so the kept subset is
    a uniform-without-replacement sample of the group that is stable
    under re-runs, repartitioning, and incremental re-ingestion — NOT
    "first max_rows in arrival order", which silently biases toward
    whatever crawl batch landed first.

    One shuffle on the group key; the rank is a partitioned window
    (row_number over groups), so it scales horizontally across groups.
    Skew caveat: a single colossal group sorts in one task — when one
    domain is a double-digit share of the corpus, pre-filter it with
    :func:`hash_sample` (rate ≈ a few × max_rows / group size) before
    the exact rank; the md5-order winners are unchanged as long as the
    pre-filter keeps ≥ max_rows rows (same hash, prefix property).

    Output: the input rows that survive the cap (all columns, rank
    dropped). NULL groups form one group like any groupBy.
    """
    if max_rows < 0:
        raise ValueError("max_rows must be >= 0")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(salted_id(id_col, "cap")), F.col(id_col)
    )
    return (
        docs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_rows)
        .drop("_r")
    )


def reservoir_sample(
    docs: DataFrame,
    k: int = 50,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Deterministic (weighted) reservoir sample: the top-``k`` rows per
    stratum by the Efraimidis–Spirakis priority ``u^(1/w)``, with the
    uniform ``u`` derived from md5(id) (:func:`uniform_unit`) instead of
    RNG state — so the "reservoir" is a pure function of the corpus, not
    of arrival order or partitioning. With ``weight_col=None`` the
    priority is ``u`` itself (uniform sampling without replacement).

    Priorities are rounded to 9 dp (`pow` is not correctly rounded
    across engines — same pin as :func:`temperature_mix`) and ties break
    on id, so the selected set is bit-identical in Spark and the DuckDB
    oracle.

    Scale shape: two-phase top-k. Phase 1 ranks within (stratum, salt)
    — ``n_salts`` hash-derived subgroups — keeping ≤ k rows each, so no
    single window partition ever holds a full 100 TB stratum; phase 2
    ranks the ≤ k·n_salts survivors per stratum. The final set equals
    the single-window top-k exactly (a global top-k row is a top-k row
    of its salt group), which is what the oracle computes.

    Output: (id, stratum, priority, rk) with rk = 1..k per stratum.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    u = F.coalesce(uniform_unit(id_col, "reservoir"), F.lit(0.0))
    if weight_col is None:
        priority = F.round(u, 9)
    else:
        # nonpositive weight ⇒ priority 0 (never sampled ahead of any
        # positive-weight row) — the E-S limit as w→0⁺, made explicit so
        # a stray w=0 doesn't feed pow a division-by-zero infinity.
        w = F.col(weight_col).cast("double")
        priority = F.round(
            F.when(w > 0, F.pow(u, F.lit(1.0) / w)).otherwise(F.lit(0.0)), 9
        )
    # salt from a DIFFERENT md5 slice than u (chars 9-16 of the same
    # salted hash) so the salt is independent of the priority ordering
    salt = F.pmod(
        F.conv(
            F.substring(F.md5(salted_id(id_col, "reservoir")), 9, 8), 16, 10
        ).cast("bigint"),
        F.lit(n_salts),
    )
    ranked = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        priority.alias("priority"),
        salt.alias("_salt"),
    )
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy(
        F.desc("priority"), F.col(id_col)
    )
    phase1 = ranked.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(stratum_col).orderBy(F.desc("priority"), F.col(id_col))
    return (
        phase1.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(id_col, stratum_col, "priority", "rk")
    )


def pack_token_shards(
    docs: DataFrame,
    budget: int = 4000,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
) -> DataFrame:
    """Assign documents to contiguous training shards of ~``budget``
    tokens each, per stratum.

    Greedy contiguous packing in deterministic (stratum, id) order:
    ``shard_id = (cumulative_tokens_before_doc) div budget``. A shard
    may overshoot the budget by at most one document — the standard
    sequence-packing compromise (splitting documents across shards is
    the tokenizer's job, not the planner's). Token counts use the
    BPE-ish regex segmentation (`text.bpe_ish_count`) — the same budget
    currency as the curation pipeline.

    Precondition for the fill guarantee (r7 review wave 4): documents
    longer than ``budget`` attribute ALL their tokens to the shard
    they START in — the following shard id can come up short (or be
    skipped entirely by a > 2x-budget doc), so "every non-last shard
    >= budget" holds only when every document <= budget tokens.
    Pre-split longer docs with :func:`pack_sequences` (which cuts at
    token offsets) before packing if the corpus has them; shard ids are
    then the non-empty floor(start/budget) values.

    One shuffle (hash on stratum) + one in-partition running sum — the
    same cost shape as any windowed cumsum. Skew note: strata are
    corpus sources; if one source dominates, the window partition is
    that source's full doc list — at 100 TB, pre-split hot strata by a
    salt on a higher-level grouping (e.g. crawl snapshot) before
    packing, or pack per (source, date) instead.
    """
    from kafka_streams_spark.operators.text import bpe_ish_count

    if budget < 1:
        # budget=0 would make the `div` yield NULL shard ids in default
        # mode (or raise under ANSI) — every sibling operator validates
        # its knob; this one silently wrote the whole corpus into one
        # NULL shard (r10 review fix)
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_tokens = bpe_ish_count(F.col(text_col)).alias("n_tokens")
    with_cum = docs.select(
        F.col(id_col), F.col(stratum_col), n_tokens
    ).withColumn("_cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        id_col,
        stratum_col,
        "n_tokens",
        F.expr(f"(_cum - n_tokens) div {budget}").alias("shard_id"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
) -> DataFrame:
    """Token-offset sequence packing: lay documents end-to-end in
    deterministic (stratum, id) order and cut the token stream into
    fixed ``seq_len`` training sequences, SPLITTING documents across
    sequence boundaries — the packing semantics
    :func:`pack_token_shards` deliberately leaves to the tokenizer,
    made explicit: each output row is the exact slice of one document
    that lands in one sequence.

    Arithmetic: a document occupying global token span
    ``[cum−n, cum)`` within its stratum touches sequences
    ``⌊(cum−n)/L⌋ .. ⌊(cum−1)/L⌋``; its slice in sequence k starts at
    document-token ``max(0, k·L − (cum−n))`` and holds
    ``min(n, (k+1)·L − (cum−n)) − start`` tokens. Pure integer
    arithmetic — reproducible, partition-invariant, and every sequence
    except each stratum's last is exactly ``seq_len`` tokens by
    construction (pinned in tests). Token currency is the BPE-ish
    count, same as the shard packer.

    Shape: one windowed running sum per stratum + a map-only explode of
    each doc into the (usually 1–2) sequences it touches. Same skew
    note as pack_token_shards: a dominant stratum means one window
    partition — pre-split hot strata on a higher-level grouping.

    Output: (id, stratum, seq_id, doc_start, n_tokens_in_seq, seq_off)
    — ``doc_start`` = first document token in this slice, ``seq_off`` =
    where the slice begins inside the sequence.
    """
    from kafka_streams_spark.operators.text import bpe_ish_count

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = bpe_ish_count(F.col(text_col)).cast("long").alias("_n")
    with_cum = (
        docs.select(F.col(id_col), F.col(stratum_col), n)
        .withColumn("_cum", F.sum("_n").over(w))
        .filter(F.col("_n") > 0)
        .withColumn("_lo", F.col("_cum") - F.col("_n"))
    )
    L = F.lit(int(seq_len))
    first_k = F.expr(f"_lo div {seq_len}")
    last_k = F.expr(f"(_cum - 1) div {seq_len}")
    exploded = with_cum.select(
        id_col,
        stratum_col,
        "_n",
        "_lo",
        F.explode(F.sequence(first_k, last_k)).alias("seq_id"),
    )
    doc_start = F.greatest(F.lit(0), F.col("seq_id") * L - F.col("_lo"))
    doc_end = F.least(F.col("_n"), (F.col("seq_id") + 1) * L - F.col("_lo"))
    return exploded.select(
        id_col,
        stratum_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        doc_start.cast("long").alias("doc_start"),
        (doc_end - doc_start).cast("long").alias("n_tokens_in_seq"),
        F.greatest(F.lit(0), F.col("_lo") - F.col("seq_id") * L)
        .cast("long")
        .alias("seq_off"),
    )


def token_budget_mix(
    docs: DataFrame,
    target_shares: dict[str, float],
    budget_tokens: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sample the corpus down to an explicit TOKEN budget with explicit
    per-stratum mixture shares — the "data mixing" step of a training
    run (the static counterpart of DoReMi-style learned mixtures):
    stratum ``s`` keeps ``rate_s = min(1, budget·share_s / tokens_s)``
    of its rows, so post-mix expected token mass per stratum is
    ``budget·share_s`` (or everything the stratum has, when it can't
    cover its share — downsampling only, no replication; use
    :func:`upsample_epochs` on top when a short stratum must repeat).
    Strata absent from ``target_shares`` drop out (share 0) — the
    mixture is a whitelist.

    Shape: the temperature_mix pattern — one per-stratum token-count
    aggregate (map-side partial sums) broadcast back, then the
    deterministic per-row :func:`uniform_unit` predicate; the corpus
    itself never shuffles. Rates round to 9 dp so the keep boundary is
    bit-identical in Spark and the oracle.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be > 0")
    for s, p in target_shares.items():
        if not (0.0 < p <= 1.0):
            raise ValueError(f"share for {s!r} must be in (0, 1], got {p}")
    # BPE-ish token currency — the SAME currency pack_token_shards /
    # pack_sequences budget in, so mix-to-budget-then-pack pipelines
    # do not silently convert between whitespace and BPE-ish masses
    # (the whitespace count undercounts by the subword/punctuation
    # ratio — an unbounded, data-dependent budget overshoot; r10
    # review fix).
    from kafka_streams_spark.operators.text import bpe_ish_count

    counts = (
        docs.filter(F.col(stratum_col).isin(list(target_shares)))
        .groupBy(stratum_col)
        .agg(F.sum(bpe_ish_count(F.col(text_col))).alias("_tok_s"))
    )
    share = F.lit(None).cast("double")
    for s, p in target_shares.items():
        share = F.when(F.col(stratum_col) == s, F.lit(float(p))).otherwise(share)
    # A whitelisted stratum with zero total tokens (all-empty texts)
    # costs nothing toward the budget — keep it whole rather than
    # tripping the ANSI divide-by-zero.
    rate = F.when(
        F.col("_tok_s") > 0,
        F.least(
            F.lit(1.0), F.lit(float(budget_tokens)) * share / F.col("_tok_s")
        ),
    ).otherwise(F.lit(1.0))
    rates = counts.select(
        stratum_col, F.round(rate, 9).alias("_keep_rate")
    )
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .filter(
            F.coalesce(uniform_unit(id_col, "budget_mix"), F.lit(0.0))
            < F.col("_keep_rate")
        )
        .drop("_keep_rate")
    )


def shard_skew_report(
    docs: DataFrame,
    budget: int = 4000,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
) -> DataFrame:
    """Shard-balance audit over :func:`pack_token_shards`: per stratum,
    how many shards the packing produced and how skewed their token
    loads are (min/max/total, all exact integers). The number every
    training-infra review asks for before a run — a max/min ratio far
    from 1 means stragglers: some data-loader workers finish their
    shards early and idle while the fat shard trails the epoch.

    The packing guarantees every shard except the LAST per stratum
    holds ≥ budget tokens (greedy contiguous fill) and any shard
    overshoots by at most one document — PROVIDED every document is
    ≤ budget tokens (see pack_token_shards' precondition; longer docs
    leave short or skipped shard ids). Under it, skew is bounded by
    (budget + max_doc_tokens) / budget, and the report verifies the
    bound held on real data — a min_shard_tokens far below budget on a
    non-singleton stratum is the long-doc signature and means run
    pack_sequences first.

    Same cost as the packing itself (one stratum-key shuffle + running
    sum) plus two tiny aggregates: shard loads (≤ |shards| rows
    map-side), then the per-stratum rollup.

    Output: (stratum, n_shards bigint, min_shard_tokens bigint,
    max_shard_tokens bigint, total_tokens bigint).
    """
    packed = pack_token_shards(
        docs, budget=budget, id_col=id_col, text_col=text_col, stratum_col=stratum_col
    )
    loads = packed.groupBy(stratum_col, "shard_id").agg(
        F.sum("n_tokens").cast("bigint").alias("shard_tokens")
    )
    return loads.groupBy(stratum_col).agg(
        F.count("*").cast("bigint").alias("n_shards"),
        F.min("shard_tokens").alias("min_shard_tokens"),
        F.max("shard_tokens").alias("max_shard_tokens"),
        F.sum("shard_tokens").cast("bigint").alias("total_tokens"),
    )
