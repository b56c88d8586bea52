"""Streaming leakage-safe split assignment: a self-growing corpus where
every micro-batch of documents receives its train/val/test split
AGAINST the standing assignment — near-duplicate clusters stay in one
split as they grow, assignments never change once written, and
cross-split cluster merges are flagged the moment the bridge document
arrives (the :func:`~kafka_streams_spark.operators.sampling.
leakage_safe_splits_incremental` semantics, run continuously).

Four batch-partitioned parquet stores under ``store_dir`` (the
corpus-ingest convention — state IS partitioned parquet, the only state
shape that works when state is 100 TB of corpus):

- ``assignments/``  (doc_id, split, leak_conflict, ingest_batch) —
  append-only: one row per doc, written by the batch that admitted it.
- ``members/``      (node, cluster_id, ingest_batch) — a merge-on-read
  CHANGELOG: a cluster merge relabels old nodes by writing NEW rows in
  the merging batch's partition; :func:`read_cluster_members` resolves
  latest-batch-wins per node (the balance_delta changelog pattern).
- ``docs/``         (doc_id, source, text, ingest_batch) — admitted
  bodies; read id-pruned for the candidate exact-verify join only.
- ``bands/``        (doc_id, band_idx, band_hash, ingest_batch) — the
  MinHash band-key index, appended per batch so the new×existing
  candidate join never re-signatures the corpus (the persisted
  write_minhash_index idea, maintained incrementally).

Exactly-once under at-least-once delivery: every read excludes the
current ``ingest_batch`` partition and every write dynamically
overwrites ONLY that partition, so a crash-replayed batch recomputes
the same verdicts against the same prior state and lands the same rows.
Docs whose ids already hold an assignment are dropped (cross-batch
re-delivery), and within-batch id duplicates keep the min-text row
(deterministic under re-partitioned replay).

Cluster maintenance is INCREMENTAL: per batch, connected components run
on the bounded subgraph of (new×new pairs ∪ verified new×existing
pairs ∪ star edges of the touched prior clusters) — never on the full
corpus graph. A batch that touches nothing re-labels nothing; the
100 TB cost per batch is the delta's signatures + one band-key join +
candidate-pruned verification + CC over the touched neighborhood.

Signature parameters (num_hashes/bands/shingle_n/hash_fn/threshold) and
the split boundaries are FROZEN per store (`_sketch_meta.json`): a
restart with different knobs would silently produce band keys that
never collide (every doc "novel") or a different split rule — the
stamped-store gate raises before the stream starts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_streams_spark.streaming.ingest import DOC_SCHEMA
from kafka_streams_spark.streaming.sketch_stream import (
    _check_sketch_meta,
    _stamp_sketch_store,
)


def _read_partitioned(
    spark: SparkSession, path: str, exclude_batch: int
) -> DataFrame | None:
    """Prior-state read: the store, excluding the replaying batch's own
    partition. None when the store does not exist yet — and ONLY then
    (any other failure must fail the batch, not skip the state)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path).filter(
            F.col("ingest_batch") != exclude_batch
        )
        df.schema  # force analysis while the miss is still catchable
        return df
    except AnalysisException as e:
        # ONLY a missing store means "no prior state". Any OTHER analysis
        # failure (schema/column resolution, corrupt store metadata) must
        # propagate: swallowing it would silently discard the standing
        # assignments and re-assign the batch as if the corpus were new —
        # exactly the leakage/duplication this module forbids (r10 advice
        # fix).
        cls = e.getErrorClass() if hasattr(e, "getErrorClass") else None
        if cls == "PATH_NOT_FOUND" or "[PATH_NOT_FOUND]" in str(e):
            return None
        raise


def _write_partition(df: DataFrame, path: str, batch_id: int) -> None:
    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def read_split_assignments(spark: SparkSession, store_dir: str) -> DataFrame:
    """The standing assignment: (doc_id, split, leak_conflict). One row
    per admitted doc by construction (cross-batch re-deliveries are
    dropped before assignment), so no winner resolution is needed."""
    return spark.read.parquet(f"{store_dir}/assignments").select(
        "doc_id", "split", "leak_conflict"
    )


def read_cluster_members(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current cluster membership: latest-batch row wins per node (a
    merge relabels old nodes by writing newer rows). Output:
    (node, cluster_id)."""
    from pyspark.sql import Window

    m = spark.read.parquet(f"{store_dir}/members")
    w = Window.partitionBy("node").orderBy(F.col("ingest_batch").desc())
    return (
        m.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("node", "cluster_id")
    )


def run_split_assignment_stream(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "md5_32",
    test_256: int = 13,
    val_256: int = 26,
    max_files_per_trigger: int = 100,
) -> StreamingQuery:
    """Start the assignment loop over a JSON document stream. Returns
    the StreamingQuery; state lands under ``store_dir`` (see module
    docstring for the four stores and the idempotence argument)."""
    from kafka_streams_spark.operators.dedup import (
        _banded_keys,
        duplicate_clusters,
        minhash_near_duplicates,
        minhash_pairs_incremental,
        minhash_signatures,
    )
    from kafka_streams_spark.operators.sampling import (
        leakage_safe_splits_incremental,
    )

    meta = {
        "threshold": threshold,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "hash_fn": hash_fn,
        "test_256": test_256,
        "val_256": val_256,
    }
    _check_sketch_meta(spark, store_dir, meta)
    _stamp_sketch_store(spark, store_dir, meta)

    a_dir = f"{store_dir}/assignments"
    m_dir = f"{store_dir}/members"
    d_dir = f"{store_dir}/docs"
    b_dir = f"{store_dir}/bands"

    raw = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    def assign(batch_df: DataFrame, batch_id: int) -> None:
        from kafka_streams_spark.functions.partitioning import (
            materialize_shared,
        )
        from kafka_streams_spark.operators.dedup import dedup_exact_rows

        # deterministic within-batch id dedup (min (text, source) row
        # wins), then drop cross-batch re-deliveries: an id that already
        # holds an assignment keeps it forever.
        batch = dedup_exact_rows(
            batch_df.withColumn(
                "_k", F.concat_ws("\x1f", F.col("text"), F.col("source"))
            ),
            ["doc_id"],
            "_k",
        ).drop("_k")
        prior_a = _read_partitioned(spark, a_dir, batch_id)
        if prior_a is not None:
            batch = batch.join(
                prior_a.select("doc_id"), "doc_id", "left_anti"
            )
        # the batch feeds signatures, new×new pairs, the verify join,
        # the docs write, and the assignment join — materialize once
        batch = materialize_shared(batch)

        prior_m = _read_partitioned(spark, m_dir, batch_id)
        prior_d = _read_partitioned(spark, d_dir, batch_id)
        prior_b = _read_partitioned(spark, b_dir, batch_id)

        # --- pair stage: new×new + verified new×existing ---
        nn = minhash_near_duplicates(
            batch,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            hash_fn=hash_fn,
        ).select(F.col("id_a"), F.col("id_b"))
        if prior_d is not None and prior_b is not None:
            ne = minhash_pairs_incremental(
                batch,
                prior_d,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
                hash_fn=hash_fn,
                existing_bands=prior_b.select(
                    "doc_id", "band_idx", "band_hash"
                ),
            ).select(
                F.col("new_id").alias("id_a"), F.col("ex_id").alias("id_b")
            )
        else:
            ne = None
        pairs = nn.unionByName(ne) if ne is not None else nn
        pairs = materialize_shared(pairs)

        # --- incremental CC over the touched neighborhood ---
        # star edges (member, cluster_id) of every prior cluster that a
        # new×existing pair touches carry the old connectivity into the
        # subgraph, so merges relabel ALL their members, not just the
        # endpoints the new pairs happened to hit.
        if prior_m is not None and ne is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("node").orderBy(
                F.col("ingest_batch").desc()
            )
            cur_m = materialize_shared(
                prior_m.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("node", "cluster_id")
            )
            touched = (
                ne.select(F.col("id_b").alias("node"))
                .distinct()
                .join(cur_m, "node")
                .select("cluster_id")
                .distinct()
            )
            stars = cur_m.join(
                F.broadcast(touched), "cluster_id"
            ).select(
                F.col("node").alias("id_a"),
                F.col("cluster_id").alias("id_b"),
            )
            sub_edges = pairs.unionByName(stars)
        else:
            sub_edges = pairs
        labels = materialize_shared(duplicate_clusters(sub_edges))

        # --- split assignment for the delta ---
        standing = (
            prior_a.select("doc_id", "split")
            if prior_a is not None
            else spark.createDataFrame([], "doc_id bigint, split string")
        )
        assigned = leakage_safe_splits_incremental(
            batch, standing, labels, test_256=test_256, val_256=val_256
        )

        # --- state writes, all into THIS batch's partitions ---
        _write_partition(assigned, a_dir, batch_id)
        # members changelog: every labeled node (new docs + relabeled
        # old members) plus singleton self-rows for unpaired new docs
        singles = (
            batch.select(F.col("doc_id").alias("node"))
            .join(labels.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("cluster_id"))
        )
        _write_partition(labels.unionByName(singles), m_dir, batch_id)
        _write_partition(
            batch.select("doc_id", "source", "text"), d_dir, batch_id
        )
        sig = minhash_signatures(
            batch, "doc_id", "text", num_hashes, shingle_n, hash_fn
        )
        _write_partition(
            _banded_keys(sig, "doc_id", num_hashes, bands, hash_fn),
            b_dir,
            batch_id,
        )

    return (
        raw.writeStream.foreachBatch(assign)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
