"""Structured Streaming wrapper for the payment topology.

The reference topology fans out: one consumed stream feeds BOTH the balance
aggregation and the two outbound-topic sinks (PaymentTopology.java:75-97),
reading the input once. Structured Streaming allows one sink per query, so
a naive port runs three queries and reads the source thrice. This router
keeps the reference's single-read property: ONE streaming query whose
``foreachBatch`` persists the transformed micro-batch and performs all
three writes (SURVEY.md §4.2).

State design — the balance store as a changelog:
Kafka Streams materializes the running sum in a local RocksDB store backed
by a changelog topic (PaymentTopology.java:88). The Spark-native analog
here is log-structured: each micro-batch writes its per-account *deltas*
to ``balance_delta/ingest_batch=<id>/`` with dynamic partition overwrite.
Replayed batches (restart from checkpoint) overwrite their own partition —
idempotent, so balances are exactly-once even though the stream itself is
at-least-once (matching the reference, which also runs without EOS —
KafkaStreamsDemoConfiguration.java:39-47 sets no processing.guarantee).
A balance lookup is ``SUM(delta) WHERE fromAccount = x`` over the delta
log; at 100 TB the log is partitioned by account hash-bucket so the scan
prunes to one bucket, and a periodic compaction folds old batches into a
base snapshot (same role as RocksDB compaction over the changelog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_streams_spark.operators.payments import (
    N_BALANCE_BUCKETS,  # re-export: one bucket-layout definition (r13)
    account_balances,
    balance_bucket,
    branch_by_rails,
    route_and_convert,
)
from kafka_streams_spark.schema import PAYMENT_SCHEMA

# single-scan fused branch+fx+merge (see operators.payments)
_transform = route_and_convert


def _migrate_delta_layout(spark: SparkSession, delta_dir: str) -> int:
    """One-time upgrade of pre-bucket delta stores (r8 advice fix).

    Before round 7 the changelog wrote ``balance_delta/ingest_batch=N/``
    with ``bucket`` as a plain DATA column; the bucketed layout nests
    ``bucket=M/`` under each batch. Spark partition discovery rejects
    mixed directory depths ("conflicting directory structures"), so the
    first read after upgrading would fail for any deployment carrying
    old partitions. This detects old-layout partitions (parquet files
    directly under ``ingest_batch=N/``) and rewrites each into the
    bucketed layout, deriving ``bucket`` when the files predate the
    column entirely. Idempotent and crash-safe: the rewrite lands in a
    ``._migrating`` temp dir, the old partition is parked at
    ``.pre_bucket`` before the swap, and a recovery preamble finishes
    or unwinds any interrupted swap on the next call. Returns the
    number of partitions migrated. No-op (one directory listing) on
    already-bucketed stores.

    All listing/rename/delete goes through the Hadoop FileSystem API
    (the ``_write_sketch_meta`` convention), not ``os``/``glob`` — so
    the migration works on whatever store the stream writes to
    (HDFS/S3A/local). The r8 version used local-only primitives, which
    silently no-op'd on a remote store and left the mixed-depth layout
    in place (r9 advisor find). NOTE: object stores without atomic
    directory rename (raw S3A) widen the park→swap crash window to a
    copy; the recovery preamble still converges on re-run."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(delta_dir)
    fs = root.getFileSystem(hconf)

    def _glob(pattern: str):
        statuses = fs.globStatus(HPath(pattern))
        return list(statuses) if statuses is not None else []

    def _is_dir(p) -> bool:
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def _rename(src, dst) -> None:
        # Hadoop FileSystem.rename signals failure by returning false,
        # not by raising (unlike os.rename). An unchecked false here is
        # a silent crash-safety hole: the caller would proceed to delete
        # the parked original even though the swap never happened (r10
        # advice fix). Raise so the migration aborts with the parked
        # copy intact — the recovery preamble converges on the next run.
        if not fs.rename(src, dst):
            raise IOError(f"rename failed: {src} -> {dst}")

    # recovery preamble: finish or unwind an interrupted swap
    for st in _glob(f"{delta_dir}/ingest_batch=*.pre_bucket"):
        parked = st.getPath()
        target_str = parked.toString()[: -len(".pre_bucket")]
        target = HPath(target_str)
        tmp = HPath(target_str + "._migrating")
        if _is_dir(target):
            fs.delete(parked, True)  # swap completed; drop the old copy
        elif _is_dir(tmp) and fs.exists(HPath(f"{tmp.toString()}/_SUCCESS")):
            _rename(tmp, target)  # crashed between park and swap
            fs.delete(parked, True)
        else:
            _rename(parked, target)  # rewrite incomplete: restart it

    migrated = 0
    for st in sorted(
        _glob(f"{delta_dir}/ingest_batch=*"), key=lambda s: s.getPath().toString()
    ):
        part = st.getPath()
        part_str = part.toString()
        if part_str.endswith("._migrating") or not st.isDirectory():
            continue
        if _glob(f"{part_str}/bucket=*"):
            continue  # already bucketed
        if not _glob(f"{part_str}/*.parquet"):
            continue  # empty partition: nothing to rewrite
        df = spark.read.parquet(part_str)
        if "bucket" not in df.columns:
            df = df.withColumn(
                "bucket", balance_bucket(F.col("fromAccount"))
            )
        tmp_str = part_str + "._migrating"
        (
            df.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp_str)
        )
        parked = HPath(part_str + ".pre_bucket")
        _rename(part, parked)
        _rename(HPath(tmp_str), part)
        # only after the swap rename is CONFIRMED is the parked copy safe
        # to drop — if _rename raised above, the park (and its .pre_bucket
        # marker the recovery preamble keys on) survives.
        fs.delete(parked, True)
        migrated += 1
    return migrated


def run_payment_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 100,
) -> StreamingQuery:
    """Start the full topology as one streaming query over a JSON file
    source (the offline stand-in for the Kafka source — swap
    ``readStream.format("kafka")`` in for production; the transform and
    router are source-agnostic).

    Sinks under ``out_dir``: ``rails_foo/`` and ``rails_bar/`` (append
    parquet — the outbound topics) and ``balance_delta/`` (the changelog).
    """
    raw = (
        spark.readStream.schema(PAYMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    foo_dir = os.path.join(out_dir, "rails_foo")
    bar_dir = os.path.join(out_dir, "rails_bar")
    delta_dir = os.path.join(out_dir, "balance_delta")
    # upgrade any pre-bucket partitions BEFORE the first batch writes a
    # nested one (mixed depths fail partition discovery — see
    # _migrate_delta_layout)
    _migrate_delta_layout(spark, delta_dir)

    # per-checkpoint-generation offset for ingest_batch (see
    # splits_stream._epoch_offset): a fresh checkpoint restarts batch ids
    # at 0, and without the offset a post-compaction fresh run's deltas
    # would land below the base hwm — invisible to BalanceView, deleted
    # by the next compact_balances, and eventually overwriting surviving
    # pre-crash partitions via dynamic partition overwrite.
    _epoch_cache: dict[str, int] = {}

    def route_batch(batch_df: DataFrame, raw_batch_id: int) -> None:
        from kafka_streams_spark.streaming.splits_stream import _epoch_offset

        if "offset" not in _epoch_cache:
            _epoch_cache["offset"] = _epoch_offset(
                spark,
                out_dir,
                checkpoint_dir,
                raw_batch_id,
                delta_dirs=[delta_dir],
                base_dirs=[os.path.join(out_dir, "balance_base")],
            ) - raw_batch_id
        batch_id = _epoch_cache["offset"] + raw_batch_id
        merged = _transform(batch_df)
        merged.persist()  # read-once fan-out: 3 writes, 1 computation
        try:
            foo, bar = branch_by_rails(merged)
            # Outbound "topics": append, batchId column makes replays
            # diagnosable (at-least-once, same as the reference).
            foo.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(foo_dir)
            bar.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(bar_dir)
            # Changelog: per-batch deltas, partition-overwrite => replaying
            # a batch after crash rewrites the same partition (idempotent).
            deltas = account_balances(merged).withColumnRenamed(
                "balance", "delta"
            )
            # bucket is a PARTITION column: without it in partitionBy,
            # every point lookup scanned the whole delta log (the
            # "1/64th pruning" the docstrings promise was a plain data
            # column — r7 review wave 4). repartition on bucket keeps
            # one file per (batch, bucket).
            (
                deltas.withColumn(
                    "bucket", balance_bucket(F.col("fromAccount"))
                )
                .withColumn("ingest_batch", F.lit(batch_id))
                .repartition("bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch", "bucket")
                .parquet(delta_dir)
            )
        finally:
            merged.unpersist()

    return (
        raw.writeStream.foreachBatch(route_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )


def compact_balances(spark: SparkSession, out_dir: str) -> int | None:
    """Fold closed delta partitions into a base snapshot — the analog of
    RocksDB compaction over the changelog topic. Returns the new
    high-water batch id, or None if there was nothing to fold.

    Only batches strictly below the newest delta partition are folded:
    Structured Streaming may replay (and partition-overwrite) the latest
    uncommitted batch after a crash, and folding it would double-count on
    replay. The base lives at ``balance_base/hwm=<N>/``; readers take the
    max-hwm base plus deltas with ``ingest_batch > N``, so a compaction
    running concurrently with the stream never changes query results.

    All listing/deletion goes through the Hadoop FileSystem API (r10 —
    the ``_migrate_delta_layout`` convention), so compaction works on
    whatever store the stream writes to (HDFS/S3A/local); the prior
    glob/shutil version silently no-op'd on remote stores.
    """
    from kafka_streams_spark.streaming.splits_stream import (
        _fs,
        _list_partition_values,
        _sweep_base_snapshots,
    )

    delta_dir = os.path.join(out_dir, "balance_delta")
    base_dir = os.path.join(out_dir, "balance_base")
    _migrate_delta_layout(spark, delta_dir)
    fs, HPath = _fs(spark, delta_dir)
    batches = _list_partition_values(spark, delta_dir, "ingest_batch")
    # sweep snapshot debris (uncommitted bases a crashed compaction left
    # mid-write; superseded committed bases a crash left undeleted)
    # BEFORE trusting any hwm — an uncommitted base is partial, and
    # folding "up to" it would delete deltas it never contained
    old_hwm = _sweep_base_snapshots(spark, base_dir)
    if len(batches) < 2:
        return old_hwm  # nothing safely foldable
    hwm = batches[-2]
    if old_hwm is not None and hwm <= old_hwm:
        # Nothing newly closed — but a compaction that crashed between
        # writing the base and deleting the folded deltas leaves
        # ingest_batch <= old_hwm partitions behind; finish its cleanup
        # (readers already exclude them via the > hwm filter).
        for b in batches[:-1]:
            if b <= old_hwm:
                fs.delete(
                    HPath(f"{delta_dir}/ingest_batch={b}"), True
                )
        return old_hwm
    # Deltas already folded into the old base must NOT fold again: after
    # a crashed compaction (base written, deltas not yet deleted) the
    # <= hwm filter alone would union batches <= old_hwm with the base
    # that already contains them — permanent double count (r7 review
    # wave 4). This is the same `ingest_batch > old_hwm` predicate the
    # readers apply.
    closed = (
        spark.read.parquet(delta_dir)
        .filter(
            (F.col("ingest_batch") <= hwm)
            & (F.col("ingest_batch") > (old_hwm if old_hwm is not None else -1))
        )
        .select("fromAccount", "delta", "bucket")
    )
    if old_hwm is not None:
        closed = closed.unionByName(
            spark.read.parquet(os.path.join(base_dir, f"hwm={old_hwm}"))
            .select("fromAccount", F.col("balance").alias("delta"), "bucket")
        )
    folded = closed.groupBy("fromAccount", "bucket").agg(
        F.sum("delta").alias("balance")
    )

    new_base = os.path.join(base_dir, f"hwm={hwm}")
    folded.write.mode("overwrite").parquet(new_base)
    # drop folded inputs (old base + closed delta partitions) — only
    # AFTER the new base is committed
    if old_hwm is not None and old_hwm != hwm:
        fs.delete(HPath(f"{base_dir}/hwm={old_hwm}"), True)
    for b in batches[:-1]:
        fs.delete(HPath(f"{delta_dir}/ingest_batch={b}"), True)
    return hwm


def _latest_base_hwm(spark: SparkSession, base_dir: str) -> int | None:
    """Newest COMMITTED base snapshot — delegates to the shared
    ``_latest_hwm`` (one hwm-discovery implementation for the balances
    and splits compactors, r10 review fix: the prior copy here also
    skipped the ``_SUCCESS`` commit-marker check, so a reader could
    trust a base a crashed compaction left half-written)."""
    from kafka_streams_spark.streaming.splits_stream import _latest_hwm

    return _latest_hwm(spark, base_dir)


class BalanceView:
    """Interactive-query surface over the balance changelog — the analog of
    the reference's REST store lookup (BalanceController.java:22-35).

    ``get_balance`` returns None for accounts that never sent (the 404
    case), never 0. The bucket predicate prunes the scan to 1/64th of the
    log; partition pruning on parquet makes the lookup O(one bucket), not
    O(state).
    """

    def __init__(self, spark: SparkSession, out_dir: str):
        self._spark = spark
        self._delta_dir = os.path.join(out_dir, "balance_delta")
        self._base_dir = os.path.join(out_dir, "balance_base")
        _migrate_delta_layout(spark, self._delta_dir)

    def _log(self) -> DataFrame:
        """Base snapshot (if compacted) + deltas with ``ingest_batch >
        hwm``. The filter is the reader half of the compaction contract
        (see ``compact_balances``): a compaction that crashed after
        writing ``balance_base/hwm=N/`` but before deleting the folded
        ``ingest_batch<=N`` partitions — or a reader racing a live
        compaction — would otherwise count those amounts twice. The
        predicate is on a partition column, so the already-folded
        partitions are pruned at planning time, never scanned."""
        deltas = self._spark.read.parquet(self._delta_dir)
        hwm = _latest_base_hwm(self._spark, self._base_dir)
        if hwm is None:
            return deltas.select("fromAccount", "delta", "bucket")
        open_deltas = deltas.filter(F.col("ingest_batch") > hwm).select(
            "fromAccount", "delta", "bucket"
        )
        base = self._spark.read.parquet(
            os.path.join(self._base_dir, f"hwm={hwm}")
        ).select("fromAccount", F.col("balance").alias("delta"), "bucket")
        return open_deltas.unionByName(base)

    def balances(self) -> DataFrame:
        """Full materialized view: SUM(delta) per account over base+log."""
        return self._log().groupBy("fromAccount").agg(
            F.sum("delta").alias("balance")
        )

    def get_balance(self, account: str):
        rows = (
            self._log()
            .filter(
                (F.col("bucket") == balance_bucket(F.lit(account)))
                & (F.col("fromAccount") == account)
            )
            .groupBy("fromAccount")
            .agg(F.sum("delta").alias("balance"))
            .collect()
        )
        return rows[0]["balance"] if rows else None

    def describe_topology(self) -> str:
        """Topology-endpoint parity (TopologyController.java:20-23): the
        textual plan of the materialized-balances query."""
        return self.balances()._jdf.queryExecution().toString()
