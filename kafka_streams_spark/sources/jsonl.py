"""JSONL corpus source/sink — the wire format crawl pipelines actually
exchange (WET/WARC extractions, API dumps, labeling exports are all
newline-delimited JSON long before anything becomes parquet).

Design mirrors the payment JSON serde policy (`schema.py`): an explicit
schema ALWAYS (inference is a full extra pass over the data and a
schema-drift time bomb at 100 TB), plus the same lenient/FAILFAST
choice the reference exposes — Kafka Streams'
`LogAndContinueExceptionHandler` vs `LogAndFailExceptionHandler`
(JsonDeserializer.java:29-31) map onto Spark's PERMISSIVE (corrupt rows
quarantined into a rescue column) and FAILFAST read modes.

At scale: JSONL splits by line, so a directory of .jsonl(.gz) files
parallelizes like any file source (gzip members are the split unit —
shard the files, don't concatenate one giant gz). The reader is also
`readStream`-able unchanged for the ingest-stream path
(`streaming/ingest.py` accepts any streaming DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    streaming: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema.

    - ``mode="PERMISSIVE"`` (default): malformed lines survive as rows
      whose declared columns are NULL and whose raw text lands in
      ``_corrupt_record`` — triage with :func:`split_corrupt`, don't
      silently drop. The lenient half of the reference's serde policy.
    - ``mode="FAILFAST"``: any malformed line fails the job — the
      `LogAndFail` half, for pipelines where a bad producer must stop
      the world.
    - ``streaming=True`` returns a `readStream` frame for incremental
      ingest (same schema contract; PERMISSIVE quarantine works in
      micro-batches too).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # Spark honors the mode option case-insensitively; normalize here
    # so mode='permissive' still declares the rescue column (and typos
    # fail loudly instead of silently reading PERMISSIVE-by-default)
    mode = mode.upper()
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown JSON read mode {mode!r}")
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        # the rescue column must be DECLARED for permissive capture.
        # list(...) copies: StructType(schema.fields) ALIASES the
        # caller's fields list and .add() would mutate the caller's
        # schema object (r7 review wave 5, verified on pyspark 4.1.2)
        schema = StructType(list(schema.fields)).add(CORRUPT_COL, "string")
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition a PERMISSIVE read into (clean, quarantine): clean rows
    with the rescue column dropped, and quarantined raw lines for the
    dead-letter path (the branched-sink pattern, `sources/branched.py`).

    The quarantine frame has the SAME shape in batch and streaming —
    the declared (all-NULL) columns plus ``raw`` — so dead-letter sink
    code is shared across the two modes (ADVICE r4). The parsed frame
    is materialized once (`materialize_shared`) for BATCH inputs: Spark
    refuses to query ONLY the internal corrupt column off a raw JSON
    scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented fix is to materialize the parse first), and the split
    has two consumers anyway, so the cut also removes the double parse.
    Streaming frames can't checkpoint mid-plan; there the quarantine's
    reference to real declared columns side-steps the restriction.
    """
    if CORRUPT_COL not in df.columns:
        # FAILFAST/DROPMALFORMED reads carry no rescue column; the empty
        # quarantine must still have the documented shape (declared
        # columns + `raw`) or shared dead-letter sink code written
        # against it resolves no `raw` column on exactly the "clean"
        # path (r10 review fix)
        return df, df.limit(0).withColumn(
            "raw", F.lit(None).cast("string")
        )
    bad = F.col(CORRUPT_COL).isNotNull()
    if not df.isStreaming:
        from kafka_streams_spark.functions.partitioning import materialize_shared

        df = materialize_shared(df)
    return (
        df.filter(~bad).drop(CORRUPT_COL),
        df.filter(bad).withColumnRenamed(CORRUPT_COL, "raw"),
    )


def write_jsonl_corpus(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Write a corpus as sharded JSONL — one file per partition, so the
    writer parallelism IS the shard layout (repartition first to choose
    shard count/size; `sources/bucketed.py write_ordered_shards` for
    globally-ordered exports). When the PERMISSIVE rescue column is
    present, quarantine ROWS are excluded and the column dropped:
    writing a freshly-read corpus used to re-emit every malformed
    source line as a junk row, silently polluting the output with the
    quarantine data :func:`split_corrupt` exists to triage (r10 review
    fix) — route the quarantine through split_corrupt's dead-letter
    side explicitly when it must be kept."""
    if CORRUPT_COL in df.columns:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    df.write.mode("overwrite").option("compression", compression).json(path)
