"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The Spark-side architecture here is real and tested — schemas, batch
iteration, partition sizing, UDF signatures. The codec step itself is
STUBBED (``decode_image`` raises unless given the deterministic fake
codec) because the container ships no image/audio libraries; swap
``_FAKE_CODEC`` for Pillow/torchaudio decoding without touching any
Spark plumbing.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs task
sizing; mapInPandas streams Arrow record batches, so a task never holds
more than one batch of decoded media in Python memory. Keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small (e.g. 64) for
multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png, wav, mp4, ...
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),  # -1 when unknown pre-decode
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature_hex", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real image decode: derives shape and a
    feature fingerprint purely from the md5 of the bytes. md5 + ascii
    arithmetic only, so the DuckDB oracle can reproduce it exactly.
    Replace with Pillow: ``img = PIL.Image.open(io.BytesIO(payload))``.

    THE REFERENCE DEFINITION of the fake codec: the mapInPandas
    closures below carry their own inline copies ON PURPOSE (closures
    must stay self-contained — no module-global references — so
    cloudpickle ships them by value and the engine works from any
    launch directory). test_extended_ops pins the inline copies equal
    to this function so they cannot drift silently."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "width": 1 + (ord(h[0]) * 256 + ord(h[1])) % 1024,
        "height": 1 + (ord(h[2]) * 256 + ord(h[3])) % 1024,
        "feature_hex": h[:16],
    }


def decode_image(payload: bytes) -> dict[str, Any]:
    """Real decode entry point — intentionally unimplemented in this
    container (no Pillow/libjpeg). The engine-side contract is
    bytes -> {width, height, payload_crc, feature_hash}."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; use codec='fake' for the deterministic test codec"
    )


def extract_image_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-image feature extraction over Arrow batches.

    mapInPandas (not a scalar pandas_udf) because decode fan-out may
    change row multiplicity later (e.g. video frame sampling) and because
    it lets us drop the payload column from the OUTPUT schema — the
    binary bytes never travel past this operator (column pruning works
    upstream: only `media_id` + `payload` are read from the scan).
    """
    if codec != "fake":
        decode_image(b"")  # raises NotImplementedError with guidance

    # NOTE: the closure below must stay self-contained (imports inside, no
    # references to module globals). cloudpickle then ships it by VALUE to
    # the Python workers — which cannot be assumed to have
    # kafka_streams_spark importable on their own sys.path.
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        # inline copy of module-level _fake_decode (self-contained on
        # purpose; equality pinned in tests)
        def decode(payload: bytes) -> dict:
            h = hashlib.md5(payload).hexdigest()
            return {
                "width": 1 + (ord(h[0]) * 256 + ord(h[1])) % 1024,
                "height": 1 + (ord(h[2]) * 256 + ord(h[3])) % 1024,
                "feature_hex": h[:16],
            }

        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature_hex": [f["feature_hex"] for f in feats],
                }
            )

    return media.select("media_id", "payload").filter(F.col("payload").isNotNull()).mapInPandas(
        process, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_nth: int = 10, codec: str = "fake") -> DataFrame:
    """Frame-sampling shape: one input row -> N output rows (frame index +
    per-frame feature). Demonstrates the row-multiplying mapInPandas
    contract real video decoding needs; frames here are synthesized
    deterministically from the payload bytes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_md5", StringType()),
        ]
    )
    if codec != "fake":
        raise NotImplementedError("real video decode not available in this container")

    # self-contained closure — see note in extract_image_features
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # ceil: the tail bytes are a frame too — floor
                # dropped len % every_nth bytes, so distinct payloads
                # sharing a prefix emitted identical frame sets (r10
                # review fix)
                step = max(every_nth, 1)
                n_frames = max(1, -(-len(payload) // step))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    chunk = payload[i * every_nth : (i + 1) * every_nth]
                    hs.append(hashlib.md5(chunk).hexdigest())
            yield _pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_md5": hs}
            )

    return media.select("media_id", "payload").filter(F.col("payload").isNotNull()).mapInPandas(process, schema=out_schema)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("loudness_hex", StringType()),
    ]
)


def decode_audio(payload: bytes) -> dict[str, Any]:
    """Real decode entry point — intentionally unimplemented in this
    container (no torchaudio/librosa/ffmpeg). Engine-side contract:
    bytes -> {sample_rate, n_samples, pcm}."""
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "container; use codec='fake' for the deterministic test codec"
    )


def extract_audio_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-clip audio feature extraction over Arrow batches — the audio
    twin of :func:`extract_image_features`. The fake codec derives
    sample-rate/length/loudness deterministically from the payload md5
    (ascii arithmetic only, DuckDB-reproducible); swap in a real
    decoder (torchaudio/ffmpeg) without touching the Spark plumbing."""
    if codec != "fake":
        decode_audio(b"")  # raises NotImplementedError with guidance

    # self-contained closure — see note in extract_image_features
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        rates = [8000, 16000, 22050, 44100]

        for pdf in batches:
            ids, srs, ns, durs, lh = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(payload).hexdigest()
                sr = rates[ord(h[4]) % 4]
                n_samples = len(payload) * 100
                ids.append(mid)
                srs.append(sr)
                ns.append(n_samples)
                durs.append(n_samples * 1000 // sr)
                lh.append(h[16:32])
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": srs,
                    "n_samples": ns,
                    "duration_ms": durs,
                    "loudness_hex": lh,
                }
            )

    return media.select("media_id", "payload").filter(F.col("payload").isNotNull()).mapInPandas(
        process, schema=AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_dim: int = 256, codec: str = "fake") -> DataFrame:
    """Binary -> binary transform shape: decode, clamp the longer edge to
    ``max_dim`` (aspect-free fake: both edges clamp), re-encode. This is
    the contract a real thumbnailer needs — payload column in AND out,
    metadata updated — so the output stays a media table for downstream
    operators. The fake re-encode is the md5 hex of the input bytes
    (DuckDB-reproducible); the payload column never leaves the executor
    JVM<->Python Arrow channel as anything but binary."""
    if codec != "fake":
        decode_image(b"")

    # self-contained closure — see note in extract_image_features
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(payload).hexdigest()
                w = 1 + (ord(h[0]) * 256 + ord(h[1])) % 1024
                ht = 1 + (ord(h[2]) * 256 + ord(h[3])) % 1024
                ids.append(mid)
                ws.append(min(w, max_dim))
                hs.append(min(ht, max_dim))
                outs.append(h.encode("ascii"))
            yield _pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "payload": outs}
            )

    return media.select("media_id", "payload").filter(F.col("payload").isNotNull()).mapInPandas(
        process, schema=RESIZED_SCHEMA
    )


def synthesize_media(spark, n: int = 100, distinct_payloads: int | None = None) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from media_id. Built distributed (spark.range), not driver-side.

    ``distinct_payloads=K`` keys the payload on ``media_id % K`` instead
    of the id itself, so the table contains exact duplicate payloads
    (n − K of them) — the fixture for :func:`dedup_media_exact`."""
    # Partition count tracks the data, not the cluster: each partition
    # spawns a Python worker in the mapInPandas consumer, and 32 workers
    # for 200 rows is all spawn cost. Real media tables size partitions
    # by bytes (maxPartitionBytes), not row counts.
    slices = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    df = spark.range(0, n, 1, slices).withColumnRenamed("id", "media_id")
    key = F.col("media_id")
    if distinct_payloads is not None:
        if distinct_payloads < 1:
            raise ValueError("distinct_payloads must be >= 1")
        key = key % distinct_payloads
    payload = F.encode(
        F.concat(F.lit("media-payload-"), F.sha2(key.cast("string"), 256)),
        "utf-8",
    )
    return df.select(
        "media_id",
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        payload.alias("payload"),
        F.lit(-1).cast("int").alias("width"),
        F.lit(-1).cast("int").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )


def dedup_media_exact(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact media deduplication by payload digest — byte-identical
    images/audio re-crawled under different ids collapse to one
    surviving row (min-id winner) with a copy count. The multimodal
    face of :func:`~kafka_streams_spark.operators.dedup.dedup_exact`:
    at corpus scale the md5 computes as a map-side projection at the
    scan, so only (digest, id) pairs — never the multi-MB payloads —
    enter the shuffle (the same bytes-stay-put discipline as
    `extract_image_features` dropping the payload from its output).

    Near-dup (perceptually-similar) media is the feature path instead:
    `extract_image_features` → `feature_hex`/embedding → the
    similarity family; this operator is the exact gate that runs first
    and is the cheapest 90% of media dedup in practice.

    Output: (payload_md5, id — minimum id holding these bytes,
    n_copies bigint).
    """
    h = media.select(
        F.col(id_col), F.md5(F.col(payload_col)).alias("payload_md5")
    )
    return h.groupBy("payload_md5").agg(
        F.min(id_col).alias(id_col),
        F.count("*").cast("bigint").alias("n_copies"),
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def media_phash(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Perceptual hash per media row: a 60-bit content signature whose
    Hamming distance tracks perceptual similarity (pHash: grayscale →
    32×32 DCT → sign-of-low-frequency-coefficients bit vector). A real
    codec computes that from decoded pixels; this container's
    deterministic fake codec derives the 60 bits from md5(payload)
    (first 15 hex chars — the md5_60 convention), which DuckDB
    reproduces exactly, so the full near-dup contract is
    oracle-checkable end-to-end.

    Same Arrow mapInPandas shape as `extract_image_features` — decode
    happens where a real codec needs it (Python, batched), and the
    payload bytes never leave the map stage: only (media_id, phash)
    rows exist downstream, so the banding shuffle in
    :func:`dedup_media_near` moves 16 bytes per image regardless of
    image size.
    """
    if codec != "fake":
        decode_image(b"")  # raises NotImplementedError with guidance

    # self-contained closure: shipped by value to Python workers
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "phash": [
                        int(hashlib.md5(p).hexdigest()[:15], 16)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").filter(F.col("payload").isNotNull()).mapInPandas(
        process, schema=PHASH_SCHEMA
    )


def dedup_media_near(
    media: DataFrame,
    max_hamming: int = 8,
    codec: str = "fake",
    strategy: str = "pigeonhole",
) -> DataFrame:
    """Near-duplicate media pairs: re-encoded / resized / watermarked
    copies of the same image land within a few pHash bits of each other,
    so pairs with Hamming distance ≤ ``max_hamming`` are dedup
    candidates — the perceptual complement to byte-exact
    :func:`dedup_media_exact` (which only catches identical files).

    Composition: :func:`media_phash` (Arrow decode, payloads stay put)
    → the generic pigeonhole
    :func:`~kafka_streams_spark.operators.dedup.hamming_pairs` over the
    60-bit signatures — EXACT within the radius (no false negatives),
    (max_hamming+1) bucket chunks, one bucket-join shuffle of 16-byte
    rows. The same scale argument as text SimHash dedup: at 100 TB of
    images the only corpus-sized shuffle is (chunk, 16 bytes/row).

    ``strategy``: ``"pigeonhole"`` (default — the tight-radius dedup
    use case this operator exists for), ``"brute"``, or ``"auto"``
    (price the radius with the bucket stats and route — see
    :func:`~kafka_streams_spark.operators.dedup.hamming_pairs_auto`).
    Output identical across all three.

    Output: (id_a, id_b, hamming), id_a < id_b.
    """
    from kafka_streams_spark.operators.dedup import (
        hamming_pairs,
        hamming_pairs_auto,
        hamming_pairs_brute,
    )

    sigs = media_phash(media, codec=codec)
    if strategy == "auto":
        return hamming_pairs_auto(sigs, "media_id", "phash", 60, max_hamming)
    if strategy == "brute":
        return hamming_pairs_brute(sigs, "media_id", "phash", max_hamming)
    if strategy == "pigeonhole":
        return hamming_pairs(sigs, "media_id", "phash", 60, max_hamming)
    raise ValueError(f"unknown strategy {strategy!r}")
