"""JSONL corpus source: schema-enforced reads, PERMISSIVE quarantine
vs FAILFAST, round-trip write, streaming reader parity."""

from __future__ import annotations

import gzip
import os

import pytest

from kafka_streams_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl_corpus,
    split_corrupt,
    write_jsonl_corpus,
)

SCHEMA = "doc_id bigint, text string"

GOOD = ['{"doc_id": 1, "text": "alpha"}', '{"doc_id": 2, "text": "beta"}']
BAD = ['{"doc_id": 3, "text": ', "not json at all"]


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_permissive_quarantines_corrupt_lines(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(os.path.join(src, "a.jsonl"), GOOD + BAD)
    df = read_jsonl_corpus(spark, src, SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, quarantine = split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    raw = {r["raw"] for r in quarantine.collect()}
    assert raw == set(BAD)


def test_failfast_raises_on_corrupt(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(os.path.join(src, "a.jsonl"), GOOD + BAD)
    # executor-side FAILFAST surfaces as a raw Py4J error, not a
    # converted PySparkException — match on the message instead
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_jsonl_corpus(spark, src, SCHEMA, mode="FAILFAST").collect()
    # and succeeds on a clean directory
    clean_src = str(tmp_path / "clean")
    _write(os.path.join(clean_src, "a.jsonl"), GOOD)
    rows = read_jsonl_corpus(spark, clean_src, SCHEMA, mode="FAILFAST").collect()
    assert len(rows) == 2


def test_roundtrip_write_read_gzip(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(os.path.join(src, "a.jsonl"), GOOD)
    df, _ = split_corrupt(read_jsonl_corpus(spark, src, SCHEMA))
    out = str(tmp_path / "out")
    write_jsonl_corpus(df, out)
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    with gzip.open(
        os.path.join(out, next(f for f in os.listdir(out) if f.endswith(".gz")))
    ) as f:
        assert b"alpha" in f.read()
    back = read_jsonl_corpus(spark, out, SCHEMA)
    clean, quarantine = split_corrupt(back)
    assert {(r["doc_id"], r["text"]) for r in clean.collect()} == {
        (1, "alpha"),
        (2, "beta"),
    }
    assert quarantine.count() == 0


def test_streaming_reader_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(os.path.join(src, "a.jsonl"), GOOD + BAD)
    stream = read_jsonl_corpus(spark, src, SCHEMA, streaming=True)
    assert stream.isStreaming
    clean, _ = split_corrupt(stream)
    q = (
        clean.writeStream.format("memory")
        .queryName("jsonl_clean")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.table("jsonl_clean").collect()}
        assert got == {1, 2}
    finally:
        q.stop()


def test_split_corrupt_shape_without_rescue_column_and_clean_write(
    spark, tmp_path
):
    """r10 review fixes: (1) the quarantine frame keeps the documented
    shape (declared columns + raw) even when the read carried no rescue
    column, so shared dead-letter sink code resolves `raw` on the clean
    path too; (2) write_jsonl_corpus drops the rescue column instead of
    re-emitting malformed source lines as {"_corrupt_record": ...} rows."""
    import json
    import os

    from kafka_streams_spark.sources.jsonl import (
        read_jsonl_corpus,
        split_corrupt,
        write_jsonl_corpus,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write('{"doc_id": 1, "source": "s", "text": "ok"}\n')
        f.write("{broken\n")

    schema = "doc_id bigint, source string, text string"
    clean_read = spark.createDataFrame([(1, "s", "ok")], schema)
    _, quarantine = split_corrupt(clean_read)  # no rescue column path
    assert "raw" in quarantine.columns and quarantine.count() == 0

    df = read_jsonl_corpus(spark, src, schema)
    out = str(tmp_path / "out")
    write_jsonl_corpus(df, out, compression="none")
    rows = []
    for name in os.listdir(out):
        if name.startswith("part-"):
            with open(os.path.join(out, name)) as f:
                rows += [json.loads(line) for line in f if line.strip()]
    assert all("_corrupt_record" not in r for r in rows)
    assert {r.get("doc_id") for r in rows} == {1}
