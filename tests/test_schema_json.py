"""JSON (de)serialization parity pins — FIXTURES.md §4 edge vectors,
matching the reference's lenient Jackson config (JsonMapper.java:11-17):
unknown fields ignored, missing fields → null, null payload → no record.
Malformed JSON → null row (documented difference vs the reference, which
throws and kills the stream thread — SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import Row

from kafka_streams_spark.schema import (
    PAYMENT_FIELDS,
    parse_payment_stream,
    payment_to_json,
)


def kafka_shaped(spark, pairs):
    rows = [
        Row(key=k.encode() if k else None, value=v.encode() if v else None)
        for k, v in pairs
    ]
    return spark.createDataFrame(rows, "key binary, value binary")


def test_extra_fields_ignored(spark):
    raw = kafka_shaped(
        spark,
        [("p1", '{"paymentId":"p1","amount":5,"currency":"GBP",'
                '"toAccount":"B","fromAccount":"A","rails":"BANK_RAILS_FOO",'
                '"unknownField":123,"another":"x"}')],
    )
    rows = parse_payment_stream(raw).collect()
    assert len(rows) == 1
    assert rows[0]["amount"] == 5
    assert set(rows[0].asDict()) == {"key", *PAYMENT_FIELDS}


def test_missing_fields_null(spark):
    raw = kafka_shaped(spark, [("p1", '{"paymentId":"p1","amount":7}')])
    r = parse_payment_stream(raw).collect()[0]
    assert r["amount"] == 7
    assert r["currency"] is None and r["rails"] is None


def test_null_payload_dropped(spark):
    raw = kafka_shaped(
        spark,
        [("p1", None),
         ("p2", '{"paymentId":"p2","amount":1,"currency":"GBP",'
                '"toAccount":"B","fromAccount":"A","rails":"BANK_RAILS_FOO"}')],
    )
    rows = parse_payment_stream(raw).collect()
    assert [r["paymentId"] for r in rows] == ["p2"]


def test_malformed_json_becomes_null_row(spark):
    raw = kafka_shaped(spark, [("p1", "{not json"), ("p2", "[]")])
    assert parse_payment_stream(raw).count() == 0


def test_serialize_field_order_pinned(spark):
    df = spark.createDataFrame(
        [("p1", 5, "GBP", "B", "A", "BANK_RAILS_FOO")], PAYMENT_FIELDS
    )
    out = df.select(payment_to_json().alias("j")).collect()[0]["j"]
    assert out == (
        '{"paymentId":"p1","amount":5,"currency":"GBP",'
        '"toAccount":"B","fromAccount":"A","rails":"BANK_RAILS_FOO"}'
    )


def test_failfast_mode_kills_on_malformed(spark):
    """FAILFAST parity with JsonDeserializer.java:29-31: a malformed
    payload fails the job instead of becoming a dropped null row."""
    import pytest

    raw = kafka_shaped(spark, [("p1", "{not json")])
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        parse_payment_stream(raw, mode="FAILFAST").collect()


def test_failfast_mode_passes_wellformed_and_empty_object(spark):
    """Well-formed payloads — including `{}`, which Jackson parses to
    all-null fields — behave identically under FAILFAST."""
    good = (
        '{"paymentId":"p2","amount":1,"currency":"GBP",'
        '"toAccount":"B","fromAccount":"A","rails":"BANK_RAILS_FOO"}'
    )
    raw = kafka_shaped(spark, [("p1", "{}"), ("p2", good)])
    rows = parse_payment_stream(raw, mode="FAILFAST").collect()
    assert [r["paymentId"] for r in rows] == ["p2"]


def test_from_json_mode_validated():
    import pytest
    from pyspark.sql import functions as F

    from kafka_streams_spark.schema import payment_from_json

    with pytest.raises(ValueError, match="PERMISSIVE or FAILFAST"):
        payment_from_json(F.col("v"), mode="DROPMALFORMED")


def test_payment_to_json_emits_null_fields(spark):
    """r10 review fix: Spark's to_json default drops null-valued fields,
    so a sparse payment re-serialized with fields ABSENT — the reference
    Jackson serializer emits "currency":null etc. (byte-stable goldens
    need the full pinned field list on every record)."""
    from kafka_streams_spark.schema import payment_from_json, payment_to_json

    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [('{"paymentId":"p1","amount":7}',)], "value string"
    )
    out = (
        raw.select(payment_from_json(F.col("value")).alias("p"))
        .select("p.*")
        .select(payment_to_json().alias("j"))
        .collect()[0]["j"]
    )
    assert '"currency":null' in out and '"toAccount":null' in out
    assert '"paymentId":"p1"' in out and '"amount":7' in out
