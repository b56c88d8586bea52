"""join_size_audit — the join pre-flight pricing audit: exact inner
equi-join cardinality + hot-key share from per-key count profiles,
without running the join. The audit's read-off is checked against the
actually-executed join on every case, including the ones the driver
corpus can't produce (NULL keys, empty intersection, one dominating
hot key)."""

from __future__ import annotations

from kafka_streams_spark.operators.profiling import join_size_audit


def _audit(spark, a_keys, b_keys):
    a = spark.createDataFrame([(k,) for k in a_keys], "ka bigint")
    b = spark.createDataFrame([(k,) for k in b_keys], "kb bigint")
    row = join_size_audit(a, "ka", b, "kb").collect()[0]
    true_join = a.join(b, a.ka == b.kb).count()
    assert row["join_rows"] == true_join, (row, true_join)
    return row


def test_join_rows_exact_with_duplicates_and_nulls(spark):
    # key 1: 3x2 rows; key 2: 1x1; key 3 only in a; NULLs never match
    row = _audit(spark, [1, 1, 1, 2, 3, None], [1, 1, 2, 4, None, None])
    assert row["n_rows_a"] == 6 and row["n_rows_b"] == 6
    assert row["n_keys_a"] == 3 and row["n_keys_b"] == 3  # NULL excluded
    assert row["n_shared_keys"] == 2
    assert row["join_rows"] == 7  # 3*2 + 1*1
    assert row["top_key"] == "1" and row["top_key_share"] == 6.0 / 7.0


def test_empty_intersection_convention(spark):
    row = _audit(spark, [1, 2], [3, 4])
    assert row["join_rows"] == 0 and row["n_shared_keys"] == 0
    assert row["top_key"] is None and row["top_key_share"] == 0.0


def test_hot_key_read_off_signals_salting(spark):
    """One key carrying ~all the output is exactly the case
    functions.partitioning.salted_join exists for — the audit must
    surface it as top_key_share ~ 1."""
    row = _audit(spark, [7] * 100 + [1, 2], [7] * 50 + [1, 2])
    assert row["top_key"] == "7"
    assert row["top_key_share"] == 5000.0 / 5002.0


def test_tie_break_is_largest_contribution_then_key_string(spark):
    # keys 5 and 9 both contribute 2x2=4 rows -> largest key string wins
    row = _audit(spark, [5, 5, 9, 9], [5, 5, 9, 9])
    assert row["top_key"] == "9" and row["top_key_share"] == 0.5


def test_profile_join_never_touches_data_rows(spark, monkeypatch):
    """Plan shape: the audit joins the two AGGREGATED profiles, so no
    exchange carries unaggregated input rows — both scans feed a
    partial aggregate before any join. Checked structurally: every
    join in the plan sits above an Aggregate on both sides. Audited
    with NO_CKPT (the materialize_shared boundary otherwise collapses
    the profile subtree to an opaque RDD scan)."""
    monkeypatch.setenv("SPARK_GRAFT_NO_CKPT", "1")
    a = spark.createDataFrame([(i % 10,) for i in range(1000)], "ka bigint")
    b = spark.createDataFrame([(i % 7,) for i in range(1000)], "kb bigint")
    plan = (
        join_size_audit(a, "ka", b, "kb")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the contribution join's children must already be aggregates:
    # no Join node may appear before (above) the first Aggregate-free
    # raw relation without an intervening Aggregate. Cheap proxy: the
    # optimized plan contains no Join whose direct child subtree lacks
    # an Aggregate — assert per-line indentation ordering instead of
    # parsing: every LocalRelation/LogicalRDD ancestor chain up to a
    # Join must pass through an Aggregate.
    lines = plan.splitlines()
    indents = [len(ln) - len(ln.lstrip(" :+-")) for ln in lines]
    for i, ln in enumerate(lines):
        if "LogicalRDD" in ln or "LocalRelation" in ln:
            seen_agg = False
            cur = indents[i]
            for j in range(i - 1, -1, -1):
                if indents[j] < cur:
                    cur = indents[j]
                    if "Aggregate" in lines[j]:
                        seen_agg = True
                    if "Join" in lines[j]:
                        assert seen_agg, (
                            "raw relation reaches a Join before any "
                            "Aggregate:\n" + plan
                        )
            assert seen_agg, plan

def test_live_profile_prices_stream_static_join(spark, tmp_path):
    """The streamed per-key profile feeds join_size_from_profiles: the
    live pricing of a stream-static join equals join_size_audit over
    everything ingested, across two micro-batch waves and after
    snapshot-pin compaction."""
    import json
    import os

    from kafka_streams_spark.operators.profiling import (
        join_size_from_profiles,
        key_profile,
    )
    from kafka_streams_spark.streaming.sketch_stream import (
        compact_key_profile,
        read_key_profile,
        run_key_profile_stream,
    )

    src = str(tmp_path / "src")
    prof = str(tmp_path / "profile")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    docs_a = [
        {"doc_id": i, "source": "s%d" % (i % 3), "text": "x"} for i in range(30)
    ] + [{"doc_id": 90, "source": None, "text": "null-key row"}]
    docs_b = [
        {"doc_id": 100 + i, "source": "s%d" % (i % 4), "text": "y"}
        for i in range(25)
    ]
    with open(f"{src}/a.json", "w") as f:
        f.write("\n".join(json.dumps(d) for d in docs_a))
    q = run_key_profile_stream(spark, src, prof, ckpt, key_col="source")
    try:
        q.processAllAvailable()
        with open(f"{src}/b.json", "w") as f:
            f.write("\n".join(json.dumps(d) for d in docs_b))
        q.processAllAvailable()
    finally:
        q.stop()

    static = spark.createDataFrame(
        [("s0", 1), ("s0", 2), ("s3", 3), (None, 4)], "src string, v bigint"
    )
    all_docs = spark.createDataFrame(
        [(d["source"],) for d in docs_a + docs_b], "source string"
    )
    live = join_size_from_profiles(
        read_key_profile(spark, prof), key_profile(static, "src")
    ).collect()[0]
    from kafka_streams_spark.operators.profiling import join_size_audit

    batch = join_size_audit(all_docs, "source", static, "src").collect()[0]
    assert live.asDict() == batch.asDict()
    # and the pricing is the truth of the executed join
    true_join = all_docs.join(static, all_docs.source == static.src).count()
    assert live["join_rows"] == true_join

    compact_key_profile(spark, prof)
    live2 = join_size_from_profiles(
        read_key_profile(spark, prof), key_profile(static, "src")
    ).collect()[0]
    assert live2.asDict() == batch.asDict()
    parts = {
        r[0]
        for r in spark.read.parquet(prof).select("ingest_batch").distinct().collect()
    }
    assert parts == {-1}
