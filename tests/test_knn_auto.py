"""knn_auto — the production ANN chooser (round-6 verdict item 4): the
four audited paths' measured recall finally drives a single entry
point. The dispatch rule is knn_recall_audit (similarity.py) applied
down the cost ladder until recall_target is met; these tests pin the
rule by cross-checking every route against the audits it consults."""

from __future__ import annotations

from kafka_streams_spark.operators.similarity import (
    knn_auto,
    knn_recall_audit,
    knn_to_id,
    pq_label_codebooks,
)
from kafka_streams_spark.sources.testdata import load_table


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _route_and_ids(df):
    rows = df.collect()
    routes = {r["route"] for r in rows}
    assert len(routes) == 1, routes
    return routes.pop(), {r["vec_id"] for r in rows}


def test_routes_to_first_rung_meeting_target(spark, sf_dir):
    """With a target below the single-LSH audit's measured recall, the
    cheapest rung wins; with a target above it but within hamming's,
    the ladder advances exactly one rung (single LSH measures 4-5/10 on
    this corpus, binary hamming 10/10 — knn_recall_audit's r6 table)."""
    embs = _embs(spark, sf_dir)
    single_hits = knn_recall_audit(embs, 0, k=10).collect()[0]["n_hits"]
    assert single_hits < 8  # the corpus property the contract rides on

    low = single_hits / 10.0  # need == single_hits -> single passes
    route, _ = _route_and_ids(
        knn_auto(embs, 0, k=10, recall_target=low, ladder=("single", "hamming"))
    )
    assert route == "single"

    route, ids = _route_and_ids(
        knn_auto(embs, 0, k=10, recall_target=0.8, ladder=("single", "hamming"))
    )
    assert route == "hamming"
    # hamming at shortlist=100 measures 10/10 here: ids == exact top-k
    exact = {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}
    assert ids == exact


def test_exact_fallback_when_no_rung_meets_target(spark, sf_dir):
    """A ladder whose every rung audits below target must fall back to
    brute-force exact — never silently ship the failing approximation."""
    embs = _embs(spark, sf_dir)
    route, ids = _route_and_ids(
        knn_auto(embs, 0, k=10, recall_target=1.0, ladder=("single",))
    )
    assert route == "exact"
    exact = {r["vec_id"] for r in knn_to_id(embs, 0, 10).collect()}
    assert ids == exact


def test_multitable_and_ivfpq_rungs_consult_their_audits(spark, sf_dir):
    """Each remaining rung routes iff its own audit meets the target —
    the rule, not a hardcoded preference (knn_recall_audit
    method='multitable'/'ivfpq' are the consulted functions)."""
    embs = _embs(spark, sf_dir)
    mt_hits = knn_recall_audit(
        embs, 0, k=10, n_planes=4, method="multitable", n_tables=4
    ).collect()[0]["n_hits"]
    route, _ = _route_and_ids(
        knn_auto(
            embs, 0, k=10, recall_target=mt_hits / 10.0, ladder=("multitable",)
        )
    )
    assert route == "multitable"

    books = pq_label_codebooks(embs, m=4)
    pq_hits = knn_recall_audit(
        embs, 0, k=10, method="ivfpq", codebooks=books, n_probe=2, shortlist=100
    ).collect()[0]["n_hits"]
    route, _ = _route_and_ids(
        knn_auto(
            embs, 0, k=10, recall_target=pq_hits / 10.0,
            ladder=("ivfpq",), codebooks=books,
        )
    )
    assert route == "ivfpq"
    # without codebooks the ivfpq rung is skipped, not crashed
    route, _ = _route_and_ids(
        knn_auto(embs, 0, k=10, recall_target=0.1, ladder=("ivfpq",))
    )
    assert route == "exact"
