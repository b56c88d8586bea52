"""Changelog compaction: balances must be identical before/after folding,
across stream restarts, and when new deltas arrive on top of a base."""

from __future__ import annotations

import glob
import os

from kafka_streams_spark.streaming import BalanceView, run_payment_stream
from kafka_streams_spark.streaming.router import compact_balances
from tests.test_streaming import GOLDEN, write_events


def _payment(pid: str, amount: int, account: str) -> dict:
    return {
        "paymentId": pid, "amount": amount, "currency": "GBP",
        "fromAccount": account, "toAccount": "DEF",
        "rails": "BANK_RAILS_FOO",
    }


def test_compaction_preserves_balances(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_events(src, "b1.json", GOLDEN)

    q = run_payment_stream(spark, src, out, ckpt)
    try:
        q.processAllAvailable()
        write_events(src, "b2.json", [_payment("p6", 40, "ABC")])
        q.processAllAvailable()
        write_events(src, "b3.json", [_payment("p7", 5, "XYZ")])
        q.processAllAvailable()

        view = BalanceView(spark, out)
        before = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}
        assert before == {"ABC": 250, "XYZ": 805}

        hwm = compact_balances(spark, out)
        assert hwm is not None
        after = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}
        assert after == before
        # folded partitions gone, newest kept
        remaining = glob.glob(os.path.join(out, "balance_delta", "ingest_batch=*"))
        assert len(remaining) == 1
        assert view.get_balance("ABC") == 250  # point lookup across base+log
        assert view.get_balance("NOPE") is None

        # new deltas on top of the base
        write_events(src, "b4.json", [_payment("p8", 10, "ABC")])
        q.processAllAvailable()
        assert view.get_balance("ABC") == 260

        # second compaction folds base + newly closed partitions
        compact_balances(spark, out)
        assert view.get_balance("ABC") == 260
    finally:
        q.stop()

def test_crashed_compaction_does_not_double_count(spark, tmp_path):
    """Crash window: base written, folded delta partitions NOT yet
    deleted. The reader must filter deltas to ingest_batch > hwm, or
    every folded amount counts twice (base + still-present delta)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_events(src, "b1.json", GOLDEN)

    q = run_payment_stream(spark, src, out, ckpt)
    try:
        write_events(src, "b2.json", [_payment("p6", 40, "ABC")])
        q.processAllAvailable()
        write_events(src, "b3.json", [_payment("p7", 5, "XYZ")])
        q.processAllAvailable()
    finally:
        q.stop()

    view = BalanceView(spark, out)
    before = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}

    # Simulate the crash: run the fold, then restore the folded delta
    # partitions as if cleanup never happened.
    import shutil

    delta_dir = os.path.join(out, "balance_delta")
    backup = str(tmp_path / "delta_backup")
    shutil.copytree(delta_dir, backup)
    hwm = compact_balances(spark, out)
    assert hwm is not None
    shutil.rmtree(delta_dir)
    shutil.copytree(backup, delta_dir)

    after = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}
    assert after == before  # folded deltas pruned, not double-counted
    assert view.get_balance("ABC") == before["ABC"]

def test_recompaction_after_crash_does_not_double_count(spark, tmp_path):
    """r7 review wave 4: the COMPACTOR itself must apply the reader's
    `ingest_batch > old_hwm` rule. After a crashed compaction (base
    written, folded deltas still on disk), a re-run — with or without
    newly closed batches — previously unioned the leftover deltas with
    the base that already contains them: permanent double count."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_events(src, "b1.json", GOLDEN)

    q = run_payment_stream(spark, src, out, ckpt)
    try:
        write_events(src, "b2.json", [_payment("p6", 40, "ABC")])
        q.processAllAvailable()
        write_events(src, "b3.json", [_payment("p7", 5, "XYZ")])
        q.processAllAvailable()
    finally:
        q.stop()

    view = BalanceView(spark, out)
    before = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}

    import shutil

    delta_dir = os.path.join(out, "balance_delta")
    backup = str(tmp_path / "delta_backup")
    shutil.copytree(delta_dir, backup)
    hwm1 = compact_balances(spark, out)
    assert hwm1 is not None
    shutil.rmtree(delta_dir)
    shutil.copytree(backup, delta_dir)  # the crash: cleanup never ran

    # re-run with NO newly closed batch: must only finish the cleanup
    hwm2 = compact_balances(spark, out)
    assert hwm2 == hwm1
    mid = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}
    assert mid == before

    # a new batch closes the previous one; the re-fold must not re-add
    # the already-based amounts
    q = run_payment_stream(spark, src, out, ckpt)
    try:
        write_events(src, "b4.json", [_payment("p8", 7, "ABC")])
        q.processAllAvailable()
    finally:
        q.stop()
    hwm3 = compact_balances(spark, out)
    assert hwm3 is not None and hwm3 > hwm1
    after = {r["fromAccount"]: r["balance"] for r in view.balances().collect()}
    expected = dict(before)
    expected["ABC"] = before["ABC"] + 7
    assert after == expected
