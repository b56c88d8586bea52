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
