"""The driver-evidence registration order is COMPUTED from the
CORRECTNESS record, not hand-curated (round-6 verdict item 2): no
family can be starved by a stale literal list."""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _newest_green() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        data = json.loads(f.read_text())
        rnd = int(f.stem.rsplit("r", 1)[-1])
        for n, row in data.items():
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                newest[n] = max(newest.get(n, 0), rnd)
    return newest


def test_order_is_permutation_of_registry():
    import __spark_entry__ as e

    names = list(e.queries())
    assert len(names) == len(set(names))
    ordered = e._evidence_order(names)
    assert sorted(ordered) == sorted(names)


def test_code_changed_heads_then_strays_then_stalest():
    import __spark_entry__ as e

    names = list(e.queries())  # already ordered — a fixpoint
    newest = _newest_green()
    k = len([n for n in e._CODE_CHANGED if n in names])
    assert names[:k] == [n for n in e._CODE_CHANGED if n in names]
    rest = names[k:]
    # strays (no green evidence) come before any evidenced name, and
    # evidenced names are sorted by newest green round ascending
    ranks = [newest.get(n, -1) for n in rest]
    assert ranks == sorted(ranks)


def test_ordering_reacts_to_evidence(tmp_path, monkeypatch):
    """Synthetic check that the policy is computed: a name whose newest
    green round is older sorts ahead; a name with no evidence sorts
    ahead of both; _CODE_CHANGED wins overall."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_CODE_CHANGED", ["c"])
    real_glob = Path.glob

    records = {
        "CORRECTNESS_r01.json": {
            "a": {"hash_match": True, "spark_rows": 1, "err": None},
            "c": {"hash_match": True, "spark_rows": 1, "err": None},
        },
        "CORRECTNESS_r02.json": {
            "b": {"hash_match": True, "spark_rows": 1, "err": None},
            # a red row is NOT evidence
            "d": {"hash_match": False, "spark_rows": 1, "err": None},
        },
    }
    for fname, content in records.items():
        (tmp_path / fname).write_text(json.dumps(content))

    def fake_glob(self, pattern):
        if pattern == "CORRECTNESS_r*.json":
            return real_glob(tmp_path, pattern)
        return real_glob(self, pattern)

    monkeypatch.setattr(Path, "glob", fake_glob)
    assert e._evidence_order(["a", "b", "c", "d"]) == ["c", "d", "a", "b"]

def test_code_changed_self_drains_after_recertification(tmp_path, monkeypatch):
    """r7 review wave 6: a _CODE_CHANGED name re-greened by the driver
    AT OR AFTER _CODE_CHANGED_ROUND has evidence for the new code and
    must stop pinning a head slot; one still certified only by an older
    round stays pinned."""
    import __spark_entry__ as e

    monkeypatch.setattr(e, "_CODE_CHANGED", ["x", "y"])
    monkeypatch.setattr(e, "_CODE_CHANGED_ROUND", 7)
    real_glob = Path.glob
    records = {
        # x: re-greened in r07 (post-change) -> drains from the head
        "CORRECTNESS_r07.json": {
            "x": {"hash_match": True, "spark_rows": 1, "err": None},
        },
        # y: only pre-change evidence -> stays pinned
        "CORRECTNESS_r06.json": {
            "y": {"hash_match": True, "spark_rows": 1, "err": None},
            "z": {"hash_match": True, "spark_rows": 1, "err": None},
        },
    }
    for fname, content in records.items():
        (tmp_path / fname).write_text(json.dumps(content))

    def fake_glob(self, pattern):
        if pattern == "CORRECTNESS_r*.json":
            return real_glob(tmp_path, pattern)
        return real_glob(self, pattern)

    monkeypatch.setattr(Path, "glob", fake_glob)
    # head: y (pinned). rest by newest-green asc: z (r06) then x (r07).
    assert e._evidence_order(["x", "y", "z"]) == ["y", "z", "x"]
