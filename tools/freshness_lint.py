"""Driver-evidence freshness lint.

The driver's correctness gate checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` each round, so a query registered beyond
that window gets no fresh driver row. Two failure classes this lint
catches before the driver runs:

1. a query with NO driver evidence in any prior round sitting outside
   the first-50 window (it would stay evidence-less forever), and
2. (warning only) queries whose newest evidence is ≥2 rounds stale and
   still outside the window.

Usage: python tools/freshness_lint.py   (exit 1 on class-1 violations)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WINDOW = 50


def main() -> int:
    import __spark_entry__ as e

    root = Path(__file__).resolve().parent.parent
    rounds: list[tuple[int, set[str]]] = []
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue
        rnd = int(f.stem.rsplit("r", 1)[-1])
        # Only rows that actually PASSED count as evidence — the ONE
        # green predicate, shared with the driver ordering
        # (__spark_entry__._is_green). A red row (hash_match False, or
        # a crash with spark_rows null) is the opposite of evidence —
        # a query whose only row is red must stay in the first-50
        # window until it goes green.
        good = {n for n, row in data.items() if e._is_green(row)}
        rounds.append((rnd, good))

    evidence: dict[str, int] = {}
    for rnd, names in rounds:
        for n in names:
            evidence[n] = max(evidence.get(n, 0), rnd)

    order = list(e.queries())
    latest_round = max((r for r, _ in rounds), default=0)
    head, tail = order[:WINDOW], order[WINDOW:]

    # Names declared in the next-round queue are registered behind an
    # already-full window ON PURPOSE (they take the head of the next
    # round's order) — queued, not starving. A queued name sitting
    # INSIDE the window is a stale declaration (the queue should have
    # been emptied when its names moved into the head) — failure.
    queue = list(
        getattr(e, "_NEXT_ROUND_QUEUE", getattr(e, "_ROUND5_QUEUE", []))
    )
    never = [q for q in tail if q not in evidence and q not in queue]
    queued = [q for q in tail if q not in evidence and q in queue]
    stale_queue = [q for q in head if q in queue]
    stale = [
        (q, evidence[q])
        for q in tail
        if q in evidence and evidence[q] <= latest_round - 2
    ]

    print(f"registered: {len(order)}; window: {WINDOW}; "
          f"prior evidence for {len(evidence)} names "
          f"(latest round r{latest_round:02d})")
    if never:
        print("FAIL — no driver evidence AND outside the first-50 window:")
        for q in never:
            print(f"  {q}  (move into the head of the registration order)")
    if stale:
        print("warn — evidence ≥2 rounds stale and outside the window:")
        for q, r in stale:
            print(f"  {q}  (newest green r{r:02d})")
    if stale_queue:
        print("FAIL — queued names already inside the window "
              "(empty the queue when its names move into the head):")
        for q in stale_queue:
            print(f"  {q}")
    if queued:
        print(f"queued for next round: {', '.join(queued)}")
    if not never and not stale and not stale_queue:
        print("ok — every unevidenced/stale query sits inside the window or the queue")
    return 1 if (never or stale_queue) else 0


if __name__ == "__main__":
    raise SystemExit(main())
