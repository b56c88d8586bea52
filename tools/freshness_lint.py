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

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main() -> int:
    import __spark_entry__ as e

    # the ONE green predicate + window size + record parse, shared with
    # the driver ordering (__spark_entry__._is_green /
    # _newest_green_rounds / EVIDENCE_WINDOW — r7 review wave 6: three
    # hand-copies could drift)
    window = e.EVIDENCE_WINDOW
    evidence = e._newest_green_rounds()
    order = list(e.queries())
    latest_round = e._latest_record_round()
    head, tail = order[:window], order[window:]

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

    print(f"registered: {len(order)}; window: {window}; "
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
