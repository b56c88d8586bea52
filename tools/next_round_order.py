"""Print the recommended evidence-priority head for the NEXT round's
registration order (`__spark_entry__._NEEDS_DRIVER_ROW` + the stale
block): the declared next-round queue first, then red/never-evidenced
strays, then queries by stalest evidence, up to the 50-row window.

Run at the START of a round, after the driver wrote the new
CORRECTNESS_r{N}.json, and paste the result into __spark_entry__ (then
empty _NEXT_ROUND_QUEUE). Pure report — changes nothing.

Usage: python tools/next_round_order.py
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
    evidence: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue
        rnd = int(f.stem.rsplit("r", 1)[-1])
        for n, row in data.items():
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                evidence[n] = max(evidence.get(n, 0), rnd)

    order = list(e.queries())
    queue = [q for q in getattr(e, "_NEXT_ROUND_QUEUE", getattr(e, "_ROUND5_QUEUE", [])) if q in order]
    strays = [q for q in order if q not in evidence and q not in queue]
    refresh = sorted(
        (q for q in order if q in evidence and q not in queue),
        key=lambda q: (evidence[q], order.index(q)),
    )
    head = (queue + strays + refresh)[:WINDOW]
    print(f"# next-round head ({len(head)} of window {WINDOW}):")
    print(f"#   queue {len(queue)} | strays {len(strays)} | "
          f"stalest refresh fills the rest")
    for q in head:
        tag = "queued" if q in queue else (
            "NO EVIDENCE" if q in strays else f"r{evidence[q]:02d}"
        )
        print(f'    "{q}",  # {tag}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
