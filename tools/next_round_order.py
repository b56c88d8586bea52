"""Report the first-WINDOW head of the driver-evidence registration
order. Since round 7 the order is COMPUTED inside
``__spark_entry__._evidence_order`` (code-changed head, then strays,
then stalest newest-green first) — this tool just prints what the
driver will see, with the evidence vintage per name. Pure report.

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
    changed = [q for q in getattr(e, "_CODE_CHANGED", []) if q in order]
    head = order[:WINDOW]
    print(f"# evidence-window head ({len(head)} of window {WINDOW}, computed):")
    print(f"#   code-changed {len(changed)} | "
          f"strays {sum(1 for q in head if q not in evidence and q not in changed)} | "
          f"stalest refresh fills the rest")
    for q in head:
        tag = (
            "CODE CHANGED" if q in changed
            else "NO EVIDENCE" if q not in evidence
            else f"r{evidence[q]:02d}"
        )
        print(f'    "{q}",  # {tag}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
