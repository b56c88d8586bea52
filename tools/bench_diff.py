"""Per-query bench regression gate: diff two bench JSON lines
(`bench.py` output / driver `BENCH_r{N}.json`) and flag regressions.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Exit code 1 if any query regressed more than the threshold (new queries
and removed queries are reported but never fail the gate).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    # driver BENCH_r{N}.json wraps bench.py's line under "parsed".
    # A present-but-null "parsed" means the driver's capture truncated
    # the bench line — diffing {} would print an empty comparison with
    # exit 0, hiding exactly the failure this gate exists to catch.
    if "parsed" in data:
        if data["parsed"] is None:
            raise SystemExit(
                f"{path}: 'parsed' is null (truncated bench capture) — "
                "cannot diff this round's record"
            )
        data = data["parsed"]
    # r5+ compact headline: stdout carries only the top-5 slowest; the
    # full per-query map lives in the sibling BENCH_DETAIL.json the
    # bench run wrote. Follow the pointer when the file is still there
    # (same-round diffs); otherwise diff the compact subset.
    if data.get("detail"):
        import os

        cand = os.path.join(os.path.dirname(os.path.abspath(path)), data["detail"])
        if os.path.exists(cand):
            with open(cand) as f:
                detail = json.load(f)
            if detail.get("value") == data.get("value"):
                return detail
    return data


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osamp, nsamp = old.get("samples", {}), new.get("samples", {})

    regressed: list[tuple[str, float, float, float]] = []
    improved: list[tuple[str, float, float, float]] = []
    print(f"{'query':34s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}")
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"{name:34s} {'-':>8s} {nq[name]:8.3f}     new")
            continue
        if name not in nq:
            print(f"{name:34s} {oq[name]:8.3f} {'-':>8s} removed")
            continue
        # floor the denominator: sub-50ms timings are noise-dominated
        ratio = nq[name] / max(oq[name], 0.05)
        flag = ""
        if ratio > args.threshold:
            regressed.append((name, oq[name], nq[name], ratio))
            flag = "  << REGRESSION"
        elif ratio < 1 / args.threshold:
            improved.append((name, oq[name], nq[name], ratio))
            flag = "  improved"
        # min-of-N protocol changed for this query (ADVICE r4): the
        # delta conflates sample count with performance — annotate.
        if name in osamp and name in nsamp and osamp[name] != nsamp[name]:
            flag += f"  [samples {osamp[name]}->{nsamp[name]}]"
        print(f"{name:34s} {oq[name]:8.3f} {nq[name]:8.3f} {ratio:6.2f}x{flag}")

    print(
        f"\ntotal: old={old.get('value')}s new={new.get('value')}s  "
        f"regressed>{args.threshold}x: {len(regressed)}  improved: {len(improved)}"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
