"""Interleaved same-host A/B bench: adjudicate whether a flagged
round-over-round bench delta is code or environment.

The per-round driver record confounds code changes with host drift
(thermal throttle, co-tenant load) and list position (in-run sustained
throttle: measured thirds of one r9 run at 0.87x/1.03x/1.34x). The
only measurement that cleanly attributes a delta to CODE is an
interleaved run on ONE host timeline: old, new, old, new, ... so any
drift hits both sides equally and min-of-N discards the slow samples.

Usage:
    python tools/ab_bench.py --old 1ce05cc \
        --queries weighted_jaccard,curate_increment [--iters 6]

Protocol (the r10 ROUND10_NOTES Section 17 methodology, now a tool):
  - `git worktree add` the old commit at /tmp/ab_old_<commit> (reused
    if present; removed only with --fresh).
  - Each iteration launches one subprocess per side (alternating
    old-first/new-first per iteration so session-order bias cancels
    too); the subprocess starts a session, runs the standard bench
    warmups, then times each query with the bench protocol (clean
    cache, best-of-2 back-to-back) and prints one JSON line.
  - The final per-query number is the MIN across iterations — the
    bench.py min-of-N noise model, with N = --iters.

Output: a table of old/new/ratio plus one JSON line for the round
notes. Ratio > ~1.2 on min-of-6 interleaved samples is
code-attributable; anything inside that band is host noise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

RUNNER = r"""
import json, os, sys, time

repo = sys.argv[1]
queries = sys.argv[2].split(",")
sf_dir = sys.argv[3]
sys.path.insert(0, repo)
os.chdir(repo)

import __spark_entry__ as e
from kafka_streams_spark import get_spark

spark = get_spark(app_name="ab-bench")
qs = e.queries()

def run(name):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

# bench.py warmup protocol: JVM/codegen/parquet-footer + Arrow pool.
# Partial scale dirs (testdata_sf1 carries only documents/embeddings —
# the scale panel's corpus tables) lack events.parquet, so the
# payments warmup falls back to the panel's own docs-only warmup
# query; the Arrow-pool warmup (repetition_stats) reads documents and
# works everywhere.
try:
    run("payments_balances")
except Exception:
    run("minhash_jaccard_est")
run("repetition_stats")

out = {}
for name in queries:
    out[name] = round(min(run(name), run(name)), 3)
print("ABRESULT " + json.dumps(out))
"""


def _side_run(repo: str, queries: list[str], sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    # keep the bench session shape: local[32] via the engine default
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, ",".join(queries), sf_dir],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise SystemExit(f"side run in {repo} produced no ABRESULT line")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="git ref of the OLD side")
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--fresh", action="store_true", help="recreate the old worktree")
    args = ap.parse_args()

    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", args.old],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    old_tree = f"/tmp/ab_old_{commit}"
    if args.fresh and os.path.isdir(old_tree):
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", old_tree], check=False)
    if not os.path.isdir(old_tree):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", old_tree, commit],
            check=True,
        )

    mins: dict[str, dict[str, float]] = {"old": {}, "new": {}}
    for it in range(args.iters):
        # alternate which side goes first so session-order bias cancels
        sides = [("old", old_tree), ("new", REPO)]
        if it % 2 == 1:
            sides.reverse()
        for label, tree in sides:
            res = _side_run(tree, queries, args.sf_dir)
            for q, t in res.items():
                cur = mins[label].get(q)
                mins[label][q] = t if cur is None else min(cur, t)
            sys.stderr.write(f"iter {it + 1}/{args.iters} {label}: {res}\n")

    rows = []
    for q in queries:
        o, n = mins["old"].get(q), mins["new"].get(q)
        ratio = round(n / o, 3) if o else None
        rows.append({"query": q, "old": o, "new": n, "ratio": ratio})
    width = max(len(q) for q in queries)
    print(f"{'query':<{width}}  {'old':>8}  {'new':>8}  {'ratio':>6}")
    for r in rows:
        print(f"{r['query']:<{width}}  {r['old']:>8.3f}  {r['new']:>8.3f}  {r['ratio']:>6.3f}")
    print(json.dumps({"ab": rows, "old_commit": commit, "iters": args.iters, "sf_dir": args.sf_dir}))


if __name__ == "__main__":
    main()
