"""Run every local gate in order and print one verdict line per gate:

    freshness lint -> fuzz-ring lint -> oracle sweep (sf0.01) ->
    pytest -> bench (sf0.1)

Usage: python tools/run_all_gates.py [--skip-bench] [--skip-tests]
Exit code: 0 iff every gate that ran passed.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(name: str, cmd: list[str]) -> bool:
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, check=False
    )
    dt = time.perf_counter() - t0
    ok = proc.returncode == 0
    # show BOTH streams on failure: a gate that printed progress to
    # stdout and crashed with the traceback on stderr previously hid
    # the exception entirely (r7 review wave 6)
    combined = "\n".join(
        part.strip() for part in (proc.stdout, proc.stderr) if part and part.strip()
    )
    tail = combined.splitlines()
    last = tail[-1] if tail else ""
    print(f"[{'PASS' if ok else 'FAIL'}] {name:14s} {dt:7.1f}s  {last}")
    if not ok:
        print("\n".join(tail[-40:]))
    return ok


def main() -> int:
    args = set(sys.argv[1:])
    ok = run("freshness-lint", [sys.executable, "tools/freshness_lint.py"])
    ok &= run("fuzz-ring-lint", [sys.executable, "tools/fuzz_ring_lint.py"])
    ok &= run("oracle-sweep", [sys.executable, "tools/check_oracle.py"])
    if "--skip-tests" not in args:
        ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    if "--skip-bench" not in args:
        ok &= run("bench", [sys.executable, "bench.py"])
    print("ALL GATES PASS" if ok else "GATE FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
