"""Capture ``explain("formatted")`` for contract queries — the
plans/r14/<query>_{before,after}.txt evidence files.

Usage: python tools/explain_query.py <out_suffix> <query> [query ...]
           [--sf DIR] [--outdir plans/r14]

Writes ``<outdir>/<query>_<out_suffix>.txt`` with TWO sections per
query: the as-executed plan (localCheckpoint subtrees appear as opaque
ExistingRDD scans) and the SPARK_GRAFT_NO_CKPT=1 logical shape (the
full operator tree PLANS.md audits). Both matter: the first is what
runs, the second is what it runs over.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r14"))
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from kafka_streams_spark import get_spark

    spark = get_spark(app_name="explain-query")

    def formatted(name: str) -> str:
        # import inside: NO_CKPT toggling needs a fresh queries() read
        import importlib

        import __spark_entry__ as e

        importlib.reload(e)
        df = e.queries()[name](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for name in args.queries:
        out = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        os.environ.pop("SPARK_GRAFT_NO_CKPT", None)
        executed = formatted(name)
        os.environ["SPARK_GRAFT_NO_CKPT"] = "1"
        logical = formatted(name)
        os.environ.pop("SPARK_GRAFT_NO_CKPT", None)
        with open(out, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') at {args.sf} "
                f"({args.suffix})\n\n"
                "## As executed (localCheckpoint subtrees opaque)\n\n"
            )
            fh.write(executed)
            fh.write(
                "\n## SPARK_GRAFT_NO_CKPT=1 (full logical shape, "
                "checkpoints disabled)\n\n"
            )
            fh.write(logical)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
