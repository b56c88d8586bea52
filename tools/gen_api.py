"""Generate API.md: every public operator/function in the engine with
its signature and docstring summary — the switch-from-the-reference
surface in one page.

Usage: python tools/gen_api.py
"""

from __future__ import annotations

import importlib
import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODULES = [
    "kafka_streams_spark.session",
    "kafka_streams_spark.schema",
    "kafka_streams_spark.dsl",
    "kafka_streams_spark.catalog",
    "kafka_streams_spark.operators.payments",
    "kafka_streams_spark.operators.analytics",
    "kafka_streams_spark.operators.dedup",
    "kafka_streams_spark.operators.similarity",
    "kafka_streams_spark.operators.text",
    "kafka_streams_spark.operators.sampling",
    "kafka_streams_spark.operators.pipelines",
    "kafka_streams_spark.operators.multimodal",
    "kafka_streams_spark.operators.tokenizer",
    "kafka_streams_spark.operators.asof",
    "kafka_streams_spark.operators.rangejoin",
    "kafka_streams_spark.operators.profiling",
    "kafka_streams_spark.sources.testdata",
    "kafka_streams_spark.sources.bucketed",
    "kafka_streams_spark.sources.branched",
    "kafka_streams_spark.sources.kafka",
    "kafka_streams_spark.sources.jsonl",
    "kafka_streams_spark.streaming.router",
    "kafka_streams_spark.streaming.stateful",
    "kafka_streams_spark.streaming.ingest",
    "kafka_streams_spark.streaming.sketch_stream",
    "kafka_streams_spark.streaming.splits_stream",
    "kafka_streams_spark.functions.numeric",
    "kafka_streams_spark.functions.vectors",
    "kafka_streams_spark.functions.partitioning",
    "kafka_streams_spark.plans.audit",
]

OUT = Path(__file__).resolve().parent.parent / "API.md"


def first_line(doc: str | None) -> str:
    if not doc:
        return "(undocumented)"
    # first sentence-ish: up to the first blank line, joined
    para = doc.strip().split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def main() -> None:
    lines = [
        "# API index (auto-generated — `python tools/gen_api.py`)",
        "",
        "Every public function/class per module, with its signature and",
        "summary. Scale notes, determinism rules, and oracle contracts",
        "live in each docstring (and COVERAGE.md / ARCHITECTURE.md).",
        "",
    ]
    n = 0
    for mod_name in MODULES:
        mod = importlib.import_module(mod_name)
        members = [
            (name, obj)
            for name, obj in vars(mod).items()
            if not name.startswith("_")
            and (inspect.isfunction(obj) or inspect.isclass(obj))
            and getattr(obj, "__module__", None) == mod_name
        ]
        if not members:
            continue
        lines.append(f"## `{mod_name}`")
        lines.append("")
        for name, obj in members:
            n += 1
            if inspect.isclass(obj):
                lines.append(f"- **class `{name}`** — {first_line(obj.__doc__)}")
                for mname, m in vars(obj).items():
                    if not mname.startswith("_") and inspect.isfunction(m):
                        try:
                            sig = str(inspect.signature(m))
                        except (ValueError, TypeError):
                            sig = "(...)"
                        lines.append(
                            f"  - `.{mname}{sig}` — {first_line(m.__doc__)}"
                        )
            else:
                try:
                    sig = str(inspect.signature(obj))
                except (ValueError, TypeError):
                    sig = "(...)"
                lines.append(f"- `{name}{sig}` — {first_line(obj.__doc__)}")
        lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({n} members)")


if __name__ == "__main__":
    raise SystemExit(main())
