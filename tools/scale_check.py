"""Above-bench scale spot-check (r7 verdict item 5): run the named
contracts at two SF dirs in ISOLATED processes (one Spark session per
scale, warmed, min-of-two per query — the SCALING.md protocol) and
print the per-query ratio table.

Usage:
    python tools/make_sf1.py                      # once
    python tools/scale_check.py [q1 q2 ...]       # default: the >2s set

The embeddings/documents-only contracts work against testdata_sf1;
contracts touching other tables are rejected up front.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the 16 contracts over 2 s in BENCH_DETAIL (r7) — all touch only
# documents and/or embeddings, so the synthetic sf1 pair covers them
DEFAULT = [
    "dedup_clusters_lsh",
    "dedup_cluster_sizes",
    "curate_increment",
    "weighted_jaccard",
    "knn_ivfpq_vec0",
    "knn_recall_ivfpq_vec0",
    "minhash_jaccard_est",
    "pq_error_vec0",
    "dedup_incremental_fuzzy",
    "knn_recall_ivfpq_res_vec0",
    "knn_pq_rerank_vec0",
    "knn_text_vec0",
    "knn_ivfpq_res_vec0",
    "knn_pq_label_vec0",
    "emb_near_dup_lsh",
    "dedup_ngram_jaccard",
    # r8 scale forms — these must stay FLAT while their exact twins
    # above track output size
    "posting_pair_stats",
    "weighted_jaccard_capped",
    # r9 additions: the leakage-safe split composition (banding + CC +
    # join — must track dedup_clusters_lsh, its cost driver), the
    # blocked k-center (one corpus pass — near-flat), the per-group cap
    # (one exchange + group-limit — near-flat), and the cap-sizing
    # read-off (one profile pass)
    "leakage_safe_splits_docs",
    "leakage_safe_splits_incr",
    "emb_kcenter_scalable",
    "cap_per_source",
    "max_df_for_budget",
    # r10: the banded-join pricing audit — one band pass per side + the
    # occupancy-histogram read-off; must stay near-linear in corpus
    # (band rows), never in candidate pairs
    "stop_band_cap",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from kafka_streams_spark import get_spark
import __spark_entry__ as e
spark = get_spark(app_name="scale-check")
qs = e.queries()
sf = {sf!r}
def run(n):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    qs[n](spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run({warm!r})  # session warmup (JVM/codegen/Arrow workers)
out = {{}}
for n in {names!r}:
    out[n] = round(min(run(n), run(n)), 3)
print("SCALE_JSON:" + json.dumps(out))
"""


def _run_scale(sf_dir: str, names: list[str]) -> dict[str, float]:
    code = _CHILD.format(
        root=ROOT, sf=sf_dir, names=names, warm="minhash_jaccard_est"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=ROOT
    )
    for line in p.stdout.splitlines():
        if line.startswith("SCALE_JSON:"):
            return json.loads(line[len("SCALE_JSON:"):])
    raise SystemExit(
        f"scale run at {sf_dir} failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}"
    )


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf1 = os.path.join(ROOT, "testdata_sf1")
    if not os.path.isdir(sf1):
        raise SystemExit("run `python tools/make_sf1.py` first")
    lo = _run_scale("/root/testdata/sf0.1", names)
    hi = _run_scale(sf1, names)
    print(f"| query | sf0.1 s | sf1 s | ratio |")
    print(f"|---|---|---|---|")
    worst = 0.0
    for n in names:
        r = hi[n] / max(lo[n], 1e-9)
        worst = max(worst, r)
        print(f"| {n} | {lo[n]:.2f} | {hi[n]:.2f} | {r:.2f} |")
    print(f"worst ratio for 10x data: {worst:.2f}")


if __name__ == "__main__":
    main()
