"""Synthesize an sf1-scale `documents` + `embeddings` pair (10x the
driver's sf0.1) for the above-bench scale spot-check (r7 verdict item
5). The driver's testdata is read-only and stops at sf0.1, so this
mirrors its measured distributions instead of regenerating it:

- documents: 50,000 rows, the SAME 31-word vocabulary extracted from
  the sf0.1 corpus, uniform 10-100 words per doc, sources src0..src19
  round-robin, langs at the sf0.1 mix (en-heavy), ~0.16% exact
  duplicate texts (sf0.1 has 8/5000).
- embeddings: 20,000 rows, 64-dim float32 uniform in [-0.4, 0.4]
  (the sf0.1 value range), labels i % 10.

Deterministic (seed 42). Output: ./testdata_sf1/{documents,embeddings}
.parquet — gitignored; regenerate with `python tools/make_sf1.py`.
Generation is plain numpy/pyarrow (no Spark session needed).
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(ROOT, "testdata_sf1")
N_DOCS = 50_000
N_VECS = 20_000


def main() -> None:
    rng = random.Random(42)
    os.makedirs(OUT, exist_ok=True)

    base = pq.read_table(os.path.join(SRC, "documents.parquet"))
    vocab = sorted(
        {w for t in base.column("text").to_pylist() if t for w in t.split(" ")}
    )
    langs = [r["lang"] for r in base.select(["lang"]).to_pylist()]
    lang_pool = langs or ["en"]

    doc_ids, texts, lang_col, src_col, n_chars = [], [], [], [], []
    for i in range(N_DOCS):
        words = [rng.choice(vocab) for _ in range(rng.randint(10, 100))]
        t = " ".join(words)
        doc_ids.append(i)
        texts.append(t)
        lang_col.append(rng.choice(lang_pool))
        src_col.append(f"src{i % 20}")
        n_chars.append(len(t))
    # exact duplicates at the sf0.1 rate (~0.16%): copy earlier texts
    for j in range(N_DOCS // 625):
        k = rng.randrange(N_DOCS - 1)
        texts[k + 1] = texts[k]
        n_chars[k + 1] = n_chars[k]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(lang_col, pa.string()),
                "source": pa.array(src_col, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        os.path.join(OUT, "documents.parquet"),
    )

    nprng = np.random.default_rng(42)
    vecs = nprng.uniform(-0.4, 0.4, size=(N_VECS, 64)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 10 for i in range(N_VECS)], pa.int32()),
            }
        ),
        os.path.join(OUT, "embeddings.parquet"),
    )
    print(f"wrote {OUT}: documents={N_DOCS}, embeddings={N_VECS}")


if __name__ == "__main__":
    sys.exit(main())
