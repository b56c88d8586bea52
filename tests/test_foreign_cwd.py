"""Launch-directory independence: a driver that reaches the repo only
via a sys.path insert (the harness pattern — cwd somewhere else
entirely) must still run Arrow stages, because the engine registers
its closure-defining modules for pickle-by-value. Without that, Python
workers die with ModuleNotFoundError at the first mapInPandas stage."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import kafka_streams_spark  # registers by-value pickling
from kafka_streams_spark.operators.similarity import embedding_gram
df = spark.createDataFrame(
    [(1, [1.0, 2.0]), (2, [0.5, -1.5])], "vec_id long, embedding array<double>"
)
rows = embedding_gram(df, scale=10**3).collect()
assert len(rows) == 3, rows
# a round-6 Arrow closure (captures locals: merge list, column names);
# no dict/set literals here — this script goes through str.format()
from kafka_streams_spark.operators.tokenizer import bpe_apply
docs = spark.createDataFrame([(1, "low lower"), (2, "")], "doc_id long, text string")
enc = dict(
    (r["doc_id"], r["n_pieces"])
    for r in bpe_apply(docs, [("l", "o"), ("lo", "w")]).collect()
)
assert enc[1] > 0 and enc[2] == 0, enc
print("FOREIGN_CWD_OK")
"""


def test_arrow_stage_runs_with_foreign_cwd(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the repo must NOT arrive via env either
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FOREIGN_CWD_OK" in proc.stdout
