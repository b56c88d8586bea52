"""The persisted-MinHash-index cache key (r12 ADVICE hardening): the
indexed fuzzy gate reuses an index under /tmp keyed by corpus identity.
Stale reuse silently readmits duplicates on uncached runs, so the key
must change whenever (a) the corpus PATH differs, (b) the corpus is
regenerated IN PLACE at the same path (content fingerprint: per-file
size + mtime_ns), or (c) the signature-derivation code version bumps.
Pure Python — no Spark session."""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "spark_entry_for_cache_key_test",
    Path(__file__).resolve().parent.parent / "__spark_entry__.py",
)
entry = importlib.util.module_from_spec(_SPEC)
sys.modules[_SPEC.name] = entry
_SPEC.loader.exec_module(entry)

from conftest import SF_DIR as SF  # noqa: E402  (honors SPARK_GRAFT_SF_DIR_TEST)


def _copy_corpus(dst: Path) -> Path:
    dst.mkdir(parents=True, exist_ok=True)
    src = os.path.join(SF, "documents.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst / "documents.parquet")
    else:
        shutil.copy(src, dst / "documents.parquet")
    return dst


def test_distinct_paths_get_distinct_keys(tmp_path):
    a = _copy_corpus(tmp_path / "a" / "sf-fuzz-0")
    b = _copy_corpus(tmp_path / "b" / "sf-fuzz-0")
    # same BASENAME (the differential-fuzz layout) — keys must differ
    assert entry._minhash_index_cache_dir(str(a)) != entry._minhash_index_cache_dir(str(b))


def test_in_place_regeneration_changes_key(tmp_path):
    c = _copy_corpus(tmp_path / "sf-regen")
    before = entry._minhash_index_cache_dir(str(c))
    # regenerate "in place": same path, new file mtime
    target = c / "documents.parquet"
    victim = (
        target
        if target.is_file()
        else next(p for p in sorted(target.rglob("*")) if p.is_file())
    )
    os.utime(victim, ns=(12345, 67890))
    after = entry._minhash_index_cache_dir(str(c))
    assert before != after


def test_key_is_stable_without_changes(tmp_path):
    c = _copy_corpus(tmp_path / "sf-stable")
    assert entry._minhash_index_cache_dir(
        str(c)
    ) == entry._minhash_index_cache_dir(str(c))


def test_sig_version_is_folded_in(tmp_path, monkeypatch):
    from kafka_streams_spark.operators import dedup

    c = _copy_corpus(tmp_path / "sf-sigv")
    before = entry._minhash_index_cache_dir(str(c))
    monkeypatch.setattr(dedup, "MINHASH_SIG_VERSION", dedup.MINHASH_SIG_VERSION + 1)
    after = entry._minhash_index_cache_dir(str(c))
    assert before != after
