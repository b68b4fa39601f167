"""Checkpoint/resume + determinism (FIXTURES.md F5, BASELINE.md gates).

- Resume: delete a subset of shard manifests+segments after a full build,
  re-run → only missing shards rebuilt, byte-identical to an untouched
  build.
- Determinism: two independent builds with different batch sizes (hence
  different block/task layouts and arrival orders) → byte-identical
  segments, doclens, and stats.
"""

import hashlib
import json
import os

import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.corpus import write_corpus

N_DOCS = 400
SHARD_SIZE = 64


def _tree_hashes(index_dir: str) -> dict[str, str]:
    out = {}
    for sub in ("segments", "doclens"):
        d = os.path.join(index_dir, sub)
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                with open(os.path.join(d, name), "rb") as f:
                    out[f"{sub}/{name}"] = hashlib.sha256(f.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_corpus")
    return write_corpus(str(root / "c"), N_DOCS, seed=42)


def test_determinism_across_batch_layouts(ray_session, corpus, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    sa = build_index(corpus, a, IndexConfig(shard_size=SHARD_SIZE,
                                            tokenize_batch_size=37))
    sb = build_index(corpus, b, IndexConfig(shard_size=SHARD_SIZE,
                                            tokenize_batch_size=250))
    sa.pop("phase_sec", None); sb.pop("phase_sec", None)
    assert sa == sb
    ha, hb = _tree_hashes(a), _tree_hashes(b)
    assert ha == hb  # byte-identical segments + doclens


def test_resume_rebuilds_only_missing_shards(ray_session, corpus, tmp_path):
    full = str(tmp_path / "full")
    cfg = IndexConfig(shard_size=SHARD_SIZE, tokenize_batch_size=100)
    build_index(corpus, full, cfg)
    reference_hashes = _tree_hashes(full)
    shards = sorted(
        int(n.split("-")[1].split(".")[0])
        for n in os.listdir(os.path.join(full, "manifests")))
    assert len(shards) >= 4

    # Simulate a mid-build kill: drop the last 2 shards' outputs.
    killed = shards[-2:]
    surviving_mtimes = {}
    for s in shards[:-2]:
        p = os.path.join(full, "segments", f"shard-{s:06d}.parquet")
        surviving_mtimes[s] = os.path.getmtime(p)
    for s in killed:
        os.remove(os.path.join(full, "manifests", f"shard-{s:06d}.json"))
        os.remove(os.path.join(full, "segments", f"shard-{s:06d}.parquet"))
        os.remove(os.path.join(full, "doclens", f"shard-{s:06d}.parquet"))

    stats = build_index(corpus, full, cfg)
    assert _tree_hashes(full) == reference_hashes  # byte-identical again
    # Completed shards were skipped (files untouched).
    for s, mt in surviving_mtimes.items():
        p = os.path.join(full, "segments", f"shard-{s:06d}.parquet")
        assert os.path.getmtime(p) == mt
    with open(os.path.join(full, "stats.json")) as f:
        assert json.load(f)["N"] == stats["N"]


def test_manifest_lineage_counters(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "m")
    stats = build_index(corpus, idx, IndexConfig(shard_size=SHARD_SIZE))
    total = 0
    for name in sorted(os.listdir(os.path.join(idx, "manifests"))):
        with open(os.path.join(idx, "manifests", name)) as f:
            m = json.load(f)
        assert {"shard", "n_docs", "n_terms", "total_tokens",
                "segment_sha256", "doclens_sha256", "version"} <= set(m)
        # Recorded sha matches the file on disk.
        p = os.path.join(idx, "segments", f"shard-{m['shard']:06d}.parquet")
        with open(p, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == m["segment_sha256"]
        total += m["n_docs"]
    assert total == stats["N"]


def test_shuffle_scale_docs_path(ray_session, corpus, tmp_path, monkeypatch):
    """The huge-scale docs path (shuffle dedup pre-pass + sort + ids) must
    produce an identical index to the driver-rank path."""
    import konlsearch_ray.build as B

    a = str(tmp_path / "small")
    build_index(corpus, a, IndexConfig(shard_size=SHARD_SIZE))
    monkeypatch.setattr(B, "DEDUP_DRIVER_MAX_ROWS", 0)
    b = str(tmp_path / "big")
    build_index(corpus, b, IndexConfig(shard_size=SHARD_SIZE))
    import os

    import pyarrow.parquet as pq

    for sub in ("segments", "doclens"):
        fa = sorted(os.listdir(os.path.join(a, sub)))
        fb = sorted(os.listdir(os.path.join(b, sub)))
        assert fa == fb
        for n in fa:
            ta = pq.read_table(os.path.join(a, sub, n))
            tb = pq.read_table(os.path.join(b, sub, n))
            assert ta.equals(tb), (sub, n)


def test_docs_phase_restart_does_not_duplicate(ray_session, corpus, tmp_path):
    """A run that dies after writing docs/ but before _DOCS_DONE must not
    double-ingest on re-run (stale docs/ is cleared)."""
    idx = str(tmp_path / "dup")
    cfg = IndexConfig(shard_size=SHARD_SIZE)
    stats = build_index(corpus, idx, cfg)
    os.remove(os.path.join(idx, "_DOCS_DONE"))
    # Invalidate postings so the rebuild actually re-runs both phases.
    import shutil
    for sub in ("manifests", "segments", "doclens"):
        shutil.rmtree(os.path.join(idx, sub))
    stats2 = build_index(corpus, idx, cfg)
    assert stats2["N"] == stats["N"]
    assert stats2["total_tokens"] == stats["total_tokens"]
