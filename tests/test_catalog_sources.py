"""Catalog S1-S4, line-corpus source S5, search-log range reads (§2.9)."""

import os

import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.catalog import create_index, destroy_index, get_all_indexes
from konlsearch_ray.pipelines.logagg import SearchLog, log_cursors, read_log_range
from konlsearch_ray.query import IndexReader
from konlsearch_ray.sources import read_line_corpus


def test_catalog_lifecycle(ray_session, tmp_path):
    root = str(tmp_path / "db")
    assert get_all_indexes(root) == []
    p = create_index(root, "alpha")
    # Registered only once a build starts (index_meta.json exists).
    assert get_all_indexes(root) == []
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["c" * 40],
        "lang": ["text"], "content": pa.array(["hello world"], pa.large_string()),
    })
    src = str(tmp_path / "d.parquet")
    pq.write_table(docs, src)
    build_index(src, p, IndexConfig(shard_size=16))
    create_index(root, "beta")  # empty, never built
    assert get_all_indexes(root) == ["alpha"]
    with pytest.raises(ValueError):
        create_index(root, "../evil")
    assert destroy_index(root, "alpha") is True
    assert get_all_indexes(root) == []
    assert destroy_index(root, "alpha") is False


def test_line_corpus_source(ray_session, tmp_path):
    # kowiki.py semantics: line per doc, _ → space (reference kowiki.py:19-33).
    lines = ["mobile_suit gundam", "magical_girl story", "plain title"]
    src = str(tmp_path / "titles.txt")
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    ds = read_line_corpus(src)
    rows = sorted(ds.to_pandas()["content"])
    assert rows == ["magical girl story", "mobile suit gundam", "plain title"]

    # End-to-end: build + search over the line corpus; doc IDs = file order.
    idx = str(tmp_path / "i")
    build_index(ds, idx, IndexConfig(shard_size=16))
    r = IndexReader(idx)
    assert r.search(["gundam"], "OR") == [1]
    assert r.search(["magical", "girl"], "AND") == [2]
    assert r.n_docs == 3


def test_log_range_reads(tmp_path):
    log_dir = str(tmp_path / "log")
    clock = [100.0]
    log = SearchLog(log_dir, clock=lambda: clock[0])
    for term, t in [("a", 100), ("b", 100), ("c", 101), ("d", 103)]:
        clock[0] = float(t)
        log.log(term, 1)
    log.flush()
    # Time range [100, 103) — half-open.
    t = read_log_range(log_dir, ts_start=100, ts_end=103)
    assert t["term"].to_pylist() == ["a", "b", "c"]
    # Seq-cursor range: from (100, 1) up to (103, 0) exclusive.
    t = read_log_range(log_dir, seq_start=(100, 1), seq_end=(103, 0))
    assert t["term"].to_pylist() == ["b", "c"]
    assert log_cursors(log_dir) == ((100, 0), (103, 0))
    assert log_cursors(str(tmp_path / "nope")) is None


def test_jsonl_and_csv_corpus(ray_session, tmp_path):
    """JSONL/CSV sources normalize to the build schema and index
    end-to-end (id_col mode)."""
    import json

    from konlsearch_ray.build import IndexConfig, build_index
    from konlsearch_ray.query import IndexReader
    from konlsearch_ray.sources import read_csv_corpus, read_jsonl_corpus

    rows = [{"id": i + 1, "body": f"jsonl doc number {w}", "meta": "m"}
            for i, w in enumerate(["alpha", "beta", "gamma"])]
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl_corpus(str(jl), content_col="body", id_col="id",
                           keep_cols=["meta"])
    assert set(ds.schema().names) == {"content", "doc_id", "meta"}
    idx = str(tmp_path / "ij")
    build_index(ds, idx, IndexConfig(
        id_col="doc_id", dedup=False, sort_keys=[], shard_size=2))
    r = IndexReader(idx)
    assert r.search(["jsonl"], "OR") == [1, 2, 3]
    assert r.search(["beta"], "OR") == [2]

    cs = tmp_path / "docs.csv"
    cs.write_text("id,body\n1,csv doc alpha\n2,csv doc beta\n")
    ds2 = read_csv_corpus(str(cs), content_col="body", id_col="id")
    idx2 = str(tmp_path / "ic")
    build_index(ds2, idx2, IndexConfig(
        id_col="doc_id", dedup=False, sort_keys=[], shard_size=2))
    assert IndexReader(idx2).search(["csv", "beta"], "AND") == [2]


def test_gzip_jsonl_corpus(ray_session, tmp_path):
    """Compressed JSONL (the common web-scale interchange layout —
    one .jsonl.gz per shard) reads through the same corpus path: Ray /
    Arrow auto-detect gzip from the extension, so read_jsonl_corpus
    needs no flag; indexing works end to end."""
    import gzip
    import json

    from konlsearch_ray.build import IndexConfig, build_index
    from konlsearch_ray.query import IndexReader
    from konlsearch_ray.sources import read_jsonl_corpus

    gz = tmp_path / "docs.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        for i, w in enumerate(["alpha", "beta", "gamma"]):
            json.dump({"id": i + 1, "body": f"gz doc number {w}"}, f)
            f.write("\n")
    ds = read_jsonl_corpus(str(gz), content_col="body", id_col="id")
    assert set(ds.schema().names) == {"content", "doc_id"}
    idx = str(tmp_path / "ig")
    build_index(ds, idx, IndexConfig(
        id_col="doc_id", dedup=False, sort_keys=[], shard_size=2))
    r = IndexReader(idx)
    assert r.search(["gz"], "OR") == [1, 2, 3]
    assert r.search(["gamma"], "OR") == [3]


def test_docstore_scan_streaming(ray_session, tmp_path):
    """DocStore.scan: the streaming (Dataset) whole-corpus path, tombstone
    filtered, column-pruned."""
    from konlsearch_ray.build import IndexConfig, build_index
    from konlsearch_ray.corpus import write_corpus
    from konlsearch_ray.docstore import DocStore
    from konlsearch_ray.tombstone import delete_docs

    corpus = write_corpus(str(tmp_path / "c2"), 150, seed=8)
    idx = str(tmp_path / "i2")
    stats = build_index(corpus, idx, IndexConfig(shard_size=64))
    delete_docs(idx, [3, 4])
    ds = DocStore(idx).scan(columns=["content_sha256"])
    out = ds.to_pandas()
    assert len(out) == stats["N"] - 2
    assert set(out.columns) == {"doc_id", "content_sha256"}
    assert not {3, 4} & set(out["doc_id"])


def test_cli_roundtrip(tmp_path):
    """python -m konlsearch_ray build/search/stats in a subprocess."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "cli_docs.parquet")
    pq.write_table(pa.table({
        "repo": ["r"] * 3, "path": ["a", "b", "c"], "commit": ["x" * 40] * 3,
        "lang": ["python"] * 3,
        "content": pa.array(["cli alpha doc", "cli beta doc", "gamma only"],
                            pa.large_string()),
    }), src)
    idx = str(tmp_path / "cli_idx")
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "konlsearch_ray", "--num-cpus", "2",
         "build", src, idx], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["N"] == 3
    r = subprocess.run(
        [sys.executable, "-m", "konlsearch_ray", "search", idx, "AND",
         "cli", "beta"], capture_output=True, text=True, env=env)
    assert r.returncode == 0 and r.stdout.split() == ["2"], r.stderr[-500:]
    r = subprocess.run(
        [sys.executable, "-m", "konlsearch_ray", "search", idx, "BM25",
         "gamma"], capture_output=True, text=True, env=env)
    assert r.returncode == 0 and r.stdout.strip().startswith("3\t")
