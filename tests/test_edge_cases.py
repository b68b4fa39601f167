"""Edge cases: empty corpus, zero-token docs, empty/absent queries."""

import pyarrow as pa
import pyarrow.parquet as pq

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.query import IndexReader


def _write(tmp_path, contents):
    t = pa.table({
        "repo": pa.array(["r"] * len(contents)),
        "path": pa.array([f"p{i}" for i in range(len(contents))]),
        "commit": pa.array(["c" * 40] * len(contents)),
        "lang": pa.array(["text"] * len(contents)),
        "content": pa.array(contents, pa.large_string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    return src


def test_empty_corpus(ray_session, tmp_path):
    src = _write(tmp_path, [])
    idx = str(tmp_path / "i")
    stats = build_index(src, idx, IndexConfig(shard_size=8))
    assert stats["N"] == 0 and stats["vocab"] == 0
    r = IndexReader(idx)
    assert r.search(["anything"], "OR") == []
    assert r.bm25_topk(["anything"], 5) == []


def test_zero_token_docs_counted(ray_session, tmp_path):
    # Docs whose content sanitizes/filters to nothing still get IDs and
    # count toward N (reference indexes them too — empty token set).
    src = _write(tmp_path, ["@@@ !!! 123 456", "real tokens here", ""])
    idx = str(tmp_path / "i")
    stats = build_index(src, idx, IndexConfig(shard_size=8, dedup=False))
    assert stats["N"] == 3
    r = IndexReader(idx)
    assert r.n_docs == 3
    assert r.search(["real"], "OR") == [2]  # p0 < p1 < p2 canonical order
    # BM25 over a vocab term never crashes on zero-length docs.
    assert [d for d, _ in r.bm25_topk(["tokens"], 3)] == [2]


def test_query_normalization_edge(ray_session, tmp_path):
    src = _write(tmp_path, ["Seed TABLE mix"])
    idx = str(tmp_path / "i")
    build_index(src, idx, IndexConfig(shard_size=8))
    r = IndexReader(idx)
    # Query tokens go through the same analyzer: case + sanitize chars.
    assert r.search(["SEED!"], "OR") == [1]
    assert r.search(["t@able"], "OR") == [1]
    assert r.search(["123"], "OR") == []  # filtered token → no postings
    assert r.search([], "OR") == []
    assert r.bm25_topk([], 5) == []
