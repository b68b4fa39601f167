"""Deletion semantics: tombstone masking + segment-rewrite compaction.

Mirrors the reference's delete tests (reference test_konlsearch.py:257-305,
359-368): a deleted doc disappears from every search mode, and the
structure physically drops it after compaction.
"""

import numpy as np
import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.corpus import write_corpus
from konlsearch_ray.query import IndexReader
from konlsearch_ray.tombstone import compact_index, delete_docs, load_tombstones


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("tomb")
    corpus = write_corpus(str(root / "c"), 400, seed=5)
    index_dir = str(root / "i")
    build_index(corpus, index_dir, IndexConfig(shard_size=64))
    return index_dir


def test_delete_masks_everywhere(idx):
    r0 = IndexReader(idx)
    base_and = r0.search(["def", "return"], "AND")
    base_or = r0.search(["def", "return"], "OR")
    base_top = r0.bm25_topk(["def", "return"], 10)
    assert base_top
    victims = [base_top[0][0], base_and[0] if base_and else base_or[0]]
    delete_docs(idx, victims)

    r = IndexReader(idx)
    assert len(load_tombstones(idx)) == len(set(victims))
    for mode in ("AND", "OR", "PHRASE"):
        got = r.search(["def", "return"], mode)
        assert not (set(victims) & set(got)), mode
    top = r.bm25_topk(["def", "return"], 10)
    assert not (set(victims) & {d for d, _ in top})
    # Live-doc stats shrink.
    assert r.n_docs == r0.n_docs - len(set(victims))
    # Pruned and exact paths agree post-delete too.
    assert r.bm25_topk(["def", "return"], 10, prune=True) == \
        r.bm25_topk(["def", "return"], 10, prune=False)


def test_compact_rewrites_segments(idx):
    dead = load_tombstones(idx)
    assert len(dead)
    pre = IndexReader(idx)
    pre_and = pre.search(["def", "return"], "AND")
    pre_top = pre.bm25_topk(["def", "return"], 10)

    stats = compact_index(idx)
    assert len(load_tombstones(idx)) == 0
    post = IndexReader(idx)
    assert len(post._dead) == 0
    # Physically gone: no posting list contains a dead doc.
    for t in ("def", "return", "import"):
        ids, _, _ = post.postings(t)
        assert not np.isin(ids, dead).any(), t
    # Results identical to the masked view.
    assert post.search(["def", "return"], "AND") == pre_and
    assert post.bm25_topk(["def", "return"], 10) == pre_top
    assert stats["N"] == pre.n_docs
    # Docstore rows dropped as well.
    import os

    import pyarrow.parquet as pq

    t = pq.ParquetDataset(os.path.join(idx, "docs")).read(columns=["doc_id"])
    assert not np.isin(t["doc_id"].to_numpy(), dead).any()
