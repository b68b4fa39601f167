"""Compaction golden test: compacting deletions out of an index must
produce byte-identical segment/doclens content to a FRESH build over only
the surviving documents (id_col mode keeps ids stable, so the layouts are
directly comparable)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.tombstone import compact_index, delete_docs


def _corpus(n=60):
    # Varied token streams so postings have real tf/pos structure.
    texts = []
    for i in range(n):
        words = []
        for j in range(5 + (i % 7)):
            words.append(f"tok{(i * 3 + j) % 23}")
            if j % 2 == 0:
                words.append("common")
        texts.append(" ".join(words))
    return pa.table({
        "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "text": pa.array(texts),
    })


@pytest.mark.parametrize("dead", [[3, 17, 40, 41, 42], [1, 60]])
def test_compaction_matches_fresh_build(ray_session, tmp_path, dead):
    import ray.data

    t = _corpus()
    cfg = lambda: IndexConfig(content_col="text", id_col="doc_id",  # noqa: E731
                              sort_keys=[], dedup=False, shard_size=16)
    idx_a = str(tmp_path / "a")
    build_index(ray.data.from_arrow(t), idx_a, cfg())
    delete_docs(idx_a, dead)
    stats_a = compact_index(idx_a)

    survivors = t.filter(
        pa.array([i not in set(dead) for i in t["doc_id"].to_pylist()]))
    idx_b = str(tmp_path / "b")
    stats_b = build_index(ray.data.from_arrow(survivors), idx_b, cfg())

    assert stats_a["N"] == stats_b["N"]
    assert stats_a["total_tokens"] == stats_b["total_tokens"]
    assert stats_a["vocab"] == stats_b["vocab"]

    for sub in ("segments", "doclens"):
        names_a = sorted(os.listdir(os.path.join(idx_a, sub)))
        names_b = sorted(os.listdir(os.path.join(idx_b, sub)))
        assert names_a == names_b
        for n in names_a:
            ta = pq.read_table(os.path.join(idx_a, sub, n))
            tb = pq.read_table(os.path.join(idx_b, sub, n))
            # Table equality covers the encoded varint blobs byte-for-byte.
            assert ta.equals(tb), f"{sub}/{n} differs"


def test_compaction_queries_after(ray_session, tmp_path):
    import ray.data

    from konlsearch_ray.query import IndexReader

    t = _corpus()
    idx = str(tmp_path / "i")
    build_index(ray.data.from_arrow(t), idx,
                IndexConfig(content_col="text", id_col="doc_id",
                            sort_keys=[], dedup=False, shard_size=16))
    before = IndexReader(idx).search(["common"], "OR")
    delete_docs(idx, [2, 4])
    compact_index(idx)
    after = IndexReader(idx).search(["common"], "OR")
    assert after == [d for d in before if d not in (2, 4)]
