"""Filtered BM25 (metadata predicate → allowed-id set) invariants.

Contract under test (query.py bm25_topk(allowed=...)): scoring
statistics stay corpus-level, so the filtered top-k equals the FULL
unfiltered ranking restricted to the allowed set, scores unchanged.
"""

import numpy as np
import pyarrow.dataset as pads
import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.docstore import DocStore
from konlsearch_ray.query import IndexReader

N_DOCS = 400


@pytest.fixture(scope="module")
def fb_built(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from konlsearch_ray.corpus import generate_corpus

    root = tmp_path_factory.mktemp("konl_fbm25")
    table = generate_corpus(N_DOCS, seed=11)
    # Attach a deterministic metadata column the predicate can cut on.
    grp = pa.array([f"g{(i % 3)}" for i in range(table.num_rows)])
    table = table.append_column("grp", grp)
    src = str(root / "corpus.parquet")
    pq.write_table(table, src)
    index_dir = str(root / "index")
    build_index(src, index_dir,
                IndexConfig(shard_size=64, store_cols=["grp"], dedup=False))
    return IndexReader(index_dir), DocStore(index_dir), index_dir


def test_ids_matching_pushdown(fb_built):
    reader, store, _ = fb_built
    ids = store.ids_matching(pads.field("grp") == "g1")
    assert len(ids) and np.all(np.diff(ids) > 0)
    rows = store.get_multi(ids[:5].tolist())
    assert rows["grp"].to_pylist() == ["g1"] * 5
    assert len(store.ids_matching(pads.field("grp") == "nope")) == 0


def test_filtered_equals_restricted_full_ranking(fb_built):
    reader, store, _ = fb_built
    tokens = ["class", "def", "import"]
    allowed = store.ids_matching(pads.field("grp") == "g1")
    got = reader.bm25_topk(tokens, 10, allowed=allowed)
    # Brute force: unfiltered ranking over the whole corpus, restricted.
    full = reader.bm25_topk(tokens, reader.n_docs, prune=False)
    aset = set(allowed.tolist())
    want = [(d, s) for d, s in full if d in aset][:10]
    assert len(got) == 10  # non-trivial: the corpus really matches
    assert got == want
    assert all(d in aset for d, _ in got)


def test_filtered_empty_and_all(fb_built):
    reader, store, _ = fb_built
    tokens = ["class", "self"]
    assert reader.bm25_topk(tokens, 5,
                            allowed=np.zeros(0, dtype=np.int64)) == []
    everyone = store.get_all()["doc_id"].to_numpy().astype(np.int64)
    assert (reader.bm25_topk(tokens, 10, allowed=everyone)
            == reader.bm25_topk(tokens, 10))


def test_filtered_sharded_parity(fb_built):
    from konlsearch_ray.query import ShardedQueryEngine

    reader, store, index_dir = fb_built
    tokens = ["class", "def", "import"]
    flt = pads.field("grp") == "g2"
    allowed = store.ids_matching(flt)
    eng = ShardedQueryEngine(index_dir, num_actors=3)
    try:
        assert (eng.bm25_topk_filtered(tokens, 10, flt)
                == reader.bm25_topk(tokens, 10, allowed=allowed))
    finally:
        eng.shutdown()


def test_boosted_equals_exact_and_reorders(fb_built):
    reader, store, index_dir = fb_built
    tokens = ["class", "def", "import"]
    boosts = {"class": 3.0, "import": 0.2}
    pruned = reader.bm25_topk(tokens, 10, boosts=boosts)
    exact = reader.bm25_topk(tokens, 10, prune=False, boosts=boosts)
    assert len(pruned) == 10
    assert pruned == exact
    assert pruned != reader.bm25_topk(tokens, 10)
    # Neutral boost is the identity; cache stays clean across boosted use.
    assert (reader.bm25_topk(tokens, 10, boosts={"class": 1.0})
            == reader.bm25_topk(tokens, 10))
    # Boost keys normalize like query tokens (TABLE -> table).
    assert (reader.bm25_topk(tokens, 10, boosts={"CLASS": 3.0, "import": 0.2})
            == pruned)
    with pytest.raises(ValueError, match="positive"):
        reader.bm25_topk(tokens, 5, boosts={"class": 0.0})
    from konlsearch_ray.query import ShardedQueryEngine

    eng = ShardedQueryEngine(index_dir, num_actors=3)
    try:
        assert eng.bm25_topk(tokens, 10, boosts=boosts) == pruned
    finally:
        eng.shutdown()
