"""Regression tests for the round-5 high-effort review findings over
build.py / codec.py / analyzer.py (silent-corruption class: duplicate
user ids, float sort keys, null content, unestimable sources,
non-monotone posting input)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.query import IndexReader


def _write(tmp_path, name, table):
    p = str(tmp_path / name)
    pq.write_table(table, p)
    return p


def test_duplicate_user_ids_raise(ray_session, tmp_path):
    """id_col mode with two rows sharing an id must FAIL the build, not
    silently merge their postings (tf summed across distinct docs),
    duplicate doclens rows and inflate N."""
    src = _write(tmp_path, "d.parquet", pa.table({
        "doc_id": pa.array([1, 2, 2], pa.int64()),
        "text": pa.array(["hello one", "hello two", "hello three"],
                         pa.large_string()),
    }))
    with pytest.raises(Exception, match="duplicate doc_id 2"):
        build_index(src, str(tmp_path / "i"),
                    IndexConfig(content_col="text", id_col="doc_id",
                                dedup=False, shard_size=4))


def test_float_sort_key_orders_by_value(ray_session, tmp_path):
    """A float sort key must order by VALUE (10.5 > 2.0 > -3.5), not by
    string ('10.5' < '2'): doc ids are assigned in canonical key order
    and first-wins dedup keeps the true-min row."""
    src = _write(tmp_path, "d.parquet", pa.table({
        "score": pa.array([10.5, 2.0, -3.5, 9.25], pa.float64()),
        "text": pa.array(["big doc", "small doc", "neg doc", "mid doc"],
                         pa.large_string()),
    }))
    idx = str(tmp_path / "i")
    build_index(src, idx, IndexConfig(content_col="text", dedup=False,
                                      sort_keys=["score"], shard_size=4))
    r = IndexReader(idx)
    # Value order: -3.5 < 2.0 < 9.25 < 10.5 -> ids 1..4.
    assert r.search(["neg"], "OR") == [1]
    assert r.search(["small"], "OR") == [2]
    assert r.search(["mid"], "OR") == [3]
    assert r.search(["big"], "OR") == [4]


def test_float_dedup_winner_is_value_min(ray_session, tmp_path):
    """Duplicate content under a float sort key keeps the row whose key
    is smallest BY VALUE (the huge path's true-value sort agrees)."""
    src = _write(tmp_path, "d.parquet", pa.table({
        "score": pa.array([10.5, 2.0, 9.5], pa.float64()),
        "text": pa.array(["same text", "same text", "same text"],
                         pa.large_string()),
        "tag": pa.array(["a", "b", "c"], pa.large_string()),
    }))
    idx = str(tmp_path / "i")
    build_index(src, idx, IndexConfig(content_col="text", dedup=True,
                                      sort_keys=["score"], shard_size=4,
                                      store_cols=["tag", "score"]))
    from konlsearch_ray.docstore import DocStore

    rows = DocStore(idx).get_all()
    assert rows.num_rows == 1
    assert rows["score"][0].as_py() == 2.0  # min by value, not '10.5'


def test_null_content_rows_excluded_at_build(ray_session, tmp_path):
    """Null-content rows are unindexable; the build excludes them (the
    append path's ERROR semantics) instead of dedup-merging them all
    into one indexed empty document."""
    src = _write(tmp_path, "d.parquet", pa.table({
        "text": pa.array(["real doc", None, None], pa.large_string()),
    }))
    idx = str(tmp_path / "i")
    stats = build_index(src, idx, IndexConfig(content_col="text",
                                              sort_keys=["text"],
                                              shard_size=4))
    assert stats["N"] == 1
    from konlsearch_ray.docstore import DocStore

    assert DocStore(idx).get_all().num_rows == 1


def test_grouped_encoder_rejects_non_increasing_ids():
    """encode_postings_grouped fails fast on non-increasing doc ids
    within a term (same contract as encode_posting) instead of wrapping
    the gap into a ~2^64 varint that decodes into garbage."""
    from konlsearch_ray.codec import encode_postings_grouped

    starts = np.array([0], dtype=np.int64)
    doc_s = np.array([5, 3], dtype=np.int64)  # decreasing within term
    tf_s = np.array([1, 1], dtype=np.int64)
    pos_s = np.array([0, 0], dtype=np.int64)
    with pytest.raises(ValueError, match="strictly increasing"):
        encode_postings_grouped(starts, doc_s, tf_s, pos_s)
    # First entry per term is ABSOLUTE (doc id 0 is legal there).
    ok = encode_postings_grouped(
        np.array([0, 2], dtype=np.int64),
        np.array([0, 4, 0, 9], dtype=np.int64),
        np.array([1, 1, 1, 1], dtype=np.int64),
        np.array([0, 0, 0, 0], dtype=np.int64))
    assert list(ok["df"]) == [2, 2]


def test_estimate_rows_unknown_routes_to_shuffle_path(tmp_path):
    """Unestimable sources (remote URIs, nested layouts, reader errors)
    must NOT estimate as 0 rows — 0 routes an arbitrarily large corpus
    onto the driver-rank path, the exact OOM the guard prevents."""
    from konlsearch_ray.build import DEDUP_DRIVER_MAX_ROWS, _estimate_rows

    assert _estimate_rows("s3://nope/d.parquet") > DEDUP_DRIVER_MAX_ROWS
    nested = tmp_path / "nested" / "part=0"
    nested.mkdir(parents=True)
    pq.write_table(pa.table({"x": [1]}), str(nested / "f.parquet"))
    # No top-level *.parquet files -> unknown, not 0.
    assert _estimate_rows(str(tmp_path / "nested")) > DEDUP_DRIVER_MAX_ROWS
    # A real file still estimates exactly.
    flat = _write(tmp_path, "flat.parquet", pa.table({"x": [1, 2, 3]}))
    assert _estimate_rows(flat) == 3
