"""Regression tests for the round-2 ADVICE items: sort-key encoding
consistency (nulls / uint64 / trailing bytes) and append-path robustness
(pre-existing doc_id column, dedup=False indexes)."""

import numpy as np
import pyarrow as pa
import pytest

from konlsearch_ray.build import (
    IndexConfig,
    _col_as_sortable_str,
    append_documents,
    build_index,
)
from konlsearch_ray.query import IndexReader


def test_sortable_str_same_encoding_with_and_without_nulls():
    # The projection must depend on the column TYPE only: the same value
    # must encode identically whether or not its block contains nulls.
    t_clean = pa.table({"k": pa.array([-5, 3], pa.int64())})
    t_nully = pa.table({"k": pa.array([-5, None], pa.int64())})
    s_clean = _col_as_sortable_str(t_clean, "k")
    s_nully = _col_as_sortable_str(t_nully, "k")
    assert s_clean[0].as_py() == s_nully[0].as_py()
    # Nulls map to the "" sentinel and sort before every encoded value.
    assert s_nully[1].as_py() == ""
    assert s_nully[1].as_py() < s_clean[0].as_py()


def test_sortable_str_orders_negatives_before_positives():
    t = pa.table({"k": pa.array([-7, -5, 0, 5], pa.int64())})
    s = [x.as_py() for x in _col_as_sortable_str(t, "k")]
    assert s == sorted(s)


def test_sortable_str_uint64_no_overflow():
    big = 2**63 + 5
    t = pa.table({"k": pa.array([big, 1, 2**64 - 1], pa.uint64())})
    s = [x.as_py() for x in _col_as_sortable_str(t, "k")]  # must not raise
    assert s[1] < s[0] < s[2]


def test_build_canonical_order_with_null_int_sort_key(ray_session, tmp_path):
    import ray.data

    # Two blocks: one null-free, one with nulls — the same key value must
    # land in the same canonical position regardless of its block.
    t = pa.table({
        "k": pa.array([30, 10, None, 20], pa.int64()),
        "content": pa.array([f"doc{i} unique token t{i}" for i in range(4)]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    idx = str(tmp_path / "i")
    build_index(ds, idx, IndexConfig(sort_keys=["k"], shard_size=8))
    from konlsearch_ray.docstore import DocStore

    docs = DocStore(idx).get_all().sort_by("doc_id")
    # Canonical order: null first, then 10, 20, 30.
    assert [v.as_py() for v in docs["k"]] == [None, 10, 20, 30]


def test_append_with_preexisting_doc_id_column(ray_session, tmp_path):
    import ray.data

    src = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha one", "beta two", "gamma three"]),
    })
    idx = str(tmp_path / "i")
    cfg = IndexConfig(content_col="text", id_col="doc_id", sort_keys=[],
                      shard_size=8)
    build_index(ray.data.from_arrow(src), idx, cfg)
    # Natural append format carries doc_id — assigned ids must win.
    new = pa.table({
        "doc_id": pa.array([99], pa.int64()),
        "text": pa.array(["delta four zzappendx"]),
    })
    out = append_documents(idx, ray.data.from_arrow(new))
    assert out["appended"] == 1
    assert IndexReader(idx).search(["zzappendx"], "OR") == [4]


def test_append_respects_dedup_false(ray_session, tmp_path):
    import ray.data

    src = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["same content here", "other content there"]),
    })
    idx = str(tmp_path / "i")
    cfg = IndexConfig(content_col="text", id_col="doc_id", sort_keys=[],
                      dedup=False, shard_size=8)
    build_index(ray.data.from_arrow(src), idx, cfg)
    # Duplicate content must INGEST (SUCCESS, fresh id), not CONFLICT.
    new = pa.table({"text": pa.array(
        ["same content here", "same content here"])})
    out = append_documents(idx, ray.data.from_arrow(new))
    assert out["appended"] == 2
    st = out["statuses"]
    assert st["status"].to_pylist() == ["SUCCESS", "SUCCESS"]
    assert sorted(st["doc_id"].to_pylist()) == [3, 4]
    assert IndexReader(idx).search(["same"], "OR") == [1, 3, 4]


def test_append_still_dedups_when_enabled(ray_session, tmp_path):
    import ray.data

    src = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["same content here"]),
    })
    idx = str(tmp_path / "i")
    cfg = IndexConfig(content_col="text", id_col="doc_id", sort_keys=[],
                      dedup=True, shard_size=8)
    build_index(ray.data.from_arrow(src), idx, cfg)
    new = pa.table({"text": pa.array(["same content here"])})
    out = append_documents(idx, ray.data.from_arrow(new))
    assert out["appended"] == 0
    st = out["statuses"]
    assert st["status"].to_pylist() == ["CONFLICT"]
    assert st["doc_id"].to_pylist() == [1]
