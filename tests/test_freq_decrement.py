"""Frequency decrement on delete — reference parity for
trie.decrease_frequency (trie.py:190), KonlCounter.decrease
(counter.py:66-80) and trie.delete -> __delete_counter (trie.py:163-181,
219-230), mirrored through the log-side negative entries folded by
aggregate_search_frequency and the compact_index(freq_dir=...) hook.
Semantics mirror reference test_konlsearch.py:597-640 (test_counter /
test_search_by_frequency) but driven through an actual doc delete."""

import itertools
import os

import pyarrow as pa
import pytest

from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.pipelines.logagg import (
    SearchLog,
    aggregate_search_frequency,
    current_frequency_table,
    delete_frequency_terms,
)
from konlsearch_ray.query import IndexReader
from konlsearch_ray.tombstone import compact_index, delete_docs


def _clock():
    c = itertools.count()
    return lambda: 1_000 + next(c)


def _freq_dict(t: pa.Table) -> dict:
    return dict(zip(t["term"].to_pylist(), t["hits"].to_pylist()))


def test_negative_log_entries_decrement_with_floor(tmp_path):
    """Reference test_counter semantics (counter.py decrease): increase
    a/b/c/d, decrease d twice, then a decrement past 0 removes d."""
    log_dir, freq_dir = str(tmp_path / "log"), str(tmp_path / "freq")
    log = SearchLog(log_dir, clock=_clock())
    for term, n in (("a", 10), ("b", 100), ("c", 1000), ("d", 10000)):
        log.log(term, n)
    log.flush()
    assert _freq_dict(aggregate_search_frequency(log_dir, freq_dir)) == {
        "a": 10, "b": 100, "c": 1000, "d": 10000}

    log.log("d", -1000)
    log.flush()
    t = aggregate_search_frequency(log_dir, freq_dir)
    assert _freq_dict(t)["d"] == 9000

    log.log("d", -8999)
    log.flush()
    t = aggregate_search_frequency(log_dir, freq_dir)
    assert _freq_dict(t)["d"] == 1

    # decrement past zero: the term drops (the reference counter removes
    # a key that reaches 0; the trie clamps at 0 — a dropped row re-folds
    # from 0 identically)
    log.log("d", -5)
    log.flush()
    t = aggregate_search_frequency(log_dir, freq_dir)
    assert _freq_dict(t) == {"a": 10, "b": 100, "c": 1000}

    # re-increment after the floor starts from 0, not -4
    log.log("d", 7)
    log.flush()
    t = aggregate_search_frequency(log_dir, freq_dir)
    assert _freq_dict(t)["d"] == 7


def test_delete_frequency_terms_atomic_rewrite(tmp_path):
    log_dir, freq_dir = str(tmp_path / "log"), str(tmp_path / "freq")
    log = SearchLog(log_dir, clock=_clock())
    log.log("keep", 3)
    log.log("gone", 5)
    log.flush()
    aggregate_search_frequency(log_dir, freq_dir)
    out = delete_frequency_terms(freq_dir, ["gone", "never-there"])
    assert _freq_dict(out) == {"keep": 3}
    # the committed state agrees (manifest swapped)
    assert _freq_dict(current_frequency_table(freq_dir)) == {"keep": 3}
    # idempotent on re-run
    assert _freq_dict(delete_frequency_terms(freq_dir, ["gone"])) == {
        "keep": 3}


def test_compaction_drops_vanished_tokens_from_frequency(
        ray_session, tmp_path):
    """Delete the only doc containing a token, compact with freq_dir:
    the token's frequency entry vanishes (trie.delete parity); tokens
    still in the dictionary keep their counts."""
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["shared zzunique one", "shared other two",
                          "shared other three"]),
    })
    import ray.data

    idx = str(tmp_path / "i")
    build_index(ray.data.from_arrow(t), idx,
                IndexConfig(content_col="text", id_col="doc_id",
                            sort_keys=[], shard_size=8))
    log_dir, freq_dir = str(tmp_path / "log"), str(tmp_path / "freq")
    log = SearchLog(log_dir, clock=_clock())
    r = IndexReader(idx)
    # reference flow: searches log non-empty-posting tokens (Q7), then
    # aggregate_frequency folds them
    for term in ("shared", "zzunique", "shared"):
        hits = len(r.search([term], "OR"))
        assert hits > 0
        log.log(term, 1)
    log.flush()
    assert _freq_dict(aggregate_search_frequency(log_dir, freq_dir)) == {
        "shared": 2, "zzunique": 1}

    # doc 1 is the only doc containing "zzunique"
    delete_docs(idx, [1])
    compact_index(idx, freq_dir=freq_dir)
    got = _freq_dict(current_frequency_table(freq_dir))
    assert got == {"shared": 2}
    # and the index agrees: the token is gone
    r2 = IndexReader(idx)
    assert r2.search(["zzunique"], "OR") == []
    assert r2.search(["shared"], "OR") == [2, 3]
