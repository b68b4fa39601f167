"""Regression tests for the second round-3 review pass: catalog name
validation, ANN self-exclusion with short candidate lists, exactly-once
log-frequency checkpointing, empty-input guards, and output-column
collision detection in normalize_corpus / curation."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def test_catalog_rejects_dangerous_names(tmp_path):
    from konlsearch_ray.catalog import create_index, destroy_index, index_path

    root = str(tmp_path / "cat")
    create_index(root, "real")
    for bad in ("", "a/b", "..", ".hidden", " padded "):
        with pytest.raises(ValueError):
            index_path(root, bad)
        with pytest.raises(ValueError):
            destroy_index(root, bad)
    assert os.path.isdir(os.path.join(root, "real"))  # root survived


def test_ann_topk_never_returns_self_even_when_short(ray_session):
    """Fewer candidates than k: the query must not appear as its own
    neighbor (the old -inf poisoning surfaced it with cos=-inf)."""
    import ray.data

    from konlsearch_ray.functions.similarity import ann_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(4, 8))
    t = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    out = ann_topk(ray.data.from_arrow(t), [0], k=10).to_pandas()
    assert len(out) == 3  # three real neighbors, no self row
    assert (out["neighbor"] != 0).all()
    assert np.isfinite(out["cos"]).all()


def test_lsh_bucketed_pairs_empty_input(ray_session):
    import ray.data

    from konlsearch_ray.functions.similarity import lsh_bucketed_pairs

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    out = lsh_bucketed_pairs(empty, tau=0.9)
    assert out.count() == 0
    assert out.schema().names == ["a", "b"]


def test_frequency_checkpoint_single_commit_point(ray_session, tmp_path):
    """The manifest is the only commit point: an orphaned frequency file
    from a crashed run (written, never committed) must not change counts,
    and gets garbage-collected."""
    from konlsearch_ray.pipelines.logagg import (SearchLog,
                                                 aggregate_search_frequency)

    log_dir, freq_dir = str(tmp_path / "log"), str(tmp_path / "freq")
    log = SearchLog(log_dir, clock=lambda: 1000)
    log.log("alpha", 3)
    log.log("beta", 1)
    log.flush()
    t1 = aggregate_search_frequency(log_dir, freq_dir)
    assert dict(zip(t1["term"].to_pylist(), t1["hits"].to_pylist())) == {
        "alpha": 3, "beta": 1}

    # simulate a crash AFTER the versioned frequency write, BEFORE the
    # manifest swap: an orphan exists but the manifest doesn't name it
    import pyarrow.parquet as pq

    orphan = os.path.join(freq_dir, "frequency-deadbeef00.parquet")
    pq.write_table(pa.table({"term": pa.array(["alpha"]),
                             "hits": pa.array([999], pa.int64())}), orphan)
    log.log("alpha", 2)
    log.flush()
    t2 = aggregate_search_frequency(log_dir, freq_dir)
    assert dict(zip(t2["term"].to_pylist(), t2["hits"].to_pylist())) == {
        "alpha": 5, "beta": 1}  # orphan ignored, new part counted once
    assert not os.path.exists(orphan)  # GC'd
    with open(os.path.join(freq_dir, "manifest.json")) as f:
        m = json.load(f)
    assert os.path.exists(os.path.join(freq_dir, m["frequency_file"]))


def test_assign_seq_ids_custom_id_col_empty_schema(ray_session):
    import ray.data

    from konlsearch_ray.pipelines.logagg import assign_seq_ids

    empty = ray.data.from_arrow(pa.table({
        "request_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
    }))
    out = assign_seq_ids(empty, id_col="request_id")
    assert out.schema().names == ["request_id", "sec", "seq"]


def test_normalize_corpus_rejects_output_collisions(ray_session):
    import ray.data

    from konlsearch_ray.sources import normalize_corpus

    t = pa.table({
        "text": pa.array(["hello"]),
        "uid": pa.array([7], pa.int64()),
        "doc_id": pa.array([999], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="collide"):
        normalize_corpus(ds, content_col="text", id_col="uid",
                         keep_cols=["doc_id"])
    # mapping the column ITSELF as the id is still fine
    out = normalize_corpus(ds, content_col="text", id_col="doc_id",
                           keep_cols=["doc_id"]).to_pandas()
    assert out["doc_id"][0] == 999


def test_annotate_quality_rejects_reserved_columns(ray_session):
    import ray.data

    from konlsearch_ray.pipelines.curate import annotate_quality

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["some words here"]),
                  "n_tokens": pa.array([42], pa.int64())})
    with pytest.raises(ValueError, match="n_tokens"):
        annotate_quality(ray.data.from_arrow(t), "text")


def test_simhash_pairs_rejects_radius_beyond_pigeonhole(ray_session):
    import ray.data

    from konlsearch_ray.functions.dedup import simhash_pairs

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c", "a b d"])}))
    with pytest.raises(ValueError, match="approximate"):
        simhash_pairs(ds, "text", "doc_id", max_hamming=4)
    # explicit opt-in accepts chunk-conditioned recall
    out = simhash_pairs(ds, "text", "doc_id", max_hamming=4,
                        approximate=True)
    assert out.schema().names == ["a", "b", "hamming"]


def test_ngram_counts_empty_result_keeps_string_schema(ray_session):
    import ray.data

    from konlsearch_ray.functions.ngrams import ngram_counts

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["alpha beta gamma"])}))
    out = ngram_counts(ds, "text", n=2, min_count=99)
    sch = out.schema()
    assert out.count() == 0
    assert dict(zip(sch.names, sch.types))["ngram"] == pa.string()


def test_grouped_quantiles_ignore_nulls(ray_session):
    import ray.data

    from konlsearch_ray.functions.stats import grouped_quantiles

    t = pa.table({
        "k": pa.array(["a"] * 6 + ["b"], pa.string()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, None, None, None],
                      pa.float64()),
    })
    out = (grouped_quantiles(ray.data.from_arrow(t), "k", "v",
                             qs=(("p50", 5000), ("p100", 10000)))
           .to_pandas().set_index("k"))
    # nulls excluded from n and from the sorted values; all-null key
    # emits nothing
    assert list(out.index) == ["a"]
    assert int(out.loc["a", "n"]) == 4
    assert out.loc["a", "p50"] == 20.0 and out.loc["a", "p100"] == 40.0


def test_bucket_hash_empty_column():
    from konlsearch_ray.functions.sampling import _bucket_of

    out = _bucket_of(pa.array([], pa.int64()), "v1")
    assert len(out) == 0
