"""Corpus n-gram counts + benchmark decontamination
(functions/ngrams.py). Hand-derived oracles on tiny corpora; analyzer
semantics (sanitize + token classes) apply to the token stream."""

import pyarrow as pa

from konlsearch_ray.functions.ngrams import contamination, ngram_counts


def _ds(texts, ids=None):
    import ray.data

    tbl = {"text": pa.array(texts, pa.string())}
    tbl["doc_id"] = pa.array(ids or list(range(1, len(texts) + 1)), pa.int64())
    return ray.data.from_arrow(pa.table(tbl))


def test_ngram_counts(ray_session):
    ds = _ds(["a b c a b", "a b x"])
    out = ngram_counts(ds, "text", n=2).to_pandas().sort_values(
        "ngram").reset_index(drop=True)
    # doc1 bigrams: ab, bc, ca, ab; doc2: ab, bx -> ab:3 bc:1 bx:1 ca:1
    assert out["ngram"].tolist() == ["a b", "b c", "b x", "c a"]
    assert out["cnt"].tolist() == [3, 1, 1, 1]
    out2 = ngram_counts(ds, "text", n=2, min_count=2).to_pandas()
    assert out2["ngram"].tolist() == ["a b"] and out2["cnt"].tolist() == [3]


def test_ngram_counts_short_docs(ray_session):
    # docs shorter than n contribute nothing; all-short corpus -> empty
    out = ngram_counts(_ds(["a", "b"]), "text", n=3).to_pandas()
    assert len(out) == 0


def test_contamination(ray_session):
    corpus = _ds(["a b c d", "x y z w", "a b c q"], ids=[1, 2, 3])
    bench = _ds(["a b c"], ids=[100])
    out = contamination(corpus, bench, "text", "doc_id", n=3).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # doc1 trigrams {abc, bcd}: abc hits -> 1/2; doc2: none; doc3 {abc,
    # bcq}: 1/2
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_shingles"].tolist() == [2, 2, 2]
    assert out["n_hit"].tolist() == [1, 0, 1]
    assert out["frac_bp"].tolist() == [5000, 0, 5000]


def test_grouped_quantiles(ray_session):
    import ray.data

    from konlsearch_ray.functions.stats import grouped_quantiles

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"] * 5 + ["b"], pa.string()),
        "v": pa.array([5.0, 1.0, 3.0, 2.0, 4.0, 7.5], pa.float64())}))
    out = grouped_quantiles(ds, "k", "v").to_pandas().sort_values(
        "k").reset_index(drop=True)
    # key a sorted [1..5]: p50 idx (5-1)*5000//10000=2 -> 3.0;
    # p90 idx 3 -> 4.0; p99 idx 3 -> 4.0. key b single value.
    assert out["n"].tolist() == [5, 1]
    assert out["p50"].tolist() == [3.0, 7.5]
    assert out["p90"].tolist() == [4.0, 7.5]
    assert out["p99"].tolist() == [4.0, 7.5]


def test_contamination_empty_bench(ray_session):
    corpus = _ds(["a b c d"], ids=[1])
    bench = _ds(["q"], ids=[9])  # too short for any trigram
    out = contamination(corpus, bench, "text", "doc_id", n=3).to_pandas()
    assert out["n_hit"].tolist() == [0] and out["frac_bp"].tolist() == [0]
