"""Pluggable stateful analyzer (SURVEY.md ST1/§2.10): the actor-pool
tokenizer loads per-worker state once and the index reflects morpheme ∪
whitespace-token semantics like the reference's mecab path
(reference index.py:98-102; golden behavior: compound 마법소녀 is findable
via 마법 and 소녀, test_konlsearch.py:191-213)."""

import pyarrow as pa
import pytest

from konlsearch_ray.analyzer import KoreanLexiconAnalyzer
from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.query import IndexReader

LEXICON = ["마법", "소녀", "모래", "특급", "특별", "건담"]

# partial over the library class pickles by value — a factory defined in
# this (non-importable) test module would strand the Ray workers.
import functools

_analyzer_factory = functools.partial(KoreanLexiconAnalyzer, LEXICON)


def test_lexicon_analyzer_unit():
    a = KoreanLexiconAnalyzer(LEXICON)
    assert a.tokenize_many(["마법소녀 returns"]) == [["마법소녀", "마법", "소녀", "returns"]]
    # Unsegmentable hangul → kept whole, no morpheme emission.
    assert a.tokenize_many(["함수세계"]) == [["함수세계"]]
    # Sanitize + case rules still apply.
    assert a.tokenize_many(["SEED! 마법소녀,"]) == [["seed", "마법소녀", "마법", "소녀"]]


def test_build_with_custom_analyzer(ray_session, tmp_path):
    docs = pa.table({
        "repo": pa.array(["r"] * 4),
        "path": pa.array([f"p{i}" for i in range(4)]),
        "commit": pa.array(["c" * 40] * 4),
        "lang": pa.array(["python"] * 4),
        "content": pa.array([
            "마법소녀 alpha beta",
            "마법 단독 doc",
            "소녀 단독 doc two",
            "plain ascii only",
        ], pa.large_string()),
    })
    src = str(tmp_path / "docs.parquet")
    import pyarrow.parquet as pq

    pq.write_table(docs, src)
    idx = str(tmp_path / "i")
    build_index(src, idx, IndexConfig(
        shard_size=2, analyzer_factory=_analyzer_factory))
    r = IndexReader(idx)
    # Compound doc matches both morphemes (reference mecab-union behavior).
    assert r.search(["마법"], "OR") == [1, 2]
    assert r.search(["소녀"], "OR") == [1, 3]
    assert r.search(["마법소녀"], "OR") == [1]
    assert r.search(["alpha", "마법"], "AND") == [1]
