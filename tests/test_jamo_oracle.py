"""The DuckDB jamo expression (__ray_entry__._jamo_sql) must reproduce
``pipelines.suggest.decompose_jamo`` exactly — checked over every one of
the 11,172 precomposed Hangul syllables plus mixed/Latin strings. This
is what licenses the jamo suggestion entries as full oracle rows even
though the driver corpus happens to be Latin-only."""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def test_jamo_sql_matches_python_all_syllables():
    from __ray_entry__ import _jamo_sql
    from konlsearch_ray.pipelines.suggest import decompose_jamo

    terms = [chr(0xAC00 + i) for i in range(11172)]
    terms += ["마법", "특급소녀", "abc", "a마b법c", "", "ㅁ", "한s글x"]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"term": terms}))
    got = dict(con.execute(
        f"SELECT term, {_jamo_sql('term')} AS jk FROM t").fetchall())
    for term in terms:
        assert got[term] == decompose_jamo(term), term
