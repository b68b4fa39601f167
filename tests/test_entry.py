"""Driver-contract gate, run locally: queries() vs oracle_sql() via DuckDB.

This replicates the driver's sf=0.01 comparison (row-count + schema +
order-insensitive values) at sf=0.001 to keep the suite fast.
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tests.entry_harness import run  # noqa: E402


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = m.entry()
    df = res.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"qid", "doc_id", "rank", "score"}
    assert set(m.queries()) >= set(m.oracle_sql())


def test_queries_match_oracle_sql(ray_session):
    failures = run("/root/testdata/sf0.001")
    assert failures == 0
