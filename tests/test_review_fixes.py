"""Regression tests for the round-3 review findings: null semantics in
the aggregates, exact integer accumulation in pivot_counts, injective
partition tokens in the sink, temporal-join output-name collisions and
typed empty results, and the json_int_field anchor."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_distinct_count_ignores_null_values(ray_session):
    """SQL COUNT(DISTINCT v): null is not a value — a key whose only
    value is null still appears, with count 0."""
    import ray.data

    from konlsearch_ray.functions.aggregates import distinct_count

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
        "v": pa.array(["x", None, "y", None, None, "z"], pa.string()),
    })
    out = (distinct_count(ray.data.from_arrow(t), "k", "v")
           .to_pandas().set_index("k")["n_distinct"].to_dict())
    assert out == {"a": 2, "b": 0, "c": 1}

    import duckdb
    sql = duckdb.sql(
        "SELECT k, COUNT(DISTINCT v) AS n FROM t GROUP BY k").df()
    assert dict(zip(sql["k"], sql["n"])) == out


def test_histogram_excludes_null_rows(ray_session):
    """Null values must not be silently folded into bin 0 (NaN→int64
    would land there)."""
    import ray.data

    from konlsearch_ray.functions.aggregates import histogram

    t = pa.table({"v": pa.array([0, 5, None, 105, None, 250], pa.int64())})
    out = (histogram(ray.data.from_arrow(t), "v", lo=0, width=100, nbins=3)
           .to_pandas().set_index("bin")["count"].to_dict())
    assert out == {0: 2, 1: 1, 2: 1}


def test_pivot_counts_exact_beyond_float53(ray_session):
    """Integer-cent sums stay exact past 2^53 (the float64 bincount
    weights path would round the odd low bit away)."""
    import ray.data

    from konlsearch_ray.functions.aggregates import pivot_counts

    big = 45035996273704.0        # cents = 4503599627370400 (exact)
    t = pa.table({
        "k": pa.array(["u", "u", "u"], pa.string()),
        "cat": pa.array(["buy", "buy", "buy"], pa.string()),
        "amount": pa.array([big, big, 1.93], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = pivot_counts(ds, "k", "cat", ["buy"], value_col="amount").to_pandas()
    assert int(out["cents_buy"][0]) == 2 * 4503599627370400 + 193


def test_sink_null_partition_distinct_from_none_string(ray_session, tmp_path):
    """Null partition values and the literal string 'None' are different
    partitions; both commit, and a rerun skips both."""
    import ray.data

    from konlsearch_ray.functions.sinks import write_partitioned_parquet

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "src": pa.array([None, "None", None, "web"], pa.string()),
    })
    out = str(tmp_path / "sink")
    ds = ray.data.from_arrow(t).repartition(2)
    r1 = write_partitioned_parquet(ds, out, "src")
    assert r1 == {"written": 3, "skipped": 0}
    names = sorted(n for n in os.listdir(out))
    assert names == ["src=None", "src=__null__", "src=web"]
    from tests.test_functions import _read_part

    assert _read_part(out, "src=__null__").num_rows == 2
    assert _read_part(out, "src=None").num_rows == 1

    r2 = write_partitioned_parquet(ds, out, "src")
    assert r2 == {"written": 0, "skipped": 3}

    # a value that would escape to the reserved prefix cannot collide
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "src": pa.array(["__null__"], pa.string())})
    out2 = str(tmp_path / "sink2")
    write_partitioned_parquet(ray.data.from_arrow(t2), out2, "src")
    assert sorted(os.listdir(out2)) == ["src=%5F_null__"]


def test_temporal_join_output_collisions_raise(ray_session):
    import ray.data

    import functools as _f

    from konlsearch_ray.functions.temporal import (asof_join as _aj,
                                                   band_join as _bj)
    asof_join = _f.partial(_aj, int_unit="us")
    band_join = _f.partial(_bj, int_unit="us")

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "t": pa.array([10], pa.int64()),
        "r_x": pa.array([7], pa.int64()), "ts_us": pa.array([0], pa.int64()),
        "n_matches": pa.array([0], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "t": pa.array([5], pa.int64()),
        "x": pa.array([9], pa.int64())}))

    with pytest.raises(ValueError, match="prefixed right payload"):
        asof_join(left, right, "k", "t", left_cols=("r_x",),
                  right_cols=("x",), right_prefix="r_")
    with pytest.raises(ValueError, match="output columns"):
        asof_join(left, right, "k", "t", left_cols=("ts_us",))
    with pytest.raises(ValueError, match="n_matches"):
        band_join(left, right, "k", "t", -1.0, 1.0,
                  left_cols=("n_matches",), mode="count")


def test_asof_join_empty_result_keeps_declared_types(ray_session):
    """A legitimately-empty join result must carry the declared schema
    (string key/payload), not the generic int64 fallback."""
    import ray.data

    import functools as _f

    from konlsearch_ray.functions.temporal import asof_join as _aj
    asof_join = _f.partial(_aj, int_unit="us")

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
        "t": pa.array([10], pa.int64()),
        "name": pa.array(["doc"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "t": pa.array([], pa.int64()),
        "x": pa.array([], pa.string())}))
    out = asof_join(left, right, "k", "t", left_cols=("name",),
                    right_cols=("x",), how="inner")
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert out.count() == 0
    assert types["k"] == pa.string()
    assert types["name"] == pa.string()
    assert types["r_x"] == pa.string()


def test_json_int_field_ignores_key_inside_string_value(ray_session):
    """A quoted key appearing as TEXT inside another field's value must
    not produce a fabricated extraction — engine and oracle agree."""
    import duckdb
    import ray.data

    from konlsearch_ray.functions.text import json_int_field

    props = [
        '{"k": 42}',                              # genuine, first field
        '{"z": 1, "k": -7}',                      # genuine, later field
        '{"msg": "set \\"k\\": 7 today"}',        # quoted key inside value
        '{"other": 3}',                           # absent
    ]
    t = pa.table({"event_id": pa.array(range(4), pa.int64()),
                  "props": pa.array(props, pa.string())})
    df = (json_int_field(ray.data.from_arrow(t), "props", "k", "event_id")
          .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert df["k"][0] == 42 and df["k"][1] == -7
    assert df["k"].isna()[2] and df["k"].isna()[3]

    events = t.to_pandas()  # noqa: F841  (registered view for duckdb)
    sql = duckdb.sql(
        r"""SELECT event_id,
        CAST(nullif(regexp_extract(props, '[{,]\s*"k"\s*:\s*(-?\d+)', 1), '')
             AS BIGINT) AS k FROM events ORDER BY event_id""").df()
    assert (sql["k"].fillna(-999) == df["k"].fillna(-999)).all()
