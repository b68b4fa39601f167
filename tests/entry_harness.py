"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side over an sf dir and compare
row-count + schema + order-insensitive value hash."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if not len(df.columns):  # 0-row Datasets lose their schema
            sch = res.schema()
            if sch is not None:
                df = pa.schema(
                    list(zip(sch.names, sch.types))).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            import numpy as np

            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
            if not ok:
                mism = (pd.Series(av).astype(str) != pd.Series(bv).astype(str))
                i = int(mism.idxmax()) if mism.any() else 0
                problems.append(
                    f"values[{col}] differ, e.g. row {i}: ray={av[i]!r} sql={bv[i]!r}")
    return problems


def run(sf_dir: str, only: list[str] | None = None,
        record: dict | None = None) -> int:
    """Run the gate; if ``record`` is given, also fill it with one
    driver-CORRECTNESS-style row per entry (rows/schema/hash booleans,
    row counts, err) so the run can be persisted as an artifact."""
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            if record is not None:
                record[name] = {
                    "rows_match": False, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"{type(e).__name__}: {e}"[:300]}
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(ray_df)} rows, cols={list(ray_df.columns)}")
            if record is not None:
                record[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(ray_df),
                    "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: SQL raised {type(e).__name__}: {e}")
            failures += 1
            if record is not None:
                record[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(ray_df),
                    "oracle_rows": None,
                    "err": f"SQL {type(e).__name__}: {e}"[:300]}
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(ray_df)} rows")
        if record is not None:
            schema_ok = not any(p.startswith("schema") for p in problems)
            rows_ok = schema_ok and not any(
                p.startswith("rows") for p in problems)
            record[name] = {
                "rows_match": rows_ok, "schema_match": schema_ok,
                "hash_match": not problems,
                "spark_rows": len(ray_df), "oracle_rows": len(sql_df),
                "err": "; ".join(problems)[:300] or None}
    return failures


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    out_json = os.environ.get("GATE_RECORD_JSON")
    results: dict | None = {} if out_json else None
    rc = run(sf, only, record=results)
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"recorded {len(results)} entries -> {out_json}")
    ray.shutdown()
    sys.exit(1 if rc else 0)
