"""Resumable partitioned Parquet sink.

A 100-TB job that dies at 93% must not redo the 93%.  The index build
already has manifested resume (build.py shard manifests); this is the
same contract as a GENERIC sink any pipeline can end in:

- output is one directory per partition-key value
  (``out_dir/<col>=<value>/data.parquet``) — never one giant file;
- each partition commits atomically (tmp file + ``os.replace``, then a
  ``_SUCCESS`` marker — the marker is the unit of resume);
- a rerun lists the markers (one cheap driver-side listdir, O(partitions)),
  filters the input to UNFINISHED partitions inside ``map_batches``
  (vectorized ``pc.is_in`` against the finished-value set), and only
  those partitions shuffle and write.

The exchange is the one keyed groupby every partitioned write needs;
rows of finished partitions are dropped at the map stage, BEFORE the
shuffle, so a 93%-done rerun moves only the missing 7%.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

_SAFE = re.compile(r"[^A-Za-z0-9_.\-]")


def _part_token(v) -> str:
    """Filesystem-safe, INJECTIVE token for a partition value
    (hive-style dirs).  Null maps to the reserved ``__null__``; any
    string value whose escaped form would start with ``__`` gets its
    first character percent-escaped, so no value can collide with the
    reserved token (or with each other: null and the literal string
    ``'None'`` are different partitions, not one clobbered directory)."""
    if v is None:
        return "__null__"
    tok = _SAFE.sub(lambda m: f"%{ord(m.group(0)[0]):02X}", str(v))
    if tok.startswith("__"):
        tok = f"%{ord(tok[0]):02X}" + tok[1:]
    return tok


def finished_partitions(out_dir: str, partition_col: str) -> set[str]:
    """Partition tokens already committed (``_SUCCESS`` marker present)."""
    done = set()
    prefix = f"{partition_col}="
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith(prefix) and os.path.exists(
                    os.path.join(out_dir, name, "_SUCCESS")):
                done.add(name[len(prefix):])
    return done


def write_partitioned_parquet(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    format: str = "parquet",
) -> dict:
    """Write ``ds`` as ``out_dir/<col>=<token>/data.<ext>``, one
    atomic commit per partition value; reruns skip committed partitions.

    ``format``: ``"parquet"`` (columnar, default) or ``"jsonl"`` (one
    JSON object per row — the interchange format most text-pipeline
    consumers expect).  Same resume contract for both.

    Returns ``{"written": n_new_partitions, "skipped": n_already_done}``.
    Partition count should be cluster-scale (key ranges, dates, shards,
    buckets) — the driver holds one token string per partition.
    """
    if format not in ("parquet", "jsonl"):
        raise ValueError(f"format must be 'parquet' or 'jsonl', got {format!r}")
    if "__part_token" in (ds.schema().names or []):
        raise ValueError("column name '__part_token' is reserved by the sink")
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)
    done_arr = pa.array(sorted(done), pa.string())

    def tokenize_and_drop(t: pa.Table) -> pa.Table:
        # The groupby key is the TOKEN, not the raw value: tokens are
        # never null (Ray's sort shuffle cannot range-partition a null
        # key), and deriving them once here keeps the resume filter and
        # the commit directory name from ever disagreeing.  Token
        # derivation is per DISTINCT value in the batch (dictionary-
        # sized), vectorized back over the rows.
        col = pc.cast(t[partition_col], pa.string()).combine_chunks()
        denc = col.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        toks = pa.array([_part_token(v) for v in denc.dictionary.to_pylist()],
                        pa.string())
        idx = denc.indices
        if len(toks):
            tok_col = toks.take(pc.fill_null(idx, 0))
            if idx.null_count:
                tok_col = pc.if_else(pc.is_null(idx),
                                     pa.scalar(_part_token(None)), tok_col)
        else:  # all-null batch
            tok_col = pa.array([_part_token(None)] * len(col), pa.string())
        t = t.append_column("__part_token", tok_col)
        if len(done):
            t = t.filter(pc.invert(
                pc.is_in(t["__part_token"], value_set=done_arr)))
        # parquet-read tables carry schema metadata, which is unhashable
        # and makes the hash-shuffle log "Failed to hash the schemas"
        return t.replace_schema_metadata(None)

    def commit(g: pa.Table) -> pa.Table:
        if not g.num_rows:  # bypassed empty shuffle partition
            return pa.table({"partition": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        token = g["__part_token"][0].as_py()
        g = g.drop_columns(["__part_token"])
        pdir = os.path.join(out_dir, f"{partition_col}={token}")
        os.makedirs(pdir, exist_ok=True)
        ext = "parquet" if format == "parquet" else "jsonl"
        path = os.path.join(pdir, f"data.{ext}")
        tmp = path + ".tmp"
        if format == "parquet":
            pq.write_table(g, tmp)
        else:
            # vectorized row-JSON via pandas (C-implemented serializer)
            g.to_pandas().to_json(tmp, orient="records", lines=True,
                                  force_ascii=False)
        os.replace(tmp, path)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(str(g.num_rows))
        return pa.table({"partition": pa.array([token], pa.string()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    out = (ds.map_batches(tokenize_and_drop, batch_format="pyarrow")
           .groupby("__part_token").map_groups(commit, batch_format="pyarrow"))
    written = sum(1 for _ in out.take_all() if _.get("partition"))
    return {"written": written, "skipped": len(done)}
