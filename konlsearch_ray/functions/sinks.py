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
    """Filesystem-safe token for a partition value (hive-style dirs)."""
    return _SAFE.sub(lambda m: f"%{ord(m.group(0)[0]):02X}", str(v))


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
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)
    done_arr = pa.array(sorted(done), pa.string())

    def drop_finished(t: pa.Table) -> pa.Table:
        if not len(done):
            return t
        tok = pc.cast(t[partition_col], pa.string())
        # tokens differ from raw values only for unsafe chars; re-derive
        # per distinct value in the batch (dictionary-sized)
        denc = tok.combine_chunks().dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        toks = pa.array([_part_token(v) for v in denc.dictionary.to_pylist()],
                        pa.string())
        keep_val = pc.invert(pc.is_in(toks, value_set=done_arr))
        keep = pc.take(keep_val, pc.fill_null(denc.indices, 0))
        if denc.indices.null_count:
            keep = pc.or_(keep, pc.is_null(denc.indices))
        return t.filter(keep)

    def strip_meta(t: pa.Table) -> pa.Table:
        # parquet-read tables carry schema metadata, which is unhashable
        # and makes the hash-shuffle log "Failed to hash the schemas"
        return t.replace_schema_metadata(None)

    def commit(g: pa.Table) -> pa.Table:
        if not g.num_rows:  # bypassed empty shuffle partition
            return pa.table({"partition": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        token = _part_token(g[partition_col][0].as_py())
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

    out = (ds.map_batches(drop_finished, batch_format="pyarrow")
           .map_batches(strip_meta, batch_format="pyarrow")
           .groupby(partition_col).map_groups(commit, batch_format="pyarrow"))
    written = sum(1 for _ in out.take_all() if _.get("partition"))
    return {"written": written, "skipped": len(done)}
