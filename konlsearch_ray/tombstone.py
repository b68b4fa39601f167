"""Document deletion: tombstone table + segment-rewrite compaction.

The reference deletes a document inline — removing its docstore row,
token set, hash entry and every posting entry under a global lock
(reference index.py:332-356, inverted_index.py:41-48, 89-95 — SURVEY.md
SO5). Immutable segments can't be point-updated, so the Ray-native design
is the standard two-phase one:

1. **delete_docs** — append the doc IDs to an append-only ``tombstones/``
   Parquet table (cheap, no segment touched). ``IndexReader`` masks
   tombstoned docs out of every posting list at decode time, so Boolean,
   PHRASE and BM25 results exclude them immediately; BM25 collection
   stats (N, avgdl) are recomputed over live docs at reader open.
2. **compact_index** — a Ray job that rewrites each shard's segment and
   doclens files without the tombstoned entries (one task per shard — the
   shard is the unit of parallelism and of resume), refreshes manifests,
   dictionary and stats, then clears the tombstone table.

Re-indexing content equal to a deleted doc assigns a fresh ID on the next
build — the reference behaves the same after delete (Q3,
test_konlsearch.py:345-356).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOMBSTONE_DIR = "tombstones"


def delete_docs(index_dir: str, doc_ids: list[int]) -> int:
    """Append doc IDs to the tombstone table. Returns count appended."""
    if not doc_ids:
        return 0
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    os.makedirs(d, exist_ok=True)
    t = pa.table({"doc_id": pa.array(sorted(set(int(x) for x in doc_ids)),
                                     pa.int64())})
    name = f"batch-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(d, "." + name + ".tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(d, name))
    return t.num_rows


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc IDs (empty array if none)."""
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    if not os.path.isdir(d):
        return np.array([], dtype=np.int64)
    parts = [
        pq.read_table(os.path.join(d, n))["doc_id"].to_numpy()
        for n in sorted(os.listdir(d)) if n.endswith(".parquet")
    ]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(parts)).astype(np.int64)


def _rewrite_shard(batch: pa.Table, index_dir: str, dead: np.ndarray) -> pa.Table:
    """Task body: rewrite one shard's segment + doclens without dead docs."""
    from konlsearch_ray.build import SEGMENT_SCHEMA, _atomic_write_parquet, _file_sha
    from konlsearch_ray.codec import decode_doc_ids, decode_positions, decode_tfs, encode_posting

    out_rows = []
    for shard in batch["shard"].to_pylist():
        seg_path = os.path.join(index_dir, "segments", f"shard-{shard:06d}.parquet")
        dl_path = os.path.join(index_dir, "doclens", f"shard-{shard:06d}.parquet")
        seg = pq.read_table(seg_path)
        rows = {k: [] for k in SEGMENT_SCHEMA.names}
        for i in range(seg.num_rows):
            df = seg["df"][i].as_py()
            ids = decode_doc_ids(seg["doc_ids_bin"][i].as_py(), df)
            tfs = decode_tfs(seg["tfs_bin"][i].as_py(), df)
            poss = decode_positions(seg["pos_bin"][i].as_py(), df)
            keep = ~np.isin(ids, dead, assume_unique=True)
            if not keep.any():
                continue  # term vanishes from this shard
            enc = encode_posting(ids[keep], tfs[keep], poss[keep])
            rows["term"].append(seg["term"][i].as_py())
            for k in ("df", "cf", "doc_ids_bin", "tfs_bin", "pos_bin",
                      "block_last_doc", "block_max_tf"):
                rows[k].append(enc[k])
        new_seg = pa.table(rows, schema=SEGMENT_SCHEMA)
        _atomic_write_parquet(new_seg, seg_path)

        dl = pq.read_table(dl_path)
        dl_ids = dl["doc_id"].to_numpy()
        dl_keep = ~np.isin(dl_ids, dead, assume_unique=True)
        new_dl = dl.filter(pa.array(dl_keep))
        _atomic_write_parquet(new_dl, dl_path)

        manifest = {
            "shard": int(shard),
            "n_docs": int(new_dl.num_rows),
            "n_terms": int(new_seg.num_rows),
            "total_tokens": int(pc.sum(new_dl["doc_len"]).as_py() or 0),
            "segment_sha256": _file_sha(seg_path),
            "doclens_sha256": _file_sha(dl_path),
            "version": 1,
        }
        mf_dir = os.path.join(index_dir, "manifests")
        tmp = os.path.join(mf_dir, f".shard-{shard:06d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, os.path.join(mf_dir, f"shard-{shard:06d}.json"))
        out_rows.append(int(shard))
    return pa.table({"shard": pa.array(out_rows, pa.int64())})


def compact_index(index_dir: str) -> dict:
    """Physically remove tombstoned docs from every shard, refresh stats
    and dictionary, clear the tombstone table. Returns the new stats."""
    import ray
    import ray.data

    from konlsearch_ray.build import _finalize, _max_doc_id, _write_id_counter

    dead = load_tombstones(index_dir)
    if len(dead) == 0:
        return _finalize(index_dir)
    # Persist the id high-water mark BEFORE rows leave the docstore, so a
    # compacted-away top shard can never cause doc-id reuse on append
    # (the reference's counter is monotone, index.py:20-23).
    _write_id_counter(index_dir, _max_doc_id(
        index_dir, os.path.join(index_dir, "docs")))
    seg_dir = os.path.join(index_dir, "segments")
    shards = sorted(
        int(n[len("shard-"):-len(".parquet")])
        for n in os.listdir(seg_dir) if n.endswith(".parquet"))
    dead_ref = ray.put(dead)

    def task(batch: pa.Table) -> pa.Table:
        return _rewrite_shard(batch, index_dir, ray.get(dead_ref))

    (ray.data.from_arrow(pa.table({"shard": pa.array(shards, pa.int64())}))
     .map_batches(task, batch_format="pyarrow", batch_size=1)
     .materialize())

    # Also drop tombstoned rows from the docstore partitions.
    docs_dir = os.path.join(index_dir, "docs")
    for name in sorted(os.listdir(docs_dir)):
        sub = os.path.join(docs_dir, name)
        if not os.path.isdir(sub) or not name.startswith("shard="):
            continue
        for fn in sorted(os.listdir(sub)):
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(sub, fn)
            t = pq.read_table(p)
            keep = ~np.isin(t["doc_id"].to_numpy(), dead)
            if keep.all():
                continue
            tmp = p + ".tmp"
            pq.write_table(t.filter(pa.array(keep)), tmp, compression="zstd")
            os.replace(tmp, p)

    stats = _finalize(index_dir)
    ts_dir = os.path.join(index_dir, TOMBSTONE_DIR)
    for n in os.listdir(ts_dir):
        os.remove(os.path.join(ts_dir, n))
    os.rmdir(ts_dir)
    return stats
