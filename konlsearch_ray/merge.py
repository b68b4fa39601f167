"""Merge independently built indexes into ONE global segment layout.

The north-star build "merges [per-partition posting lists] into a global
segment layout"; this module is the cross-INDEX version of that step:
two (or more) indexes built separately — different corpora, different
clusters, different days — become one index whose readers, sharded
engines, docstore, suggest table and stats behave exactly as if the
union corpus had been built in one run.

Why this is cheap here: every per-shard artifact (segment, doclens,
docstore partition, manifest) is an immutable file keyed by an
ARITHMETIC shard number ``(doc_id - 1) // shard_size``, and every
global structure (stats.json, dictionary/, suggest/) is derived from
the shards by ``build._finalize``. So a merge is:

1. **Disjoint path** (default): verify the indexes' shard sets are
   pairwise disjoint (which implies disjoint doc-id ranges at shard
   granularity) and hard-union the files, then re-finalize. Zero
   decode, zero re-encode — file copies only.
2. **Remap path** (``remap_ids=True``): shift each subsequent index's
   doc ids by a multiple of ``shard_size`` chosen to clear everything
   before it. A shard_size-multiple shift leaves every intra-shard
   structure byte-identical EXCEPT three id-bearing spots, each
   rewritten vectorized per shard: the FIRST delta-gap of every term's
   posting list (the absolute doc id — later gaps are shift-invariant),
   the ``block_last_doc`` skip metadata, and the doclens / docstore
   ``doc_id`` columns. Tombstones shift the same way.

Per-shard rewrites run as raw Ray tasks — a file-manifest-driven job
(N independent file→file rewrites) that the Dataset API has no useful
expression for. At cluster scale each task touches one shard's files;
nothing is ever all-to-all.

Preconditions (validated): identical ``shard_size``, ``id_col``,
``content_col`` and layout version across inputs. NOT validated (the
meta does not record it): the indexes must have been built with the
same analyzer — merging indexes of different analyzers silently mixes
vocabularies, exactly as it would in any segment-merging engine.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from konlsearch_ray.build import (_atomic_write_parquet, _file_sha,
                                  _finalize, _write_id_counter)
from konlsearch_ray.codec import varint_decode, varint_encode_with_sizes
from konlsearch_ray.tombstone import (TOMBSTONE_DIR, _binary_col_data,
                                      load_tombstones)


def _shard_nums(index_dir: str) -> list[int]:
    seg_dir = os.path.join(index_dir, "segments")
    return sorted(
        int(n[len("shard-"):-len(".parquet")])
        for n in (os.listdir(seg_dir) if os.path.isdir(seg_dir) else [])
        if n.endswith(".parquet"))


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        return json.load(f)


def _shift_binary_firsts(col: pa.ChunkedArray, dfs: np.ndarray,
                         id_off: int) -> pa.Array:
    """Add ``id_off`` to the FIRST delta-gap of every term's varint blob
    (the absolute doc id; later gaps are shift-invariant), in ONE fused
    decode→shift→encode pass over the whole column: the per-term blobs
    concatenate into a single gap stream (the same trick the query
    path's fused posting decode uses), the firsts sit at the df-prefix
    offsets, and the re-encoded stream slices back into per-term blobs
    by the per-value byte sizes."""
    blobs = _binary_col_data(col)  # zero-copy contiguous blob stream
    total = int(dfs.sum())
    gaps = varint_decode(blobs, total)
    first_idx = np.concatenate(([0], np.cumsum(dfs)[:-1])).astype(np.int64)
    first_idx = first_idx[dfs > 0]
    gaps = gaps.astype(np.uint64)
    gaps[first_idx] += np.uint64(id_off)
    buf, sizes = varint_encode_with_sizes(gaps)
    # Per-term byte lengths: sum of its values' sizes.
    ends = np.cumsum(dfs)
    csizes = np.concatenate(([0], np.cumsum(sizes)))
    term_bytes = csizes[ends] - csizes[ends - dfs]
    offsets = np.ascontiguousarray(
        np.concatenate(([0], np.cumsum(term_bytes))), dtype=np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(), len(dfs),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])


def _rewrite_shard(src_dir: str, out_dir: str, shard: int,
                   shard_off: int, shard_size: int) -> dict:
    """Rewrite ONE shard's segment + doclens + docstore partition +
    manifest under a doc-id shift of ``shard_off * shard_size``.
    ``shard_off == 0`` degrades to plain file copies."""
    id_off = shard_off * shard_size
    new_shard = shard + shard_off
    seg_src = os.path.join(src_dir, "segments", f"shard-{shard:06d}.parquet")
    dl_src = os.path.join(src_dir, "doclens", f"shard-{shard:06d}.parquet")
    mf_src = os.path.join(src_dir, "manifests", f"shard-{shard:06d}.json")
    seg_dst = os.path.join(
        out_dir, "segments", f"shard-{new_shard:06d}.parquet")
    dl_dst = os.path.join(out_dir, "doclens", f"shard-{new_shard:06d}.parquet")
    docs_src = os.path.join(src_dir, "docs", f"shard={shard}")
    docs_dst = os.path.join(out_dir, "docs", f"shard={new_shard}")

    with open(mf_src) as f:
        manifest = json.load(f)

    if id_off == 0:
        shutil.copy2(seg_src, seg_dst)
        shutil.copy2(dl_src, dl_dst)
        if os.path.isdir(docs_src):
            shutil.copytree(docs_src, docs_dst, dirs_exist_ok=True)
    else:
        seg = pq.read_table(seg_src)
        dfs = seg["df"].to_numpy().astype(np.int64)
        seg = seg.set_column(
            seg.schema.get_field_index("doc_ids_bin"), "doc_ids_bin",
            _shift_binary_firsts(seg["doc_ids_bin"], dfs, id_off))
        bld = seg["block_last_doc"].combine_chunks()
        shifted = pa.ListArray.from_arrays(
            bld.offsets, pc.add(bld.values, id_off))
        seg = seg.set_column(
            seg.schema.get_field_index("block_last_doc"), "block_last_doc",
            shifted)
        _atomic_write_parquet(seg, seg_dst)
        dl = pq.read_table(dl_src)
        dl = dl.set_column(dl.schema.get_field_index("doc_id"), "doc_id",
                           pc.add(dl["doc_id"], id_off))
        _atomic_write_parquet(dl, dl_dst)
        if os.path.isdir(docs_src):
            os.makedirs(docs_dst, exist_ok=True)
            for name in sorted(os.listdir(docs_src)):
                if not name.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(docs_src, name))
                t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                                 pc.add(t["doc_id"], id_off))
                _atomic_write_parquet(t, os.path.join(docs_dst, name))
        manifest = dict(manifest,
                        segment_sha256=_file_sha(seg_dst),
                        doclens_sha256=_file_sha(dl_dst))

    manifest["shard"] = new_shard
    mf_dst = os.path.join(out_dir, "manifests", f"shard-{new_shard:06d}.json")
    tmp = mf_dst + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, mf_dst)
    return manifest


def merge_indexes(index_dirs: list[str], out_dir: str,
                  remap_ids: bool = False) -> dict:
    """Merge the indexes at ``index_dirs`` into a new index at
    ``out_dir``; returns the merged stats (same dict ``build_index``
    returns). See the module docstring for the two paths; with
    ``remap_ids=False`` (default) overlapping shard ranges raise."""
    if len(index_dirs) < 2:
        raise ValueError("merge_indexes needs at least two indexes")
    if os.path.exists(os.path.join(out_dir, "stats.json")):
        raise ValueError(f"output {out_dir} already holds an index")
    metas = [_load_meta(d) for d in index_dirs]
    for key in ("shard_size", "id_col", "content_col", "store_cols",
                "version", "dedup", "sort_keys"):
        vals = {json.dumps(m.get(key)) for m in metas}
        if len(vals) != 1:
            raise ValueError(
                f"indexes disagree on index_meta[{key!r}]: {sorted(vals)}")
    shard_size = int(metas[0]["shard_size"])
    shard_sets = [_shard_nums(d) for d in index_dirs]
    for i, (d, s) in enumerate(zip(index_dirs, shard_sets)):
        if not s:
            raise ValueError(f"index {d} has no segments")

    # Per-index shard offset (multiples of shard_size in id space).
    offsets: list[int] = []
    if remap_ids:
        next_free = 0
        for s in shard_sets:
            off = max(0, next_free - s[0])
            offsets.append(off)
            next_free = s[-1] + off + 1
        # Doc id 0 is clamped into shard 0 at build time ((0-1)//size
        # floors to -1), so a SHIFTED id 0 would land one arithmetic
        # shard below its rewritten directory and break point lookups.
        # 1-based ids are the engine contract (reference id counter
        # starts at 1); enforce it exactly where the shift corrupts.
        for d, s, off in zip(index_dirs, shard_sets, offsets):
            if off == 0:
                continue
            # The lowest shard can be EMPTY (compaction after deleting
            # every doc in it leaves a 0-row file): scan forward to the
            # first shard that has rows; an all-empty index needs no
            # guard (nothing shifts into an unaddressable id).
            min_id = None
            for num in s:
                dl = os.path.join(d, "doclens", f"shard-{num:06d}.parquet")
                col = pq.read_table(dl, columns=["doc_id"])["doc_id"]
                if len(col):
                    min_id = int(pc.min(col).as_py())
                    break
            if min_id is not None and min_id < 1:
                raise ValueError(
                    f"remap_ids would shift index {d} (min doc_id "
                    f"{min_id}) — the id-0 clamp makes shifted 0-based "
                    "ids unaddressable; re-key the corpus to 1-based ids")
    else:
        offsets = [0] * len(index_dirs)
        seen: set[int] = set()
        for d, s in zip(index_dirs, shard_sets):
            overlap = seen & set(s)
            if overlap:
                raise ValueError(
                    f"index {d} reuses shard range {sorted(overlap)[:5]} — "
                    "doc-id ranges overlap; pass remap_ids=True")
            seen |= set(s)

    for sub in ("segments", "doclens", "manifests", "docs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    import ray

    rewrite = ray.remote(num_cpus=1)(_rewrite_shard)
    refs = [
        rewrite.remote(d, out_dir, shard, off, shard_size)
        for d, s, off in zip(index_dirs, shard_sets, offsets)
        for shard in s
    ]
    ray.get(refs)

    # Tombstones: union, shifted per source index.
    dead_parts = []
    for d, off in zip(index_dirs, offsets):
        dead = load_tombstones(d)
        if len(dead):
            dead_parts.append(dead + off * shard_size)
    if dead_parts:
        ts_dir = os.path.join(out_dir, TOMBSTONE_DIR)
        os.makedirs(ts_dir, exist_ok=True)
        merged_dead = np.unique(np.concatenate(dead_parts))
        _atomic_write_parquet(
            pa.table({"doc_id": pa.array(merged_dead, pa.int64())}),
            os.path.join(ts_dir, "merged-000000.parquet"))

    # index_meta: the validated-identical fields, from the first index.
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump(metas[0], f, sort_keys=True)
    # Highest ever-assigned id across inputs (keeps append semantics:
    # compacted-away ids are never reused).
    max_id = 0
    for d, off in zip(index_dirs, offsets):
        counter = os.path.join(d, "id_counter.json")
        if os.path.exists(counter):
            with open(counter) as f:
                max_id = max(max_id, int(json.load(f)["max_id"])
                             + off * shard_size)
    top = max(s[-1] + off for s, off in zip(shard_sets, offsets))
    dl_top = pq.read_table(
        os.path.join(out_dir, "doclens", f"shard-{top:06d}.parquet"),
        columns=["doc_id"])
    max_id = max(max_id, int(pc.max(dl_top["doc_id"]).as_py() or 0))
    _write_id_counter(out_dir, max_id)
    with open(os.path.join(out_dir, "_DOCS_DONE"), "w") as f:
        f.write("merged\n")
    return _finalize(out_dir)
