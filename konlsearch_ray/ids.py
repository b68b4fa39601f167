"""Deterministic dense doc-ID assignment (sort + block-count prefix-sum).

Replaces the reference's lock-guarded persisted ``last_document_id`` counter
(reference index.py:28, 309-314, lock.py:9-18 — the single global write
bottleneck, SURVEY.md ST2/ST3) with a parallelism-independent scheme:

1. global ``sort(sort_keys)`` (the canonical order, FIXTURES.md F2),
2. a metadata-only prefix-sum over the sorted blocks' row counts
   (the one driver barrier in the whole build — it touches only block
   *metadata*, never block data, so it is O(num_blocks) at any scale),
3. one remote task per block appending ``doc_id = offset + arange(n)``.

Requires the sort keys to be unique per row (guaranteed after exact dedup);
otherwise tie order — and hence IDs — would be backend-dependent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _add_ids_block(block: pa.Table, offset: int, id_col: str) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
    return block.append_column(id_col, ids)


def assign_doc_ids(
    ds: ray.data.Dataset,
    sort_keys: list[str],
    id_col: str = "doc_id",
    start: int = 1,
) -> ray.data.Dataset:
    """Sorted dataset → same rows + dense ``id_col`` starting at ``start``."""
    sorted_ds = ds.sort(sort_keys)
    mat = sorted_ds.materialize()
    block_refs: list = []
    counts: list[int] = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            block_refs.append(ref)
            counts.append(meta.num_rows)
    offsets = start + np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    out_refs = [
        _add_ids_block.remote(ref, int(off), id_col)
        for ref, off in zip(block_refs, offsets)
    ]
    if not out_refs:
        # Empty input: preserve schema + id column.
        empty = pa.table({id_col: pa.array([], pa.int64())})
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(out_refs)
