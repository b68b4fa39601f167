"""Shared Dataset block-ref utilities.

``nonempty_blocks`` works around a Ray Data landmine: empty
shuffle/aggregate partitions emit 0-row blocks that BYPASS map UDFs
entirely, so they reach downstream operators with empty (or stale
upstream) schemas, which the hash-join operator rejects ("No match for
FieldRef"). Rebuilding the dataset from its non-empty block refs moves
only refs to the driver — the blocks stay in the object store.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def nonempty_blocks(
    ds: ray.data.Dataset, cols: tuple[str, ...]
) -> ray.data.Dataset:
    """Rebuild a dataset from its non-empty Arrow block refs (refs only —
    no data moves). Falls back to one empty int64-typed block carrying
    ``cols`` when nothing survives."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow(
            pa.table({c: pa.array([], pa.int64()) for c in cols}))
    return ray.data.from_arrow_refs(refs)
