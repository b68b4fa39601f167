"""Broadcast lookup join — small-side enrichment without a shuffle.

The canonical 100-TB pattern: a dimension table that fits in memory
(countries, licenses, source metadata, label maps) must NOT trigger an
all-to-all exchange of the big side.  The small side is ``ray.put`` into
the object store ONCE; each map task resolves it zero-copy from the
node-local object store (one inter-node transfer per node) and every
batch resolves keys with one hashed ``pc.index_in`` kernel — the big
side never moves.

Contrast with ``Dataset.join`` (used in the dedup/curation pipelines
where BOTH sides are large): that is a hash-partitioned exchange of both
inputs.  Use this operator whenever one side is O(dimension).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_lookup_join(
    ds: ray.data.Dataset,
    right: pa.Table,
    left_key: str,
    right_key: str,
    take_cols: list[str] | None = None,
    how: str = "left",
) -> ray.data.Dataset:
    """Enrich ``ds`` with columns from the small table ``right``.

    ``right[right_key]`` must be unique (dimension-table contract —
    checked here, on the driver, where the table is O(dimension)).
    ``how="left"`` attaches nulls for unmatched keys; ``"inner"`` drops
    those rows.  The big side streams; only ``right`` is broadcast.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if take_cols is None:
        take_cols = [c for c in right.column_names if c != right_key]
    overlap = set(take_cols) & set(ds.schema().names)
    if overlap:
        raise ValueError(f"take_cols collide with left columns: {sorted(overlap)}")
    n_distinct = len(pc.unique(right[right_key]))
    if n_distinct != right.num_rows:
        raise ValueError(
            f"right key {right_key!r} is not unique "
            f"({right.num_rows} rows, {n_distinct} distinct)")
    # Broadcast ONCE; every task's ray.get resolves zero-copy from the
    # node-local object store (one inter-node transfer per node).
    right_ref = ray.put(right.select([right_key, *take_cols]).combine_chunks())

    def lookup(batch: pa.Table) -> pa.Table:
        dim: pa.Table = ray.get(right_ref)
        idx = pc.index_in(batch[left_key], value_set=dim[right_key])
        if how == "inner":
            sel = pc.is_valid(idx)
            batch = batch.filter(sel)
            idx = idx.filter(sel)
        for name in take_cols:
            batch = batch.append_column(name, pc.take(dim[name], idx))
        return batch.replace_schema_metadata(None)

    return ds.map_batches(lookup, batch_format="pyarrow")
