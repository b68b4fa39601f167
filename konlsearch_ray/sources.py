"""Input sources beyond Parquet — reference S5 parity.

The reference's integration corpus is a titles file read line by line with
``_`` → space and newline strip (reference test/kowiki.py:19-33). The Ray
mapping: ``ray.data.read_text`` → a vectorized normalizer batch, yielding
the ``content`` column the build pipeline expects (plus synthesized
``repo``/``path``/``commit`` keys so canonical ID assignment works on
line corpora too).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def read_line_corpus(
    path: str,
    repo: str = "lines",
    commit: str = "0" * 40,
) -> ray.data.Dataset:
    """Line-per-document corpus → Dataset with the build input schema.

    Each line is one document; ``_`` becomes a space (kowiki.py:27-30).
    ``path`` is the 1-based line number (zero-padded so canonical sort
    order == file order), giving deterministic doc IDs.
    """
    ds = ray.data.read_text(path)

    def norm(batch: pa.Table) -> pa.Table:
        text = pc.replace_substring(batch["text"], "_", " ")
        n = batch.num_rows
        return pa.table({
            "repo": pa.array([repo] * n),
            "path": pa.array([""] * n),  # filled below with line numbers
            "commit": pa.array([commit] * n),
            "lang": pa.array(["text"] * n),
            "content": text.cast(pa.large_string()),
        })

    normed = ds.map_batches(norm, batch_format="pyarrow")

    # Line numbers need a global offset — reuse the driver-rank trick:
    # materialize, then per-block offset from metadata (cheap, no shuffle).
    import numpy as np
    import ray as _ray

    mat = normed.materialize()
    refs, counts = [], []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
                counts.append(meta.num_rows)

    @_ray.remote
    def add_path(block: pa.Table, offset: int) -> pa.Table:
        nums = [f"line-{offset + i:012d}" for i in range(block.num_rows)]
        return block.set_column(
            block.schema.get_field_index("path"), "path",
            pa.array(nums, pa.string()))

    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    out = [add_path.remote(r, int(o) + 1) for r, o in zip(refs, offsets)]
    if not out:
        return normed
    return ray.data.from_arrow_refs(out)


def read_parquet_clean(paths, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata stripped
    at the source (``schema=...remove_metadata()``): blocks then carry
    hashable schemas, so downstream hash-shuffle operators (groupby /
    join) stop logging "Failed to hash the schemas" from every read
    worker — noise no driver-side logging filter can reach."""
    import pyarrow.parquet as pq
    import ray.data

    first = (paths[0] if paths else None) if isinstance(
        paths, (list, tuple)) else paths
    if first is not None and os.path.isdir(first):
        cands = [n for n in sorted(os.listdir(first))
                 if n.endswith(".parquet")]
        first = os.path.join(first, cands[0]) if cands else None
    if first is not None and os.path.isfile(first):
        sch = pq.read_schema(first).remove_metadata()
        if columns is not None:
            # with a column projection, Ray expects the schema of the
            # SELECTED columns (in projection order), not the full file
            sch = pa.schema([sch.field(c) for c in columns])
        kwargs.setdefault("schema", sch)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def normalize_corpus(
    ds: ray.data.Dataset,
    content_col: str,
    id_col: str | None = None,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Map an arbitrary-schema Dataset onto the build input schema:
    ``content: large_string`` plus either the caller's id column renamed
    to ``doc_id`` (use ``IndexConfig(id_col='doc_id')``) or the original
    key columns for canonical sort-key ID assignment."""

    # keep_cols must not shadow the synthesized output columns — a raw
    # 'doc_id'/'content' column would silently replace the just-normalized
    # id/content values.
    clash = {c for c in (keep_cols or []) if c in ("content", "doc_id")
             and c not in (content_col, id_col)}
    if clash:
        raise ValueError(
            f"keep_cols {sorted(clash)} collide with the normalized output "
            f"columns; rename them upstream or map them via "
            f"content_col/id_col")

    def norm(batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "content": batch[content_col].cast(pa.large_string())}
        if id_col is not None:
            cols["doc_id"] = batch[id_col].cast(pa.int64())
        for c in keep_cols or []:
            if c not in (content_col, id_col):
                cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(norm, batch_format="pyarrow")


def read_jsonl_corpus(
    path: str,
    content_col: str = "text",
    id_col: str | None = None,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """JSON-lines corpus (the common training-data interchange format) →
    build-schema Dataset. ``ray.data.read_json`` streams and splits files
    across tasks; only the mapped columns survive the normalize pass."""
    return normalize_corpus(
        ray.data.read_json(path), content_col, id_col, keep_cols)


def read_csv_corpus(
    path: str,
    content_col: str = "text",
    id_col: str | None = None,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """CSV corpus → build-schema Dataset (``ray.data.read_csv``)."""
    return normalize_corpus(
        ray.data.read_csv(path), content_col, id_col, keep_cols)
