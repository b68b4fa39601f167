"""Token-window document chunking — row-expanding, fully vectorized.

Long documents become overlapping fixed-token-count chunks (the standard
pre-embedding / pre-training context-window step).  Chunking is pure
per-row work, so it is a single ``map_batches`` stage: no shuffle, no
state, linear in input bytes — the ideal 100-TB operator shape.

The kernel never loops over rows: one ``pc.split_pattern`` pass builds
the token list array, numpy offset arithmetic (repeat + cumsum) builds a
flat gather-index array for EVERY chunk's tokens at once, and one
``pc.binary_join`` re-materializes the chunk strings.

Tokenization here is plain single-space splitting (not the index
analyzer) so the DuckDB oracle (``string_split(text, ' ')`` + list
slicing) reproduces the output bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def chunk_tokens(
    ds: ray.data.Dataset,
    content_col: str,
    id_col: str,
    window: int,
    stride: int,
) -> ray.data.Dataset:
    """Split each document into whitespace-token windows.

    A doc with ``n`` tokens yields ``1`` chunk if ``n <= window`` else
    ``(n - window + stride - 1) // stride + 1`` chunks; chunk ``k``
    covers tokens ``[k*stride, min(k*stride + window, n))`` (the last
    chunk may be short).  Output: ``id_col``, ``chunk_id``, ``n_tokens``,
    ``chunk`` — one row per chunk.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_table(batch, content_col, id_col, window, stride)

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_table(batch: pa.Table, content_col: str, id_col: str,
                window: int, stride: int) -> pa.Table:
    """Pure per-table chunking kernel (the map_batches body) — exposed
    for property tests and composition."""
    col = batch[content_col].combine_chunks()
    if col.null_count:
        raise ValueError(f"{content_col} must be non-null for chunking")
    toks = pc.split_pattern(col, pattern=" ")
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    n = np.diff(offsets)
    n_chunks = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)
    total_chunks = int(n_chunks.sum())
    row_rep = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    k_local = (np.arange(total_chunks, dtype=np.int64)
               - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
    starts = k_local * stride
    ends = np.minimum(starts + window, n[row_rep])
    lens = ends - starts
    chunk_off = np.concatenate(([0], np.cumsum(lens)))
    # gather index of every chunk token in the flat values array
    idx = (np.repeat(offsets[row_rep] + starts, lens)
           + np.arange(chunk_off[-1], dtype=np.int64)
           - np.repeat(chunk_off[:-1], lens))
    taken = pc.take(values, pa.array(idx, pa.int64()))
    if isinstance(taken, pa.ChunkedArray):
        taken = taken.combine_chunks()
    # int64 (large-list) offsets: a batch of long docs can expand past
    # 2^31 total chunk tokens, which int32 offsets would refuse.
    chunk_list = pa.LargeListArray.from_arrays(
        pa.array(chunk_off, pa.int64()), taken)
    return pa.table({
        id_col: pc.take(batch[id_col], pa.array(row_rep, pa.int64())),
        "chunk_id": pa.array(k_local, pa.int64()),
        "n_tokens": pa.array(lens, pa.int64()),
        "chunk": pc.binary_join(chunk_list, " "),
    })
