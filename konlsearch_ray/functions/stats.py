"""Grouped numeric profiling: exact discrete quantiles per key.

The quantile spec is deliberately integer-indexed — ``q`` in basis
points picks ``sorted_values[(n-1) * q_bp // 10000]`` — so any engine
(numpy, SQL row_number arithmetic) reproduces the result bit-identically
with no interpolation or float round-mode ambiguity.

Scale note: exact quantiles need each key's values co-located, so this
is a ``groupby(key).map_groups`` stage — the standard keyed-shuffle
assumption (one key's values fit one task, same contract as any
map_groups). For keys too hot for that, bucket values into a fixed-point
histogram inside ``map_batches`` and aggregate histograms instead; the
exact path here is the oracle-comparable configuration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from konlsearch_ray.functions.blocks import (arrow_schema as _arrow_schema,
                                             nonempty_blocks)

DEFAULT_QS = (("p50", 5000), ("p90", 9000), ("p99", 9900))


def grouped_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[tuple[str, int], ...] = DEFAULT_QS,
) -> ray.data.Dataset:
    """Per-key exact discrete quantiles of ``value_col``.

    Output: ``key_col``, ``n`` (group row count), one float64 column per
    ``(label, q_bp)`` entry holding ``sorted[(n-1) * q_bp // 10000]``.
    """
    labels = [lb for lb, _ in qs]
    bps = np.array([bp for _, bp in qs], dtype=np.int64)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        cols: dict[str, object] = {
            key_col: pd.Series([], dtype=g[key_col].dtype),
            "n": pd.Series([], dtype="int64"),
        }
        for lb in labels:
            cols[lb] = pd.Series([], dtype="float64")
        if not len(g):
            return pd.DataFrame(cols)
        # Nulls are not values (SQL quantile semantics): NaN would sort
        # to the end and both shift the real quantiles and land the top
        # ones on NaN.
        raw = g[value_col].to_numpy().astype(np.float64)
        v = np.sort(raw[~np.isnan(raw)])
        n = len(v)
        if not n:  # all-null group: emit nothing for it
            return pd.DataFrame(cols)
        idx = (n - 1) * bps // 10_000
        out = {key_col: [g[key_col].iloc[0]], "n": [n]}
        for lb, i in zip(labels, idx):
            out[lb] = [float(v[i])]
        return pd.DataFrame(out)

    out = ds.groupby(key_col).map_groups(emit, batch_format="pandas")
    return nonempty_blocks(out, tuple([key_col, "n"] + labels))


def global_topk(
    ds: ray.data.Dataset,
    sort_keys: list[tuple[str, str]],
    k: int,
) -> ray.data.Dataset:
    """Global top-k rows WITHOUT a global sort.

    ``Dataset.sort(...).limit(k)`` range-shuffles every block; for a
    top-k that is pure waste.  Here each block reduces to its own top-k
    inside ``map_batches`` (one ``pc.sort_indices`` + ``take`` per
    block), and the surviving ``k × n_blocks`` rows — k rows per block,
    independent of data size — collapse in one final merge task
    (``repartition(1)``).  At 100 TB the exchange volume is O(k·blocks)
    rows instead of the whole table.

    ``sort_keys``: ``[(col, "ascending"|"descending"), ...]``; include a
    unique tie-break column (e.g. the ID) for deterministic output.
    """

    def topk(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)[:k]
        return t.take(idx).replace_schema_metadata(None)

    partial = ds.map_batches(topk, batch_format="pyarrow", batch_size=None)
    return partial.repartition(1).map_batches(topk, batch_format="pyarrow",
                                              batch_size=None)


def winsorize(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    lo_bp: int = 100,
    hi_bp: int = 9900,
) -> ray.data.Dataset:
    """Per-key winsorization: clip ``value_col`` to its key's exact
    discrete [lo_bp, hi_bp] basis-point quantiles — the outlier-taming
    normalization quality-score and reward columns get before training.

    Two bounded stages: the per-key quantile bounds come from
    :func:`grouped_quantiles` (one keyed exchange of values, O(keys)
    result), broadcast via ``ray.put``; the clip itself is a single
    vectorized map pass (the raw stream never shuffles for the clip).
    Null values pass through as null (SQL semantics: they are not
    values, so they neither shift the quantiles nor get clipped).
    ``key_col`` must be non-null (same contract as
    ``grouped_quantiles`` — Ray's sort-shuffle groupby cannot range-
    partition a null key). Output: ``id_col``, ``key_col``, ``v_clip``
    (float64).
    """
    import ray as _ray

    if not (0 <= lo_bp <= hi_bp <= 10_000):
        raise ValueError("need 0 <= lo_bp <= hi_bp <= 10000")
    bounds = grouped_quantiles(
        ds, key_col, value_col,
        qs=(("lo", lo_bp), ("hi", hi_bp))).to_pandas()
    ktyp = _arrow_schema(ds).field(key_col).type
    if not len(bounds):
        # Every value is null (grouped_quantiles emits nothing): all
        # rows pass through with null v_clip — the 0-row fallback frame
        # loses its columns/types through to_pandas, so don't index it.
        def passthru(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t[id_col].cast(pa.int64()),
                key_col: t[key_col],
                "v_clip": pa.nulls(t.num_rows, pa.float64()),
            })

        return ds.map_batches(passthru, batch_format="pyarrow")
    bt = pa.table({
        key_col: pa.array(bounds[key_col]).cast(ktyp),
        "lo": pa.array(bounds["lo"].astype(np.float64)),
        "hi": pa.array(bounds["hi"].astype(np.float64)),
    })
    ref = _ray.put(bt)

    def clip(t: pa.Table) -> pa.Table:
        b: pa.Table = _ray.get(ref)
        idx = pc.index_in(t[key_col], value_set=b[key_col])
        lo = pc.take(b["lo"], idx).to_numpy(zero_copy_only=False)
        hi = pc.take(b["hi"], idx).to_numpy(zero_copy_only=False)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        clipped = np.minimum(np.maximum(v, lo), hi)
        vcol = pc.if_else(pc.is_valid(t[value_col]), pa.array(clipped),
                          pa.nulls(t.num_rows, pa.float64()))
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            key_col: t[key_col],
            "v_clip": vcol,
        })

    return ds.map_batches(clip, batch_format="pyarrow")
