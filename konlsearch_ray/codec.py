"""Delta-gap + varint posting-list codec, numpy-vectorized.

Replaces the reference's one-RocksDB-key-per-(token, doc) posting storage
(reference set.py:82-85, inverted_index.py:33-36) with the standard
compressed-segment layout: doc IDs sorted ascending, delta-gap encoded,
LEB128 varints; tf / position streams varint-encoded in doc order.

Encode and decode are both vectorized (no per-int Python loop):
- encode: compute per-value byte widths, allocate one output buffer,
  scatter the 7-bit groups with numpy arithmetic;
- decode: locate varint terminators via the continuation-bit mask,
  reduce 7-bit groups per value with a small fixed loop over byte lanes
  (≤ 10 lanes for 64-bit values).

Block-max metadata (``block_last_doc``, ``block_max_tf`` per
``BLOCK_SIZE``-entry block) supports block-skip / block-max-WAND pruning
at query time.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # Bytes needed per value: ceil(bitlen/7), min 1.
    nbits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 on float is unsafe near 2^53; use a loop over shifts.
    tmp = v.copy()
    while True:
        live = tmp > 0
        if not live.any():
            break
        nbits[live] += 1
        tmp = tmp >> np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    total = int(offsets[-1])
    out = np.zeros(total, dtype=np.uint8)
    # Lane k writes byte k of every value that has > k bytes.
    max_lanes = int(nbytes.max())
    for k in range(max_lanes):
        mask = nbytes > k
        idx = offsets[:-1][mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 buffer → uint64 array, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = len(ends)
    if count is not None and n != count:
        raise ValueError(f"varint stream has {n} values, expected {count}")
    values = np.zeros(n, dtype=np.uint64)
    lens = ends - starts + 1
    max_lanes = int(lens.max())
    for k in range(max_lanes):
        mask = lens > k
        byte = raw[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)
        values[mask] |= byte << np.uint64(7 * k)
    return values


def encode_posting(
    doc_ids: np.ndarray, tfs: np.ndarray, positions: np.ndarray
) -> dict:
    """Encode one term's posting list (doc_ids must be sorted ascending).

    Returns the segment-row payload: binary blobs + block-max metadata.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if doc_ids.size and np.any(np.diff(doc_ids) <= 0):
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.diff(doc_ids, prepend=np.int64(0)).astype(np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    positions = np.ascontiguousarray(positions, dtype=np.uint64)
    n = len(doc_ids)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE if n else 0
    block_last = [int(doc_ids[min((b + 1) * BLOCK_SIZE, n) - 1]) for b in range(nblocks)]
    block_max_tf = [
        int(tfs[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE].max()) for b in range(nblocks)
    ]
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "doc_ids_bin": varint_encode(gaps),
        "tfs_bin": varint_encode(tfs),
        "pos_bin": varint_encode(positions),
        "block_last_doc": block_last,
        "block_max_tf": block_max_tf,
    }


def decode_doc_ids(blob: bytes, df: int) -> np.ndarray:
    gaps = varint_decode(blob, df)
    return np.cumsum(gaps.astype(np.int64))


def decode_tfs(blob: bytes, df: int) -> np.ndarray:
    return varint_decode(blob, df).astype(np.int32)


def decode_positions(blob: bytes, df: int) -> np.ndarray:
    return varint_decode(blob, df).astype(np.int32)
