"""Distributed k-means over an embedding column (Lloyd's algorithm).

The iterative-algorithm shape for Ray Data: per iteration the ONLY
driver-side state is the k×d centroid matrix.  Each block reduces to
per-cluster partial sums/counts inside ``map_batches`` (O(k·d) rows per
block, independent of block size); the driver folds those partials and
broadcasts the next centroids with ``ray.put``.  The corpus itself never
shuffles and never lands on the driver — at 100 TB each iteration is one
streaming pass.

Complements ``similarity.build_ivf_store``'s sample-fitted coarse
quantizer: use this when the quantizer must be fitted on the FULL
dataset rather than a driver-side sample.

Determinism: init is the embeddings of the k smallest IDs; distances
are computed per-centroid with vectorized subtract/square (no BLAS gemm,
whose summation order varies by thread count); partial sums accumulate
in float64 and fold on the driver in a FIXED order (sorted by each
partial's smallest row id), so reruns on the same block layout are
bit-identical.  A different partitioning regroups the float partial
sums and may differ in the last ulp (it does not in practice unless a
point sits exactly between centroids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy flat read."""
    col = t[vec_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, len(flat) // n).astype(np.float64)


def _assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmin cluster per row — per-centroid vectorized loop, k small;
    deterministic regardless of BLAS threading."""
    best = np.full(len(x), np.inf)
    idx = np.zeros(len(x), dtype=np.int64)
    for j in range(len(c)):
        d = x - c[j]
        dist = np.einsum("ij,ij->i", d, d)
        take = dist < best
        best[take] = dist[take]
        idx[take] = j
    return idx


def kmeans_fit(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    k: int,
    n_iter: int = 5,
) -> np.ndarray:
    """Fit k centroids over the full dataset; returns the (k, d) matrix.

    Init = embeddings of the k smallest ``id_col`` values (deterministic,
    engine-independent).  Empty clusters keep their previous centroid.
    """
    from konlsearch_ray.functions.stats import global_topk

    seed = (global_topk(ds.select_columns([id_col, vec_col]),
                        [(id_col, "ascending")], k)
            .take_all())
    seed.sort(key=lambda r: r[id_col])
    c = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in seed])
    if len(c) < k:
        raise ValueError(f"dataset has fewer than k={k} rows")

    for _ in range(n_iter):
        c_ref = ray.put(c)

        def partial(t: pa.Table) -> pa.Table:
            cc = ray.get(c_ref)
            x = _batch_matrix(t, vec_col)
            a = _assign(x, cc)
            sums = np.zeros_like(cc)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(cc)).astype(np.int64)
            anchor = int(t[id_col][0].as_py())
            return pa.table({
                "anchor": pa.array([anchor] * len(cc), pa.int64()),
                "cluster": pa.array(np.arange(len(cc)), pa.int64()),
                "count": pa.array(counts, pa.int64()),
                "sum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).take_all())
        rows.sort(key=lambda r: (r["cluster"], r["anchor"]))
        sums = np.zeros_like(c)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:  # O(k · blocks) — driver holds partials only
            j = r["cluster"]
            sums[j] += np.asarray(r["sum"], dtype=np.float64)
            counts[j] += r["count"]
        nz = counts > 0
        c = np.where(nz[:, None], sums / np.maximum(counts, 1)[:, None], c)
    return c


def kmeans_assign(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    k: int,
    n_iter: int = 5,
) -> ray.data.Dataset:
    """Fit (full-data Lloyd's) then assign: one extra streaming pass
    emitting ``(id_col, cluster)``."""
    c_ref = ray.put(kmeans_fit(ds, vec_col, id_col, k, n_iter))

    def assign(t: pa.Table) -> pa.Table:
        cc = ray.get(c_ref)
        a = _assign(_batch_matrix(t, vec_col), cc)
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "cluster": pa.array(a, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")
