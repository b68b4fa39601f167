"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k as the exact baseline: the (small) query matrix is
broadcast once with ``ray.put`` and every batch does one numpy matmul
against it — no shuffle at all. The scale path (`lsh_bucketed_pairs`)
buckets vectors by random-hyperplane LSH signs so the all-pairs step only
runs within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k neighbors (self excluded) for each query vector.

    Two passes: (1) stream once to collect the query vectors (a filter —
    cheap), broadcast them; (2) ``map_batches`` matmul producing per-batch
    partial top-k, merged on the driver (partials are k rows per query per
    batch — tiny). Ties broken by ascending neighbor id via lexsort.
    """
    qset = set(int(q) for q in query_ids)
    q_rows = ds.filter(
        expr=f"{id_col} in {sorted(qset)}"
    ).to_pandas()
    q_ids = q_rows[id_col].to_numpy().astype(np.int64)
    q_mat = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in q_rows[vec_col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_ref = ray.put((q_ids, q_mat))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, vec_col))
        sims = qm @ m.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for i in range(len(qi)):
            s = sims[i].copy()
            s[ids == qi[i]] = -np.inf  # exclude self
            top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out_q.extend([qi[i]] * len(top))
            out_n.extend(ids[top])
            out_s.extend(s[top])
        return pa.table(
            {"qid": pa.array(out_q, pa.int64()),
             "neighbor": pa.array(out_n, pa.int64()),
             "cos": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for q in q_ids:
        sub = parts[parts["qid"] == q]
        idx = np.lexsort((sub["neighbor"].to_numpy(), -sub["cos"].to_numpy()))[:k]
        sub = sub.iloc[idx].reset_index(drop=True)
        sub["rk"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        out.append(sub)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"qid": [], "neighbor": [], "cos": [], "rk": []})
    res["cos"] = res["cos"].round(4)
    return pa.Table.from_pandas(res, preserve_index=False)


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 13,
    lloyd_iters: int = 3,
) -> pa.Table:
    """IVF (inverted-file) approximate top-k — the scale path for ANN.

    Coarse quantizer: k-means centroids fitted on a driver-side sample
    (a few Lloyd iterations — centroids are tiny and broadcast via
    ``ray.put``). Every batch assigns its vectors to their nearest
    centroid and emits per-batch partial top-k only for vectors whose
    centroid is among each query's ``n_probe`` closest — so each batch
    does one matmul against the queries but scores only the probed
    subset. With ``n_probe == n_centroids`` results are exact (equal to
    ``ann_topk``); smaller ``n_probe`` trades recall for compute. At
    cluster scale the natural layout keys the dataset by centroid id so
    probing reads only ``n_probe/n_centroids`` of the blocks.
    """
    qset = set(int(q) for q in query_ids)
    q_rows = ds.filter(expr=f"{id_col} in {sorted(qset)}").to_pandas()
    q_ids = q_rows[id_col].to_numpy().astype(np.int64)
    q_mat = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in q_rows[vec_col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]

    # Fit centroids on a sample (deterministic).
    sample = ds.random_sample(
        min(1.0, 4096 / max(ds.count(), 1)), seed=seed).to_pandas()
    smat = _normalize(np.stack(
        [np.asarray(v, np.float64) for v in sample[vec_col]]))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(smat))
    cent = smat[rng.choice(len(smat), size=n_centroids, replace=False)]
    for _ in range(lloyd_iters):
        assign = np.argmax(smat @ cent.T, axis=1)
        for c in range(n_centroids):
            members = smat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    # Queries probe their n_probe closest centroids.
    q_probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((q_ids, q_mat, cent, q_probe))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm, ce, qp = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, vec_col))
        centroid_of = np.argmax(m @ ce.T, axis=1)
        sims = qm @ m.T
        out_q, out_n, out_s = [], [], []
        for i in range(len(qi)):
            probed = np.isin(centroid_of, qp[i]) & (ids != qi[i])
            if not probed.any():
                continue
            s = sims[i][probed]
            nid = ids[probed]
            kk = min(k, len(s))
            top = (np.argpartition(-s, kk - 1)[:kk]
                   if kk < len(s) else np.arange(len(s)))
            out_q.extend([qi[i]] * len(top))
            out_n.extend(nid[top])
            out_s.extend(s[top])
        return pa.table(
            {"qid": pa.array(out_q, pa.int64()),
             "neighbor": pa.array(out_n, pa.int64()),
             "cos": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for q in q_ids:
        sub = parts[parts["qid"] == q]
        idx = np.lexsort((sub["neighbor"].to_numpy(), -sub["cos"].to_numpy()))[:k]
        sub = sub.iloc[idx].reset_index(drop=True)
        sub["rk"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        out.append(sub)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"qid": [], "neighbor": [], "cos": [], "rk": []})
    res["cos"] = res["cos"].round(4)
    return pa.Table.from_pandas(res, preserve_index=False)


def cosine_pairs(
    ds: ray.data.Dataset,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact all-pairs cosine ≥ tau (a < b): broadcast full normalized
    matrix once, blocked matmul per batch. Exact baseline for the LSH
    variant; fine while the matrix fits a worker (N·dim·8 bytes)."""
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = _normalize(np.stack([np.asarray(v, np.float64) for v in full[vec_col]]))
    order = np.argsort(ids_all)
    ids_all, mat = ids_all[order], mat[order]
    ref = ray.put((ids_all, mat))

    def block(batch: pa.Table) -> pa.Table:
        aids, amat = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, vec_col))
        sims = m @ amat.T  # (nb, N)
        rows, cols = np.nonzero(sims >= tau)
        a, b = ids[rows], aids[cols]
        keep = a < b
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return ds.map_batches(block, batch_format="pyarrow")


def lsh_bucketed_pairs(
    ds: ray.data.Dataset,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
) -> ray.data.Dataset:
    """Scale path: random-hyperplane sign buckets → within-bucket exact
    cosine. Approximate (pairs straddling a bucket boundary are missed —
    use multiple tables for recall); the all-to-all is groupby(bucket)."""
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _matrix(batch, vec_col)
        signs = (m @ pl.T) > 0
        bucket = signs @ (1 << np.arange(n_planes))
        return pa.table(
            {id_col: batch[id_col].cast(pa.int64()),
             vec_col: batch[vec_col],
             "bucket": pa.array(bucket.astype(np.int64))})

    def within(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        m = _normalize(np.stack([np.asarray(v, np.float64) for v in g[vec_col]]))
        sims = m @ m.T
        rows, cols = np.nonzero(sims >= tau)
        a, b = ids[rows], ids[cols]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(within, batch_format="pandas")
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="nb")).select_columns(["a", "b"])
