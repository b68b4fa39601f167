"""Distributed index build — a streaming Ray Data pipeline.

Replaces the reference's serial, lock-guarded ingest loop (reference
index.py:299-327 — per-(token, doc) RocksDB point writes, SURVEY.md §3.1)
with two phases over ``ray.data.Dataset``:

**Phase A — canonical docs** (runs once, marker-gated):
  read input Parquet → vectorized sha256 (per-row invariant column
  ``content_sha256``) → exact dedup = ``groupby(content_sha256)`` keep the
  first row in canonical order (first-wins, reference index.py:299-305) →
  deterministic dense 1-based ``doc_id`` (sort + metadata prefix-sum, see
  ids.py) → ``shard = (doc_id - 1) // shard_size`` → write the docstore
  ``docs/`` partitioned by shard.

**Phase B — posting segments** (resumable per shard):
  read only incomplete shards' docs (column-pruned to doc_id + content) →
  tokenizer stage (``map_batches``, Arrow in/out, emits per-batch partial
  posting rows pre-combined by (shard, term) — the combiner that keeps the
  shuffle small) → ``groupby("shard")`` (the ONE wide exchange; shards are
  equal doc-ID ranges so the shuffle is skew-free by construction — this is
  the "salt by doc-range" strategy of SURVEY.md §7(b): head terms are
  split across shards into disjoint, ordered sub-lists that concatenate
  back into a globally sorted posting list with no merge logic) →
  per-shard encoder task: sort (term, doc_id), delta-gap + varint encode,
  block-max metadata, atomic segment + doclens + manifest write.

**Finalize**: global ``stats.json`` (N, avgdl, total_tokens) from shard
manifests; ``dictionary/`` = groupby(term) over the segments' (term, df,
cf) columns only (column-pruned read).

Per-shard manifests carry lineage (input files), counters, and output
sha256s; a re-run skips complete shards and reproduces byte-identical
segments (encoder output depends only on the shard's rows, not on task
scheduling order).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Sum

from konlsearch_ray.codec import encode_postings_grouped
from konlsearch_ray.ids import assign_doc_ids

# Sentinel "term" carrying per-doc token counts through the same exploded
# stream as real postings (kept tokens are never empty strings).
DOCLEN_TERM = ""

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_ids_bin", pa.large_binary()),
        ("tfs_bin", pa.large_binary()),
        ("pos_bin", pa.large_binary()),
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
    ]
)


@dataclass
class IndexConfig:
    content_col: str = "content"
    id_col: str | None = None  # None → assign dense IDs by sort_keys
    sort_keys: list[str] = field(default_factory=lambda: ["repo", "path", "commit"])
    shard_size: int = 32768  # docs per shard (the resumable / bounded unit)
    dedup: bool = True
    store_cols: list[str] | None = None  # extra columns persisted in docs/
    tokenize_batch_size: int = 512
    tokenize_concurrency: int | tuple[int, int] | None = None
    id_start: int = 1


# --------------------------------------------------------------------------
# Stages
# --------------------------------------------------------------------------


def _sha256_batch(batch: pa.Table, content_col: str) -> pa.Table:
    vals = batch[content_col].to_pylist()
    hashes = [hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
              for v in vals]
    return batch.append_column("content_sha256", pa.array(hashes, pa.string()))


class TokenizeStage:
    """Actor-pool tokenizer: Arrow batch of docs → partial posting rows.

    Stands in for the reference's module-level mecab singleton (reference
    index.py:24 — state loaded once per process, SURVEY.md ST1). The
    analyzer slot is pluggable; the normative default is the deterministic
    regex analyzer (analyzer.py). Emits rows
    ``(shard, term, doc_ids: list<int64>, tfs: list<int32>,
    poss: list<int32>)`` pre-combined per batch — the partial-aggregation
    combiner that keeps the groupby("shard") exchange small — plus one
    sentinel row per (batch, shard) with ``term == ""`` whose tfs carry
    per-doc total token counts (doc_len), covering zero-token docs too.
    """

    def __init__(self, content_col: str, shard_size: int):
        self.content_col = content_col
        self.shard_size = shard_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from konlsearch_ray.analyzer import analyze_batch_coded

        occ, dictionary = analyze_batch_coded(batch, self.content_col)
        doc = occ["doc_id"]
        code = occ["term_code"]
        tf = occ["tf"].astype(np.int64)
        fpos = occ["first_pos"].astype(np.int64)
        shard = (doc - 1) // self.shard_size if len(doc) else doc

        # Group (shard, term_code) → lists; pure-int lexsort (term codes
        # come factorized from the analyzer — no object-array sort here).
        order = np.lexsort((doc, code, shard))
        doc_s, code_s, tf_s, fp_s, sh_s = (
            doc[order], code[order], tf[order], fpos[order], shard[order])
        n = len(doc_s)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (sh_s[1:] != sh_s[:-1]) | (code_s[1:] != code_s[:-1])
        starts = np.flatnonzero(new)
        offsets = np.append(starts, n).astype(np.int32)

        out_term = (pc.take(dictionary, pa.array(code_s[starts]))
                    .cast(pa.string()).to_numpy(zero_copy_only=False)
                    if n else np.array([], dtype=object))
        out_shard = sh_s[starts] if n else np.array([], dtype=np.int64)

        # Sentinel doclen rows: all batch docs grouped by shard.
        all_doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dlen = np.zeros(len(all_doc), dtype=np.int64)
        if n:
            # Σ tf per doc (dense within batch via searchsorted on sorted ids).
            o2 = np.argsort(all_doc, kind="stable")
            pos_in = np.searchsorted(all_doc[o2], doc_s)
            np.add.at(dlen, o2[pos_in], tf_s)
        sh_all = (all_doc - 1) // self.shard_size
        o3 = np.lexsort((all_doc, sh_all))
        sh_sorted, doc_sorted, dlen_sorted = sh_all[o3], all_doc[o3], dlen[o3]
        s_new = np.ones(len(sh_sorted), dtype=bool)
        if len(sh_sorted) > 1:
            s_new[1:] = sh_sorted[1:] != sh_sorted[:-1]
        s_starts = np.flatnonzero(s_new)
        s_offsets = np.append(s_starts, len(sh_sorted)).astype(np.int32)

        def list_arr(values: np.ndarray, offs: np.ndarray, typ) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(values, typ))

        terms = pa.array(
            np.concatenate([out_term, np.full(len(s_starts), DOCLEN_TERM, object)]),
            pa.string(),
        )
        shards = pa.array(
            np.concatenate([out_shard, sh_sorted[s_starts]]).astype(np.int64))
        doc_lists = pa.concat_arrays([
            list_arr(doc_s.astype(np.int64), offsets, pa.int64()),
            list_arr(doc_sorted, s_offsets, pa.int64()),
        ])
        tf_lists = pa.concat_arrays([
            list_arr(tf_s.astype(np.int32), offsets, pa.int32()),
            list_arr(dlen_sorted.astype(np.int32), s_offsets, pa.int32()),
        ])
        pos_lists = pa.concat_arrays([
            list_arr(fp_s.astype(np.int32), offsets, pa.int32()),
            list_arr(np.zeros(len(doc_sorted), np.int32), s_offsets, pa.int32()),
        ])
        return pa.table(
            {"shard": shards, "term": terms, "doc_ids": doc_lists,
             "tfs": tf_lists, "poss": pos_lists}
        )


def _encode_shard(group: pa.Table, index_dir: str) -> pa.Table:
    """Encode + atomically write one shard's segment, doclens and manifest.

    Runs inside the groupby("shard") map task on a worker. Deterministic:
    output depends only on the shard's (doc, term) content — partial-row
    arrival order is erased by the global (term, doc_id) sort.
    """
    shard = int(group["shard"][0].as_py())
    term_col = group["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    is_doclen_arr = pc.equal(term_col, DOCLEN_TERM)
    dl_tab = group.filter(is_doclen_arr)
    post_tab = group.filter(pc.invert(is_doclen_arr))

    def flat_list(tab: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
        arr = tab[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        return vals, lens

    # Doclens: concat sentinel lists, sort by doc_id (a doc appears in
    # exactly one tokenize batch, so no dupes).
    dl_docs, _ = flat_list(dl_tab, "doc_ids")
    dl_vals, _ = flat_list(dl_tab, "tfs")
    o = np.argsort(dl_docs, kind="stable")
    dl_docs, dl_vals = dl_docs[o], dl_vals[o]

    # Postings: Arrow-native flatten; factorize terms via dictionary_encode
    # and remap codes to lexicographic rank so segment rows sort by term
    # deterministically; one whole-shard grouped varint encode.
    flat_doc, row_lens = flat_list(post_tab, "doc_ids")
    flat_tf, _ = flat_list(post_tab, "tfs")
    flat_pos, _ = flat_list(post_tab, "poss")
    pterms = post_tab["term"]
    if isinstance(pterms, pa.ChunkedArray):
        pterms = pterms.combine_chunks()
    denc = pterms.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    row_code = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_np = denc.dictionary.to_numpy(zero_copy_only=False)
    dict_order = np.argsort(dict_np, kind="stable")
    rank_of_code = np.empty(len(dict_order), dtype=np.int64)
    rank_of_code[dict_order] = np.arange(len(dict_order))
    entry_rank = np.repeat(rank_of_code[row_code], row_lens) \
        if len(row_code) else np.zeros(0, dtype=np.int64)

    order = np.lexsort((flat_doc, entry_rank))
    rank_s, doc_s, tf_s, pos_s = (
        entry_rank[order], flat_doc[order], flat_tf[order], flat_pos[order])
    n = len(rank_s)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = rank_s[1:] != rank_s[:-1]
    starts = np.flatnonzero(new)

    enc = encode_postings_grouped(starts, doc_s, tf_s, pos_s)
    sorted_terms = dict_np[dict_order]
    out_terms = sorted_terms[rank_s[starts]] if n else np.array([], dtype=object)
    bl_off = pa.array(
        np.concatenate(([0], np.cumsum(enc["nblocks"]))), pa.int32())
    seg_table = pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "df": pa.array(enc["df"], pa.int64()),
            "cf": pa.array(enc["cf"], pa.int64()),
            "doc_ids_bin": pa.array(enc["doc_ids_bin"], pa.large_binary()),
            "tfs_bin": pa.array(enc["tfs_bin"], pa.large_binary()),
            "pos_bin": pa.array(enc["pos_bin"], pa.large_binary()),
            "block_last_doc": pa.ListArray.from_arrays(
                bl_off, pa.array(enc["block_last_flat"], pa.int64())),
            "block_max_tf": pa.ListArray.from_arrays(
                bl_off, pa.array(enc["block_max_flat"], pa.int32())),
        },
        schema=SEGMENT_SCHEMA,
    )

    seg_dir = os.path.join(index_dir, "segments")
    dl_dir = os.path.join(index_dir, "doclens")
    mf_dir = os.path.join(index_dir, "manifests")
    for d in (seg_dir, dl_dir, mf_dir):
        os.makedirs(d, exist_ok=True)

    seg_path = os.path.join(seg_dir, f"shard-{shard:06d}.parquet")
    dl_path = os.path.join(dl_dir, f"shard-{shard:06d}.parquet")
    _atomic_write_parquet(seg_table, seg_path)
    dl_table = pa.table(
        {"doc_id": pa.array(dl_docs), "doc_len": pa.array(dl_vals)})
    _atomic_write_parquet(dl_table, dl_path)

    manifest = {
        "shard": shard,
        "n_docs": int(len(dl_docs)),
        "n_terms": int(len(starts)),
        "total_tokens": int(dl_vals.sum()),
        "segment_sha256": _file_sha(seg_path),
        "doclens_sha256": _file_sha(dl_path),
        "version": 1,
    }
    tmp = os.path.join(mf_dir, f".shard-{shard:06d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(mf_dir, f"shard-{shard:06d}.json"))
    return pa.table({k: [v] for k, v in manifest.items()
                     if k in ("shard", "n_docs", "n_terms", "total_tokens")})


def _atomic_write_parquet(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, path)


def _file_sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# --------------------------------------------------------------------------
# Orchestration
# --------------------------------------------------------------------------


def _first_wins_dedup(ds: ray.data.Dataset, key_cols: list[str]) -> ray.data.Dataset:
    """Exact first-wins dedup by ``content_sha256`` without a full-row shuffle.

    Only *light* columns (sha + canonical key) go through the groupby; full
    rows never move. The winner map is restricted to shas that actually have
    duplicates (having count > 1), so the broadcast is proportional to the
    duplicate count, not the corpus. Scale path for extreme duplicate
    volumes: replace the broadcast with a sha-partitioned semi-join.

    First-wins = keep the row with the minimum canonical key (matches the
    reference's earliest-doc dedup, reference index.py:299-305).
    """
    import ray as _ray
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    sep = "\x00"

    def add_key(t: pa.Table) -> pa.Table:
        key = t[key_cols[0]].cast(pa.string())
        for k in key_cols[1:]:
            key = pc.binary_join_element_wise(key, t[k].cast(pa.string()), sep)
        return t.append_column("__dedup_key", key)

    # The keyed dataset has two consumers (the light-column groupby and the
    # winner filter); Ray Data re-executes lineage per consumer, which would
    # re-read and re-hash the corpus. Materialize once at the branch point —
    # blocks live in the object store (spilling at scale) either way, since
    # the canonical sort right after this is an all-to-all over them.
    keyed = ds.map_batches(add_key, batch_format="pyarrow").materialize()
    light = keyed.select_columns(["content_sha256", "__dedup_key"])
    agg = light.groupby("content_sha256").aggregate(
        _Min("__dedup_key", alias_name="winner"), _Count(alias_name="n"))
    dups = agg.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    ).select_columns(["content_sha256", "winner"]).to_pandas()
    winners_ref = _ray.put(dict(zip(dups["content_sha256"], dups["winner"])))

    def keep(t: pa.Table) -> pa.Table:
        winners = _ray.get(winners_ref)
        if winners:
            sha = t["content_sha256"].to_pylist()
            key = t["__dedup_key"].to_pylist()
            mask = pa.array(
                [winners.get(s) is None or winners[s] == k
                 for s, k in zip(sha, key)])
            t = t.filter(mask)
        return t.drop_columns(["__dedup_key"])

    return keyed.map_batches(keep, batch_format="pyarrow")


def _docs_phase(source, index_dir: str, cfg: IndexConfig) -> None:
    docs_dir = os.path.join(index_dir, "docs")
    marker = os.path.join(index_dir, "_DOCS_DONE")
    if os.path.exists(marker):
        return
    ds = source if isinstance(source, ray.data.Dataset) else ray.data.read_parquet(source)
    ds = ds.map_batches(
        _sha256_batch, batch_format="pyarrow",
        fn_kwargs={"content_col": cfg.content_col})
    if cfg.id_col is None:
        if cfg.dedup:
            ds = _first_wins_dedup(ds, key_cols=cfg.sort_keys)
        ds = assign_doc_ids(ds, cfg.sort_keys, start=cfg.id_start)
    else:
        if cfg.id_col != "doc_id":
            ds = ds.rename_columns({cfg.id_col: "doc_id"})
        if cfg.dedup:
            ds = _first_wins_dedup(ds, key_cols=["doc_id"])

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pc.divide(pc.subtract(batch["doc_id"], 1), cfg.shard_size)
        return batch.append_column("shard", pc.cast(shard, pa.int64()))

    ds = ds.map_batches(add_shard, batch_format="pyarrow")
    keep = {"doc_id", "shard", "content_sha256", cfg.content_col}
    keep |= set(cfg.store_cols or [])
    if cfg.id_col is None:
        keep |= set(cfg.sort_keys)
    cols = [c for c in ds.schema().names if c in keep]
    ds.select_columns(cols).write_parquet(docs_dir, partition_cols=["shard"])
    with open(marker, "w") as f:
        f.write("ok")


def _completed_shards(index_dir: str) -> set[int]:
    mf_dir = os.path.join(index_dir, "manifests")
    if not os.path.isdir(mf_dir):
        return set()
    done = set()
    for name in os.listdir(mf_dir):
        if name.startswith("shard-") and name.endswith(".json"):
            done.add(int(name[len("shard-"):-len(".json")]))
    return done


def _postings_phase(index_dir: str, cfg: IndexConfig) -> None:
    docs_dir = os.path.join(index_dir, "docs")
    done = _completed_shards(index_dir)
    shard_dirs = []
    for name in sorted(os.listdir(docs_dir)):
        if not name.startswith("shard="):
            continue
        shard = int(name.split("=", 1)[1])
        if shard not in done:
            sub = os.path.join(docs_dir, name)
            shard_dirs.extend(
                os.path.join(sub, f) for f in sorted(os.listdir(sub))
                if f.endswith(".parquet"))
    if not shard_dirs:
        return
    ds = ray.data.read_parquet(shard_dirs, columns=["doc_id", cfg.content_col])
    concurrency = cfg.tokenize_concurrency
    if concurrency is None:
        # Autoscaling actor pool sized to the session's CPUs, leaving head-
        # room for the read and shuffle stages.
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu - 2))
    exploded = ds.map_batches(
        TokenizeStage,
        fn_constructor_kwargs={
            "content_col": cfg.content_col, "shard_size": cfg.shard_size},
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        concurrency=concurrency,
    )
    manifests = exploded.groupby("shard").map_groups(
        _encode_shard, batch_format="pyarrow", fn_kwargs={"index_dir": index_dir})
    manifests.materialize()  # drive the pipeline; manifest rows are tiny


def _finalize(index_dir: str) -> dict:
    mf_dir = os.path.join(index_dir, "manifests")
    manifests = []
    for name in sorted(os.listdir(mf_dir)):
        if name.startswith("shard-") and name.endswith(".json"):
            with open(os.path.join(mf_dir, name)) as f:
                manifests.append(json.load(f))
    n_docs = sum(m["n_docs"] for m in manifests)
    total_tokens = sum(m["total_tokens"] for m in manifests)
    stats = {
        "N": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "num_shards": len(manifests),
        "version": 1,
    }
    # Global dictionary: column-pruned groupby over segment stats.
    seg_dir = os.path.join(index_dir, "segments")
    seg_files = [os.path.join(seg_dir, n) for n in sorted(os.listdir(seg_dir))
                 if n.endswith(".parquet")]
    dict_dir = os.path.join(index_dir, "dictionary")
    if seg_files:
        dct = (
            ray.data.read_parquet(seg_files, columns=["term", "df", "cf"])
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
        )
        tmp_dir = dict_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        dct.write_parquet(tmp_dir)
        if os.path.isdir(dict_dir):
            import shutil

            shutil.rmtree(dict_dir)
        os.replace(tmp_dir, dict_dir)
    stats["vocab"] = int(pq.ParquetDataset(dict_dir).read(["term"]).num_rows) if seg_files else 0
    tmp = os.path.join(index_dir, ".stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))
    return stats


def build_index(source, index_dir: str, cfg: IndexConfig | None = None) -> dict:
    """Build (or resume) the full index at ``index_dir``; returns stats.

    ``source`` is a Parquet path/paths or an existing ``ray.data.Dataset``.
    Ray must already be initialised by the caller (driver contract).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    _docs_phase(source, index_dir, cfg)
    _postings_phase(index_dir, cfg)
    return _finalize(index_dir)
