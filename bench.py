"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the headline build twice in fresh processes
(num_cpus=8 vs 32) on the same input and reports both throughputs plus
scaling efficiency (sandbox stand-in for N vs 4N nodes — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Synthetic source-code corpus for the headline build (input_hint shape).
# Sized so parallel compute dominates fixed pipeline latency — the scaling
# measurement is meaningless on a latency-bound toy input.
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "150000"))
BENCH_MEAN_TOKENS = int(os.environ.get("GRAFT_BENCH_MEAN_TOKENS", "300"))
CORPUS_DIR = f"/tmp/konl_bench_corpus_{BENCH_DOCS}_{BENCH_MEAN_TOKENS}"
N_QUERY_REPS = 200
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))
# The scaling legs use a heavier corpus: efficiency between N and 4N is
# only meaningful when parallel compute dominates fixed pipeline latency.
SCALE_DOCS = int(os.environ.get("GRAFT_SCALE_DOCS", "300000"))


def _calibrate() -> float:
    """Single-core probe (seconds to sort 10M floats) — recorded so results
    from differently-throttled sandbox hosts can be compared."""
    import numpy as np

    a = np.random.default_rng(0).random(10_000_000)
    t0 = time.perf_counter()
    np.sort(a)
    return round(time.perf_counter() - t0, 3)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Sane shuffle width: Ray's default read parallelism (~200 blocks)
    # turns every groupby/sort into hundreds of tiny tasks at this data
    # scale — pure per-task overhead.
    ctx.read_op_min_num_blocks = NUM_CPUS * 2

    import shutil

    import numpy as np

    from konlsearch_ray.build import IndexConfig, build_index
    from konlsearch_ray.corpus import write_corpus
    from konlsearch_ray.query import IndexReader

    queries: dict[str, float] = {}

    # Corpus generation is cached on disk and untimed (input, not pipeline).
    write_corpus(CORPUS_DIR, BENCH_DOCS, seed=42, mean_tokens=BENCH_MEAN_TOKENS)
    # Warm the page cache so both scaling runs measure compute, not first read.
    for name in sorted(os.listdir(CORPUS_DIR)):
        if name.endswith(".parquet"):
            with open(os.path.join(CORPUS_DIR, name), "rb") as f:
                while f.read(1 << 22):
                    pass

    # --- headline: index build over the source-code corpus ---------------
    code_idx = f"/tmp/konl_bench_index_{NUM_CPUS}"
    shutil.rmtree(code_idx, ignore_errors=True)
    # ~96 shards: enough task waves that per-shard time skew doesn't leave
    # cores idle at the tail, at any leg size.
    shard_size = max(1024, BENCH_DOCS // 96)
    t0 = time.perf_counter()
    stats = build_index(
        CORPUS_DIR, code_idx,
        IndexConfig(shard_size=shard_size, tokenize_batch_size=2048))
    t_build_code = time.perf_counter() - t0
    queries["index_build_code"] = round(t_build_code, 3)
    queries["index_build_docs_per_sec"] = round(stats["N"] / t_build_code, 1)

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        ray.shutdown()
        return {
            "metric": "index_build_sec_code_corpus",
            "value": queries["index_build_code"],
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "num_cpus": NUM_CPUS,
            "bench_docs": BENCH_DOCS,
            "built_docs": stats["N"],
            "total_tokens": stats["total_tokens"],
            "phase_sec": stats.get("phase_sec"),
            "calib_sort10m_sec": _calibrate(),
        }

    # --- reference-shape workload: kowiki-style short docs ----------------
    # The reference's published number is 1,490,043 title docs in ~280 s
    # (single process). Same doc count, short synthetic docs (>= 8 tokens —
    # heavier than real titles, conservative in the reference's favor).
    n_titles = int(os.environ.get("GRAFT_BENCH_TITLES", "1490000"))
    if n_titles:
        titles_dir = f"/tmp/konl_bench_titles_{n_titles}"
        write_corpus(titles_dir, n_titles, seed=5, mean_tokens=3,
                     vocab_size=30000)
        titles_idx = f"/tmp/konl_bench_titlesidx_{NUM_CPUS}"
        shutil.rmtree(titles_idx, ignore_errors=True)
        t0 = time.perf_counter()
        tstats = build_index(
            titles_dir, titles_idx,
            IndexConfig(shard_size=32768, tokenize_batch_size=8192))
        dt = time.perf_counter() - t0
        queries["index_build_titles_sec"] = round(dt, 3)
        queries["index_build_titles_docs_per_sec"] = round(tstats["N"] / dt, 1)

    # --- secondary: index build over the sf documents table --------------
    docs_idx = f"/tmp/konl_bench_docsindex_{NUM_CPUS}"
    shutil.rmtree(docs_idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        os.path.join(SF_DIR, "documents.parquet"), docs_idx,
        IndexConfig(content_col="text", id_col="doc_id", dedup=False,
                    sort_keys=[], shard_size=4096))
    queries["index_build_docs_table"] = round(time.perf_counter() - t0, 3)

    # --- query latency over the code index --------------------------------
    reader = IndexReader(code_idx)
    from konlsearch_ray.corpus import HEAD_TERMS

    rng = np.random.default_rng(7)
    vocab_terms = []
    for t, _ in zip(reader._term_locs.keys(), range(4000)):
        if t:
            vocab_terms.append(t)
    lat = []
    for i in range(N_QUERY_REPS):
        toks = [HEAD_TERMS[i % len(HEAD_TERMS)],
                vocab_terms[int(rng.integers(0, len(vocab_terms)))]]
        t0 = time.perf_counter()
        reader.bm25_topk(toks, 10)
        lat.append(time.perf_counter() - t0)
    queries["bm25_p50_ms"] = round(float(np.percentile(lat, 50)) * 1000, 3)
    queries["bm25_p99_ms"] = round(float(np.percentile(lat, 99)) * 1000, 3)

    lat = []
    for i in range(N_QUERY_REPS):
        toks = [HEAD_TERMS[i % len(HEAD_TERMS)],
                vocab_terms[int(rng.integers(0, len(vocab_terms)))]]
        t0 = time.perf_counter()
        reader.search(toks, "AND")
        lat.append(time.perf_counter() - t0)
    queries["boolean_and_p50_ms"] = round(float(np.percentile(lat, 50)) * 1000, 3)

    # Exact (unpruned) BM25 for the pruning speedup ratio.
    lat = []
    for i in range(N_QUERY_REPS):
        toks = [HEAD_TERMS[i % len(HEAD_TERMS)],
                vocab_terms[int(rng.integers(0, len(vocab_terms)))]]
        t0 = time.perf_counter()
        reader.bm25_topk(toks, 10, prune=False)
        lat.append(time.perf_counter() - t0)
    queries["bm25_exact_p50_ms"] = round(float(np.percentile(lat, 50)) * 1000, 3)

    # --- distributed query serving throughput -----------------------------
    import pyarrow as pa

    from konlsearch_ray.query import QueryStage

    n_q = 2000
    qt = pa.table({
        "qid": pa.array(range(n_q), pa.int64()),
        "tokens": pa.array(
            [[HEAD_TERMS[i % len(HEAD_TERMS)],
              vocab_terms[int(rng.integers(0, len(vocab_terms)))]]
             for i in range(n_q)], pa.list_(pa.string())),
        "mode": pa.array(["BM25"] * n_q),
        "k": pa.array([10] * n_q, pa.int64()),
    })
    import ray.data as rd

    pool = max(2, NUM_CPUS // 4)
    t0 = time.perf_counter()
    (rd.from_arrow(qt).repartition(pool * 4)
     .map_batches(QueryStage, fn_constructor_kwargs={"index_dir": code_idx},
                  batch_format="pyarrow", concurrency=pool)
     .materialize())
    dt = time.perf_counter() - t0
    queries["bm25_distributed_qps"] = round(n_q / dt, 1)

    # --- one training-data pipeline for coverage --------------------------
    import ray.data as rd

    from konlsearch_ray.functions.text import token_counts

    t0 = time.perf_counter()
    token_counts(
        rd.read_parquet(os.path.join(SF_DIR, "documents.parquet")),
        "text", "doc_id").materialize()
    queries["token_counts_docs"] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "index_build_sec_code_corpus",
        "value": queries["index_build_code"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NUM_CPUS,
        "bench_docs": BENCH_DOCS,
        "built_docs": stats["N"],
        "total_tokens": stats["total_tokens"],
        "calib_sort10m_sec": _calibrate(),
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_DOCS=str(SCALE_DOCS),
                   GRAFT_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = SCALE_LO, SCALE_HI
    # The sandbox host's per-core speed fluctuates 2-4x minute to minute
    # (shared tenancy), so a single pair of legs can be dominated by host
    # drift. Run each leg twice in alternating order and take the per-leg
    # MINIMUM — the closest observation to the unthrottled host.
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    legs: dict[int, list[dict]] = {lo_cpus: [], hi_cpus: []}
    order = ([hi_cpus, lo_cpus] + [lo_cpus, hi_cpus]) if reps >= 2 \
        else [hi_cpus, lo_cpus]
    for ncpu in order[: 2 * reps]:
        legs[ncpu].append(one(ncpu))
    lo = min(legs[lo_cpus], key=lambda r: r["value"])
    hi = min(legs[hi_cpus], key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    n = lo["built_docs"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "sec_lo_all": [r["value"] for r in legs[lo_cpus]],
        "sec_hi_all": [r["value"] for r in legs[hi_cpus]],
        "num_cpus_lo": lo_cpus,
        "num_cpus_hi": hi_cpus,
        "docs_per_sec_lo": round(n / t_lo, 1),
        "docs_per_sec_hi": round(n / t_hi, 1),
        "built_docs": n,
        "phase_sec_lo": lo.get("phase_sec"),
        "phase_sec_hi": hi.get("phase_sec"),
        "calib_sort10m_sec_lo": lo.get("calib_sort10m_sec"),
        "calib_sort10m_sec_hi": hi.get("calib_sort10m_sec"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
