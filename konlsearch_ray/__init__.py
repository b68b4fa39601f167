"""konlsearch_ray — a from-scratch Ray-Data-native inverted-index + BM25 engine.

Re-expresses the capabilities of the reference engine (handrake/KonlSearch,
an embedded RocksDB per-document posting store — see SURVEY.md) as streaming
``ray.data.Dataset`` pipelines:

- tokenization as ``map_batches`` over zero-copy Arrow batches (actor pool),
- posting-list construction as a doc-range-sharded ``groupby`` with
  delta-gap + varint compressed posting blobs,
- query serving (AND/OR/PHRASE/complex boolean + BM25 top-k) from immutable
  Parquet segment files via a read-only actor pool,
- per-shard manifests with lineage + counters for checkpoint/resume.

Nothing here calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

from konlsearch_ray.analyzer import tokenize, sanitize, analyze_batch
from konlsearch_ray.build import IndexConfig, build_index
from konlsearch_ray.query import IndexReader, SearchMode

__all__ = [
    "tokenize",
    "sanitize",
    "analyze_batch",
    "IndexConfig",
    "build_index",
    "IndexReader",
    "SearchMode",
]
