"""Prefix suggestions + per-prefix frequency top-k (trie/counter parity).

Replaces the reference's jamo-decomposed RocksDB trie (reference
trie.py:38-67, 139-154) and bounded per-prefix top-5 counter (reference
counter.py:41-90, trie.py:200-216 — SURVEY.md J5/A4/O3) with plain
relational shapes over the dictionary table: a prefix range filter and a
grouped top-k. The reference's bit-flipped count key encoding (counter.py:
96-105) is unnecessary — a (count desc, term asc) sort expresses it.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOP_K = 5  # the reference counter's bound (counter.py:12-18)


def suggest(dictionary: ray.data.Dataset, prefix: str) -> ray.data.Dataset:
    """Sorted terms with the given prefix (reference trie search semantics,
    sorted lexicographically like trie.py:41)."""
    hits = dictionary.map_batches(
        lambda t: t.filter(pc.starts_with(t["term"], prefix)),
        batch_format="pyarrow",
    )
    return hits.select_columns(["term"]).sort("term")


def topk_per_prefix(
    dictionary: ray.data.Dataset, count_col: str = "df", k: int = TOP_K
) -> ray.data.Dataset:
    """Per first-character prefix: top-k terms by count desc, term asc,
    with rank — the reference's bounded per-prefix counter as a grouped
    top-k (evicting the min ≡ keeping the top-k)."""

    def add_prefix(t: pa.Table) -> pa.Table:
        return t.append_column("prefix", pc.utf8_slice_codeunits(t["term"], 0, 1))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([count_col, "term"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rk"] = range(1, len(g) + 1)
        return g[["prefix", "term", count_col, "rk"]]

    return (
        dictionary.map_batches(add_prefix, batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(topk, batch_format="pandas")
    )
