"""Search-log-style incremental aggregation + seq-ID assignment.

Maps the reference's append-only search log (reference log.py:22-47) and
its offset-checkpointed frequency aggregation (reference
inverted_index.py:121-128 — SURVEY.md A3/§2.9) onto an ordered ``events``
table: the offset is a high-water-mark timestamp; aggregation is a batch
groupby over rows past the offset. The reference's stale-offset double
count (SURVEY.md Q4) is deliberately fixed: the offset is an explicit
argument read fresh per run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def aggregate_from_offset(
    events: ray.data.Dataset,
    offset_ts,
    key_col: str = "event_type",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Grouped hits/sum past the offset (reference A3 semantics).

    Pre-aggregation happens inside Ray's groupby combiner; keys here are
    low-cardinality so the exchange is tiny.
    """
    filtered = events.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], pa.scalar(offset_ts))),
        batch_format="pyarrow",
    )
    return filtered.groupby(key_col).aggregate(
        Count(alias_name="hits"), Sum(value_col, alias_name="total")
    )


def assign_seq_ids(
    events: ray.data.Dataset, id_col: str = "event_id"
) -> ray.data.Dataset:
    """Per-second sequence IDs, mirroring the reference's ``{ts}:{seq:04d}``
    log-key scheme (reference log.py:26-38): seq restarts at 0 each second,
    ordered by ``id_col`` within the second (the deterministic stand-in for
    the reference's single-writer arrival order)."""

    def add_sec(t: pa.Table) -> pa.Table:
        sec = pc.cast(pc.floor(pc.divide(
            pc.cast(t["ts"], pa.int64()), 1_000_000)), pa.int64())
        return t.append_column("sec", sec)

    def per_second(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        g["seq"] = np.arange(len(g), dtype=np.int64)
        return g[[id_col, "sec", "seq"]]

    with_sec = events.map_batches(add_sec, batch_format="pyarrow")
    return with_sec.groupby("sec").map_groups(per_second, batch_format="pandas")
