"""Sampling / corpus-balancing operators.

Training-data pipelines sample deterministically — a rerun (or a resumed
job) must pick the SAME rows, so sampling keys off content/id hashes, not
RNG state:

* ``hash_sample``: keep a row iff the first two bytes of sha256(key) fall
  under ``rate`` — a pure per-block filter, no shuffle, stable under any
  partitioning/ordering, and expressible in SQL for oracle checks.
* ``cap_per_group``: at most ``k`` rows per group (e.g. per language, for
  corpus balancing), keeping the smallest ``order_col`` values — per-block
  top-k partials (the combiner: each block ships at most k rows per group
  it contains) -> one bucketed merge. A group hot in every block ships
  k x num_blocks rows through the shuffle, never its full volume.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def hash_sample(ds: rd.Dataset, *, key_col: str = "text",
                rate: float = 0.1) -> rd.Dataset:
    """Deterministic content-hash sampling: keep rows whose
    ``sha256(key)`` 16-bit prefix < rate * 65536. Identical selection on
    every rerun and under any repartitioning."""
    threshold = int(rate * 65536)

    def fn(t: pa.Table) -> pa.Table:
        mask = [int.from_bytes(
            hashlib.sha256(str(v).encode()).digest()[:2], "big") < threshold
            for v in t[key_col].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def cap_per_group(ds: rd.Dataset, *, group_col: str, order_col: str,
                  k: int, buckets: int | None = None) -> rd.Dataset:
    """Keep the ``k`` smallest-``order_col`` rows per group. For a
    deterministic result ``order_col`` must be unique within a group (use
    a row id); ties at the cut are broken by block arrival order."""
    from .agg import bucketed_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_col, kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_col, kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col], merge, buckets=buckets)
