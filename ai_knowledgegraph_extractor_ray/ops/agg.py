"""Two-level distributed aggregation: per-block partials -> hash-bucket
shuffle -> vectorized pandas merge per bucket.

The pattern behind every high-cardinality groupby in this engine:

1. ``map_batches`` reduces each block to partial rows (one per distinct key
   per block) — this is the combiner that defuses hot keys: a key appearing
   a billion times contributes at most ``num_blocks`` partial rows.
2. Partials are shuffled on ``_bkey = crc32(key) % buckets`` — a SMALL,
   uniform key space — so the exchange has ``buckets`` coarse groups instead
   of one group per distinct key.
3. The merge runs once per bucket as a single VECTORIZED pandas groupby over
   all keys in that bucket (C path), instead of one Python task per distinct
   key.

Measured on 100k events / 96k distinct (user, hour) keys @ 32 CPUs: 2.9 s vs
20.0 s for Ray's native two-key aggregate and 17 s for per-key map_groups —
the per-group scheduling overhead, not the arithmetic, is what dominates
high-cardinality merges.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable

import pandas as pd
import ray.data as rd


def _crc_bucket(s: str, buckets: int) -> int:
    return zlib.crc32(s.encode()) % buckets


def bucketed_groupby(partials: rd.Dataset, key_cols: list[str],
                     merge: Callable[[pd.DataFrame], pd.DataFrame],
                     buckets: int = 64) -> rd.Dataset:
    """Shuffle ``partials`` on a hash bucket of ``key_cols`` and apply
    ``merge`` (a vectorized whole-bucket pandas reduce; it must group by the
    key columns itself and must not depend on rows outside the bucket —
    guaranteed because a key's rows all land in one bucket)."""

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_bkey=pd.Series([], dtype="int32"))
        k = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            k = k + "\x00" + df[c].astype(str)
        return df.assign(
            _bkey=k.map(lambda s: _crc_bucket(s, buckets)).astype("int32"))

    def m(df: pd.DataFrame) -> pd.DataFrame:
        return merge(df.drop(columns="_bkey"))

    return (partials.map_batches(stamp, batch_format="pandas")
            .groupby("_bkey").map_groups(m, batch_format="pandas"))


def per_group_apply(key_cols: list[str], fn: Callable[[pd.DataFrame], pd.DataFrame]):
    """merge callback: apply ``fn`` to each distinct-key sub-frame inside the
    coarse bucket. The inner split is pandas' C-path groupby, so a million
    tiny key groups cost one task per COARSE bucket plus an in-process loop —
    not a million Ray tasks (measured: 363k LSH buckets took ~55 s as
    map_groups tasks vs ~2 s inside bucketed merges)."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        key = key_cols[0] if len(key_cols) == 1 else key_cols
        outs = [fn(g) for _, g in df.groupby(key, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)
    return merge


def sum_merge(key_cols: list[str], value_cols: list[str]):
    """merge callback: vectorized groupby-sum of ``value_cols``."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_cols, as_index=False, sort=False)[value_cols].sum()
    return merge
