"""Distributed SQL set operations — UNION / INTERSECT / EXCEPT (distinct
semantics) over arbitrary key-column tuples.

Scale shape: ONE shuffle of per-block DISTINCT partials. Each block first
dedups locally (the combiner — a value appearing a billion times ships at
most ``num_blocks`` rows), sides are tagged with a presence bitmask, and
the bucketed merge ORs the masks per key:

    union:     mask != 0
    intersect: mask == 3   (present on both sides)
    except:    mask == 1   (left only)

All three are the same physical plan with a different final filter, so the
module exposes one ``_set_op`` core. Output is the distinct key tuples,
matching SQL's ``SELECT cols FROM a <OP> SELECT cols FROM b``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import bucketed_groupby

_MASKS = {"union": (1, 2, 3), "intersect": (3,), "except": (1,)}


def _set_op(left: rd.Dataset, right: rd.Dataset, cols: list[str],
            op: str, buckets: int | None = None) -> rd.Dataset:
    if op not in _MASKS:
        raise ValueError(f"op={op!r}: expected one of {sorted(_MASKS)}")
    keep = _MASKS[op]

    def partial(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[cols].drop_duplicates()
            return out.assign(_m=np.int8(side))
        return fn

    both = (left.map_batches(partial(1), batch_format="pandas")
            .union(right.map_batches(partial(2), batch_format="pandas")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (key, side) first, so the sum of side tags (1|2) is the
        # presence bitmask — all C-path, no per-key Python. dropna=False:
        # SQL set ops treat NULL keys as equal-and-present (UNION keeps one
        # NULL row; NULL INTERSECT NULL matches), and the exchange already
        # routes null keys consistently (stamped 'None'), so the reduce
        # must not silently drop them (round-3 ADVICE).
        m = (df.drop_duplicates(cols + ["_m"])
             .groupby(cols, as_index=False, sort=False, dropna=False)["_m"]
             .sum())
        return m.loc[m["_m"].isin(keep), cols]

    return bucketed_groupby(both, cols, merge, buckets=buckets)


def union_distinct(left: rd.Dataset, right: rd.Dataset, cols: list[str],
                   buckets: int | None = None) -> rd.Dataset:
    """SQL ``UNION`` (distinct) of the two sides' ``cols`` tuples."""
    return _set_op(left, right, cols, "union", buckets)


def intersect_distinct(left: rd.Dataset, right: rd.Dataset, cols: list[str],
                       buckets: int | None = None) -> rd.Dataset:
    """SQL ``INTERSECT``: distinct tuples present on BOTH sides."""
    return _set_op(left, right, cols, "intersect", buckets)


def except_distinct(left: rd.Dataset, right: rd.Dataset, cols: list[str],
                    buckets: int | None = None) -> rd.Dataset:
    """SQL ``EXCEPT``: distinct left tuples absent from the right."""
    return _set_op(left, right, cols, "except", buckets)
