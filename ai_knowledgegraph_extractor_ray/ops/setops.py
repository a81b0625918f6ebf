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


def _bag_op(left: rd.Dataset, right: rd.Dataset, cols: list[str],
            op: str, buckets: int | None = None) -> rd.Dataset:
    """BAG-semantics core (SQL ``INTERSECT ALL`` / ``EXCEPT ALL``):
    per-block COUNT partials per key (the combiner — a billion copies
    ship as ``num_blocks`` count rows), one bucketed merge computes the
    multiplicity algebra, and the surviving keys are re-expanded with
    ``np.repeat``:

        intersect_all: min(count_left, count_right) copies
        except_all:    max(count_left - count_right, 0) copies
    """

    def partial(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = df[cols].assign(**{side: np.int64(1)})
            return g.groupby(cols, as_index=False, sort=False,
                             dropna=False).sum()
        return fn

    def widen(df: pd.DataFrame, have: str, miss: str) -> pd.DataFrame:
        return df.assign(**{miss: np.int64(0)})

    both = (left.map_batches(partial("_cl"), batch_format="pandas")
            .map_batches(lambda d: widen(d, "_cl", "_cr"),
                         batch_format="pandas")
            .union(right.map_batches(partial("_cr"), batch_format="pandas")
                   .map_batches(lambda d: widen(d, "_cr", "_cl"),
                                batch_format="pandas")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, as_index=False, sort=False,
                       dropna=False)[["_cl", "_cr"]].sum()
        cl = g["_cl"].to_numpy(np.int64)
        cr = g["_cr"].to_numpy(np.int64)
        n = (np.minimum(cl, cr) if op == "intersect_all"
             else np.maximum(cl - cr, 0))
        keep = n > 0
        reps = n[keep]
        out = g.loc[keep, cols]
        return out.loc[out.index.repeat(reps)].reset_index(drop=True)

    return bucketed_groupby(both, cols, merge, buckets=buckets)


def intersect_all(left: rd.Dataset, right: rd.Dataset, cols: list[str],
                  buckets: int | None = None) -> rd.Dataset:
    """SQL ``INTERSECT ALL``: each tuple min(multiplicity) times."""
    return _bag_op(left, right, cols, "intersect_all", buckets)


def except_all(left: rd.Dataset, right: rd.Dataset, cols: list[str],
               buckets: int | None = None) -> rd.Dataset:
    """SQL ``EXCEPT ALL``: each left tuple (count_l - count_r)+ times."""
    return _bag_op(left, right, cols, "except_all", buckets)
