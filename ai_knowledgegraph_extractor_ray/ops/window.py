"""Ordered per-key window functions — SQL's ``OVER (PARTITION BY key
ORDER BY ...)`` family, which Ray Data has no native operator for.

Supported window kinds (all exact, all vectorized):

- ``row_number``  — 1-based rank within the key, by the given total order
- ``lag`` / ``lead`` — value ``n`` rows before/after within the key
- ``cum_sum``     — running sum within the key (unbounded preceding frame)
- ``rolling_sum`` — sum over the last ``k`` rows within the key
                    (``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``)
- ``rank`` / ``dense_rank`` — SQL RANK/DENSE_RANK over ``src`` (ascending)
- ``ntile``       — SQL NTILE(param) over the window's total order

Scale shape: ONE shuffle. All rows of a key must be ranked against each
other, so the key is the mandatory co-location unit — rows co-bucket on
``crc32(by) % buckets`` (buckets auto-sized from input bytes, same as the
joins), then each bucket sorts ONCE by ``[by, *order]`` and computes every
requested window with pandas groupby transforms (C path, no per-key
Python). A pathologically hot key concentrates in one bucket; windows are
order-dependent within the key, so that co-location is REQUIRED — the
mitigation for a hot key is range-splitting on the order column with
boundary carry (cum/rolling state handoff), not hashing the key apart.

Determinism: callers must pass an ``order`` list that is a TOTAL order
within each key (e.g. ``["ts", "event_id"]``) — ties under a partial
order would make lag/rolling results depend on block layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import bucketed_groupby

_KINDS = {"row_number", "lag", "lead", "cum_sum", "rolling_sum",
          "rank", "dense_rank", "ntile", "percent_rank", "cume_dist",
          "first_value", "last_value", "ewma",
          "rolling_min", "rolling_max", "rolling_mean", "rolling_median",
          "range_sum"}


@dataclass(frozen=True)
class WindowSpec:
    """One output column: ``kind`` over ``src`` with ``param`` (lag/lead
    offset or rolling window length). ``src``/``param`` are unused for
    ``row_number``. ``fill`` replaces the NaN a lag/lead emits at key
    edges (keeps integer columns integer; None keeps NaN/float)."""
    out: str
    kind: str
    src: str | None = None
    param: int | None = None
    fill: object = None
    alpha: float | None = None   # ewma smoothing factor in (0, 1]


def keyed_window(ds: rd.Dataset, *, by: str, order: list[str],
                 specs: list[WindowSpec],
                 buckets: int | None = None) -> rd.Dataset:
    """Append the requested window columns to ``ds``. Input column dtypes
    pass through unchanged (the shuffle is arrow-native); new columns are
    int64 for row_number, the source dtype (or float64 where NaN appears
    and no ``fill`` is given) for the rest."""
    for s in specs:
        if s.kind not in _KINDS:
            raise ValueError(f"unknown window kind {s.kind!r}; "
                             f"expected one of {sorted(_KINDS)}")
        if s.kind not in ("row_number", "ntile") and not s.src:
            raise ValueError(f"window {s.out!r}: kind {s.kind!r} needs src")
        if s.kind in ("lag", "lead", "rolling_sum", "rolling_min",
                      "rolling_max", "rolling_mean", "rolling_median",
                      "ntile", "range_sum") and (
                not isinstance(s.param, int) or s.param <= 0):
            raise ValueError(f"window {s.out!r}: kind {s.kind!r} needs a "
                             f"positive integer param, got {s.param!r}")
        if s.kind == "ewma" and not (
                isinstance(s.alpha, (int, float))
                and not isinstance(s.alpha, bool) and 0 < s.alpha <= 1):
            raise ValueError(f"window {s.out!r}: ewma needs alpha in "
                             f"(0, 1], got {s.alpha!r}")
    cols = set(ds.schema().names)
    clash = [s.out for s in specs if s.out in cols]
    if clash:
        raise ValueError(f"window output columns already exist: {clash}")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values([by, *order], kind="mergesort")
              .reset_index(drop=True))
        # dropna=False: a NULL partition key is a window like any other
        # (SQL PARTITION BY groups nulls together; default dropna=True
        # would leave those rows NaN in every output column)
        g = df.groupby(by, sort=False, dropna=False)
        for s in specs:
            if s.kind == "row_number":
                out = g.cumcount() + 1
            elif s.kind in ("lag", "lead"):
                n = s.param if s.kind == "lag" else -s.param
                out = g[s.src].shift(n)
                if s.fill is not None:
                    src_dtype = df[s.src].dtype
                    out = out.fillna(s.fill).astype(src_dtype)
            elif s.kind == "rank":
                # SQL RANK() OVER (PARTITION BY by ORDER BY src): ties
                # share the min rank, gaps follow — value-determined, so
                # deterministic even when src ties under the total order.
                # na_option="bottom": NULL src values rank after every
                # non-null (ASC NULLS LAST, DuckDB/Postgres default) and
                # tie with each other, instead of yielding NaN ranks that
                # crash the int64 cast (round-3 ADVICE)
                out = (g[s.src].rank(method="min", na_option="bottom")
                       .astype("int64"))
            elif s.kind == "dense_rank":
                out = (g[s.src].rank(method="dense", na_option="bottom")
                       .astype("int64"))
            elif s.kind == "percent_rank":
                # SQL PERCENT_RANK() = (rank - 1) / (n - 1), 0 for n == 1
                rk = g[s.src].rank(method="min", na_option="bottom")
                nn = g[by].transform("size")
                out = (rk - 1) / (nn - 1).clip(lower=1)
            elif s.kind == "cume_dist":
                # SQL CUME_DIST() = rows with value <= current / n
                rk = g[s.src].rank(method="max", na_option="bottom")
                out = rk / g[by].transform("size")
            elif s.kind == "ntile":
                # SQL NTILE(k) over the window's TOTAL order (``order``):
                # first n%k tiles get ceil(n/k) rows, the rest floor(n/k)
                rn = g.cumcount().to_numpy()
                nn = g[by].transform("size").to_numpy()
                k = s.param
                base, big = nn // k, nn % k
                cut = big * (base + 1)
                tile = np.where(
                    rn < cut,
                    rn // np.maximum(base + 1, 1),
                    big + (rn - cut) // np.maximum(base, 1)) + 1
                out = pd.Series(tile.astype("int64"), index=df.index)
            elif s.kind == "first_value":
                # SQL FIRST_VALUE(src) over the window's total order with
                # the default frame (rows to current): the key's first row
                out = g[s.src].transform("first")
            elif s.kind == "last_value":
                # SQL LAST_VALUE(src) ... ROWS BETWEEN UNBOUNDED PRECEDING
                # AND UNBOUNDED FOLLOWING (the useful frame): the key's
                # last row under the total order
                out = g[s.src].transform("last")
            elif s.kind in ("rolling_min", "rolling_max",
                            "rolling_mean", "rolling_median"):
                # SQL agg(src) OVER (... ROWS BETWEEN param-1 PRECEDING
                # AND CURRENT ROW): pandas grouped rolling with
                # min_periods=1 matches the shrinking leading frame.
                # rolling_median interpolates even-sized frames (mean of
                # the two middles) exactly like SQL median/quantile_cont
                # as a window aggregate — output is float64
                fn = s.kind.split("_")[1]
                out = (g[s.src].rolling(s.param, min_periods=1)
                       .agg(fn).reset_index(level=0, drop=True))
                if fn in ("min", "max") and pd.api.types.is_integer_dtype(
                        df[s.src]):
                    out = out.astype(df[s.src].dtype)
            elif s.kind == "range_sum":
                # SQL SUM(src) OVER (... ORDER BY order[0] RANGE BETWEEN
                # param PRECEDING AND CURRENT ROW) — a VALUE-based frame
                # over the (numeric) ordering column: the frame holds
                # every key row with order value in [cur - param, cur],
                # INCLUDING later-positioned peers of the current row
                # (RANGE semantics, unlike the ROWS kinds above). Per key:
                # prefix sums + two binary searches, O(n log n) total.
                ocol = order[0]
                use_int = pd.api.types.is_integer_dtype(df[s.src])
                vdt = np.int64 if use_int else np.float64
                ovals = df[ocol].to_numpy()
                vvals = df[s.src].to_numpy(vdt)
                res = np.empty(len(df), dtype=vdt)
                for idx in g.indices.values():      # contiguous: df sorted
                    o, v = ovals[idx], vvals[idx]
                    cs = np.concatenate([[vdt(0)], np.cumsum(v)])
                    r = np.searchsorted(o, o, side="right")
                    lft = np.searchsorted(o, o - s.param, side="left")
                    res[idx] = cs[r] - cs[lft]
                out = pd.Series(res, index=df.index)
            elif s.kind == "cum_sum":
                out = g[s.src].cumsum()
            elif s.kind == "ewma":
                # recursive exponential smoothing y_t = a*x_t + (1-a)*
                # y_{t-1}, y_0 = x_0 (pandas adjust=False) over the
                # window's total order — the per-key streaming smoother
                out = (g[s.src].transform(
                    lambda x: x.ewm(alpha=s.alpha, adjust=False).mean()))
            else:                                   # rolling_sum, exact:
                cs = g[s.src].cumsum()              # win_k[i] = cs[i] -
                prev = cs.groupby(df[by], sort=False,
                                  dropna=False).shift(s.param)
                out = cs - prev.fillna(0).astype(cs.dtype)
            df[s.out] = out
        return df

    return bucketed_groupby(ds, [by], merge, buckets=buckets)


def keyed_share(ds: rd.Dataset, *, by: str, value_col: str,
                total_col: str = "total", share_col: str = "share",
                buckets: int | None = None) -> rd.Dataset:
    """The UNORDERED full-partition window aggregate —
    ``SUM(value) OVER (PARTITION BY by)`` attached per row, plus the
    row's share of it: per-block partial sums feed one bucketed
    groupby (tiny: one row per key per block), and the totals join
    back through one co-bucketed exchange. ``share`` is
    ``value / total`` in float64 (matching the SQL CAST division);
    zero totals yield share 0.0 to keep the column finite."""
    from .agg import sum_merge
    from .joins import hash_inner_join

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({by: df[by], total_col: df[value_col]})
                .groupby(by, as_index=False, sort=False,
                         dropna=False).sum())

    totals = bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [by], sum_merge([by], [total_col]), buckets=buckets).materialize()
    if totals.count() == 0:      # empty input: typed empty passthrough
        def empty_cols(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(**{total_col: df[value_col],
                                share_col: np.float64(0)})
        return ds.map_batches(empty_cols, batch_format="pandas")

    joined = hash_inner_join(ds, totals, by, buckets=buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        t = df[total_col].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(t != 0, v / t, 0.0)
        return df.assign(**{share_col: s})

    return joined.map_batches(finish, batch_format="pandas")
