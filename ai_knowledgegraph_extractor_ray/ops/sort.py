"""Range-partitioned total-order sort — the classic sample-sort /
TeraSort shape, built on the same raw-Ray two-wave exchange as
``ops/exchange.py`` but routed by SAMPLED RANGE CUTS instead of a hash:

* sample wave: strided primary-key samples per block (driver fetches a
  few hundred scalars per map group, never rows);
* map wave: each task stamps ``searchsorted(cuts, key)`` partition ids —
  all rows with EQUAL primary keys land in one partition (``side=
  'right'`` interval semantics), so ties never straddle a boundary and
  tiebreak columns stay partition-local;
* reduce wave: one task per non-empty partition sorts its slice by the
  full composite order and (optionally) stamps a GLOBAL row number from
  the prefix sum of the map wave's per-partition counts — available the
  moment the maps finish, so the offsets cost no extra pass.

Output blocks come back in key-range order (``from_arrow_refs`` keeps
order), i.e. the returned Dataset is globally sorted. This is the
engine's answer to ``ROW_NUMBER() OVER (ORDER BY ...)`` — a global
window no hash groupby can express.

Scale notes: the exchange moves every row once (inherent to a total
sort); partition count auto-sizes from input bytes. Heavy skew on ONE
primary value concentrates that value's rows in a single partition —
unavoidable for exact global ranks (salting would split equal keys
across reducers and break the tie order); mitigate by adding a
higher-cardinality leading order column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .exchange import auto_partitions


@ray.remote
def _sample_primary(block_refs, primary: str, per_block: int):
    blocks = [pa.Table.from_pandas(b, preserve_index=False)
              if isinstance(b, pd.DataFrame) else b
              for b in ray.get(list(block_refs))]
    out = []
    for t in blocks:
        n = t.num_rows
        if not n:
            continue
        idx = np.linspace(0, n - 1, min(per_block, n)).astype(np.int64)
        out.append(t.column(primary).take(pa.array(idx)).to_pandas())
    return pd.concat(out, ignore_index=True) if out else pd.Series([])


@ray.remote
def _range_map(block_refs, primary: str, cuts, num_partitions: int):
    blocks = [pa.Table.from_pandas(b, preserve_index=False)
              if isinstance(b, pd.DataFrame) else b
              for b in ray.get(list(block_refs))]
    tbl = pa.concat_tables(blocks, promote_options="permissive")
    if tbl.num_rows == 0:
        e = tbl.slice(0, 0)
        return (*[e] * num_partitions,
                np.zeros(num_partitions, dtype=np.int64))
    if tbl.column(primary).null_count:
        # a null has no place in a total order; fail loudly instead of a
        # TypeError deep inside searchsorted (same contract as ops/window
        # rank after the round-3 null-rank advice)
        raise ValueError(
            f"range_sort: primary order column {primary!r} contains "
            "nulls; filter or fill them first")
    v = tbl.column(primary).to_pandas().to_numpy()
    if v.dtype.kind == "f" and np.isnan(v).any():
        # NaN compares unordered: searchsorted would route it to the
        # top partition and a descending sort would emit it FIRST —
        # reject like nulls instead of silently misordering
        raise ValueError(
            f"range_sort: primary order column {primary!r} contains "
            "NaN; filter or fill them first")
    pids = pd.Index(cuts).searchsorted(v, side="right").astype(np.int64)
    order = np.argsort(pids, kind="stable")
    tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(pids[order], np.arange(num_partitions + 1))
    return (*[tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
              for i in range(num_partitions)],
            np.diff(bounds).astype(np.int64))


@ray.remote
def _range_reduce(order_cols, ascending, out_col, offset, *parts):
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    df = (pa.concat_tables(parts, promote_options="permissive")
          .replace_schema_metadata(None).to_pandas())
    df = df.sort_values(order_cols, ascending=ascending,
                        kind="mergesort").reset_index(drop=True)
    if out_col is not None:
        df[out_col] = np.arange(offset + 1, offset + 1 + len(df),
                                dtype=np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def range_sort(ds: rd.Dataset, order_cols: list[str], *,
               ascending: bool | list[bool] | None = None,
               num_partitions: int | None = None,
               out_col: str | None = None,
               sample_per_block: int = 128,
               blocks_per_map: int = 4) -> rd.Dataset:
    """Globally sort ``ds`` by ``order_cols`` (must be a total order for a
    deterministic result). ``out_col`` additionally stamps the 1-based
    global row number. The FIRST order column routes the range exchange;
    its ``ascending`` flag orients the partition visit order, so
    secondary columns may sort in any direction."""
    if ascending is None:
        ascending = [True] * len(order_cols)
    elif isinstance(ascending, bool):
        ascending = [ascending] * len(order_cols)
    primary = order_cols[0]

    block_refs: list = []
    total_bytes = 0
    for bundle in ds.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
        total_bytes += bundle.size_bytes() or 0
    if not block_refs:
        return rd.from_items([])
    if num_partitions is None:
        num_partitions = auto_partitions(total_bytes)

    groups = [block_refs[i:i + blocks_per_map]
              for i in range(0, len(block_refs), blocks_per_map)]
    samples = pd.concat(ray.get([
        _sample_primary.remote(g, primary, sample_per_block)
        for g in groups]), ignore_index=True).sort_values(
        kind="mergesort").to_numpy()
    if len(samples) == 0:
        return rd.from_items([])
    cut_idx = np.linspace(0, len(samples) - 1,
                          num_partitions + 1)[1:-1].astype(np.int64)
    cuts = samples[cut_idx]

    refs_per_pid: list[list] = [[] for _ in range(num_partitions)]
    count_refs: list = []
    for g in groups:
        outs = _range_map.options(num_returns=num_partitions + 1).remote(
            g, primary, cuts, num_partitions)
        for p in range(num_partitions):
            refs_per_pid[p].append(outs[p])
        count_refs.append(outs[num_partitions])

    totals = np.sum(ray.get(count_refs), axis=0)
    visit = (range(num_partitions) if ascending[0]
             else range(num_partitions - 1, -1, -1))
    out_refs = []
    offset = 0
    for p in visit:
        if totals[p] > 0:
            out_refs.append(_range_reduce.remote(
                order_cols, ascending, out_col, int(offset),
                *refs_per_pid[p]))
            offset += int(totals[p])
    if not out_refs:
        return rd.from_items([])
    return rd.from_arrow_refs(out_refs)


def global_row_number(ds: rd.Dataset, order_cols: list[str], *,
                      ascending: bool | list[bool] | None = None,
                      out_col: str = "rn",
                      num_partitions: int | None = None) -> rd.Dataset:
    """``ROW_NUMBER() OVER (ORDER BY order_cols)`` for the whole dataset:
    a ``range_sort`` with the rank column stamped from exchange counts."""
    return range_sort(ds, order_cols, ascending=ascending,
                      num_partitions=num_partitions, out_col=out_col)
