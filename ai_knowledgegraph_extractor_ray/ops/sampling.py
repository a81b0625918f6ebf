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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _h16(vals) -> np.ndarray:
    """16-bit sha256 prefix per value — the ONE hash both hash_sample and
    stratified_split key on; it must stay bit-identical to the DuckDB
    oracle idiom ``substr(sha256(CAST(x AS VARCHAR)), 1, 4)``."""
    return np.asarray(
        [int.from_bytes(hashlib.sha256(str(v).encode()).digest()[:2], "big")
         for v in vals], dtype=np.int64)


def hash_sample(ds: rd.Dataset, *, key_col: str = "text",
                rate: float = 0.1) -> rd.Dataset:
    """Deterministic content-hash sampling: keep rows whose
    ``sha256(key)`` 16-bit prefix < rate * 65536. Identical selection on
    every rerun and under any repartitioning."""
    threshold = int(rate * 65536)

    def fn(t: pa.Table) -> pa.Table:
        mask = _h16(t[key_col].to_pylist()) < threshold
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds: rd.Dataset, *, weight_col: str,
                    key_col: str = "text", scale: float = 1.0) -> rd.Dataset:
    """Per-row deterministic weighted sampling — keep a row with
    probability ``clamp(weight * scale, 0, 1)`` (quality-proportional
    downsampling, importance-weighted mixing): kept iff
    ``sha256(key)``'s 16-bit prefix < ``floor(p * 65536)``. A pure
    per-block filter like :func:`hash_sample` — no shuffle, identical
    selection on any rerun/partitioning, and SQL-reproducible (the
    threshold compares as zero-padded hex both sides)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        p = np.clip(df[weight_col].to_numpy(dtype=np.float64) * scale, 0, 1)
        thr = np.floor(p * 65536).astype(np.int64)
        return df[_h16(df[key_col]) < thr]

    return ds.map_batches(fn, batch_format="pandas")


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


def temperature_mix(ds: rd.Dataset, *, group_col: str,
                    id_col: str = "doc_id", k: int = 100,
                    alpha: float = 0.5,
                    buckets: int | None = None) -> rd.Dataset:
    """Temperature-based corpus mixing: sample ``k`` rows total with group
    ``g`` (source, language) receiving ``k_g = (k * w_g) // sum(w)`` rows,
    ``w_g = n_g ** alpha`` — the alpha-sampling that flattens hot sources
    toward uniform as ``alpha -> 0`` (alpha=1 is proportional, the
    multilingual-LM mixing knob). Selection inside a group is the ``k_g``
    smallest ``(sha256(id), id)`` rows: deterministic, rerun- and
    partitioning-stable, SQL-reproducible.

    For ``alpha=0.5`` weights use exact integer sqrt (``floor(sqrt(n))``
    — IEEE sqrt is correctly rounded, so the DuckDB oracle's
    ``floor(sqrt(n))`` agrees bit-for-bit); other alphas use float ``**``
    with a documented cross-engine last-ulp caveat.

    Scale shape: group counts come from per-block partials (<= groups x
    blocks rows collected), quotas broadcast; per-block top-``k_g``
    partials combine through one bucketed merge — a group ships at most
    ``k_g x blocks`` rows into the exchange, never its full volume."""
    import math

    from .agg import bucketed_groupby

    def pcount(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(group_col, sort=False).size()
        return pd.DataFrame({group_col: c.index, "n": c.to_numpy()})

    cdf = (ds.select_columns([group_col])
           .map_batches(pcount, batch_format="pandas").to_pandas())
    if not len(cdf):  # empty input: to_pandas may carry no columns at all
        return ds.select_columns([id_col, group_col]).limit(0)
    counts = cdf.groupby(group_col)["n"].sum()
    if alpha == 0.5:
        w = {g: math.isqrt(int(n)) for g, n in counts.items()}
        total = sum(w[g] for g in sorted(w))
        quota = {g: (k * w[g]) // total for g in w} if total else {}
    else:
        w = {g: float(n) ** alpha for g, n in counts.items()}
        total = sum(w[g] for g in sorted(w))
        quota = {g: int(math.floor(k * w[g] / total)) for g in w} \
            if total else {}

    def take(df: pd.DataFrame) -> pd.DataFrame:
        # _h rides the exchange so the merge reuses the per-row sha256
        # (the operator's dominant per-row cost) instead of rehashing
        if "_h" not in df.columns:
            df = df.assign(_h=[hashlib.sha256(str(v).encode()).hexdigest()
                               for v in df[id_col]])
        df = df.sort_values(["_h", id_col], kind="mergesort")
        kg = df[group_col].map(quota).fillna(0).to_numpy(dtype=np.int64)
        return df[df.groupby(group_col, sort=False).cumcount() < kg]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return take(df).drop(columns="_h")

    pruned = ds.select_columns([id_col, group_col])
    return bucketed_groupby(
        pruned.map_batches(take, batch_format="pandas"),
        [group_col], merge, buckets=buckets)


def stratified_split(ds: rd.Dataset, *, strata_col: str,
                     key_col: str, ratios: dict[str, float],
                     mode: str = "hash",
                     buckets: int | None = None) -> rd.Dataset:
    """Deterministic train/val/test assignment, stratified by
    ``strata_col``. Appends a ``split`` column; ``ratios`` maps split name
    -> fraction (must sum to 1, iteration order defines the cut order).

    ``mode="hash"`` (the 100-TB path): a row's split is a pure function of
    ``sha256(key_col)`` — the 16-bit hash prefix cut at cumulative-ratio
    thresholds. Zero shuffle, rerun/partitioning-stable, proportions hold
    per stratum in expectation (the hash is independent of the stratum).

    ``mode="exact"``: per-stratum proportions hold EXACTLY (floor at each
    cumulative cut): rows rank within their stratum by (hash, key) and the
    first ``floor(cum_ratio * n)`` go to each split. Costs one shuffle on
    ``strata_col`` and concentrates each stratum in one merge task — use
    only when strata cardinality is bounded and no stratum outgrows a
    worker heap (languages, domains); ``hash`` is the scale path. For a
    layout-independent exact assignment ``key_col`` must be unique per
    row (use an id column) — duplicate keys tie under the (hash, key)
    rank and the cut between them would depend on block order.
    """
    names = list(ratios)
    fracs = np.asarray([ratios[n] for n in names], dtype=np.float64)
    if abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {fracs.sum()}")
    if mode not in ("hash", "exact"):
        raise ValueError(f"unknown mode {mode!r}")


    if mode == "hash":
        # cut the 16-bit hash space at cumulative thresholds; the last
        # split takes the remainder so the thresholds cover [0, 65536)
        cuts = np.floor(np.cumsum(fracs) * 65536).astype(np.int64)
        cuts[-1] = 65536

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            idx = np.searchsorted(cuts, _h16(df[key_col]), side="right")
            return df.assign(split=np.asarray(names, dtype=object)[idx])

        return ds.map_batches(assign, batch_format="pandas")

    from .agg import bucketed_groupby
    cum = np.cumsum(fracs)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=_h16(df[key_col]))
        # (hash, key) is a total order: rank is layout-independent
        df = (df.sort_values(["_h", key_col], kind="mergesort")
              .drop(columns="_h"))
        out = []
        for _, g in df.groupby(strata_col, sort=False):
            n = len(g)
            bounds = np.floor(cum * n).astype(np.int64)
            bounds[-1] = n
            rank = np.arange(n)
            idx = np.searchsorted(bounds, rank, side="right")
            out.append(g.assign(split=np.asarray(names, dtype=object)[idx]))
        return pd.concat(out) if out else df.assign(split=pd.Series(
            [], dtype="object"))

    return bucketed_groupby(ds, [strata_col], merge, buckets=buckets)


def vocab_encode(ds: rd.Dataset, col: str, *, out_col: str | None = None,
                 start: int = 1) -> rd.Dataset:
    """Categorical/label encoding: map a bounded-vocabulary string column
    to dense int64 ids assigned in LEXICOGRAPHIC order (id = start +
    sorted rank), so the mapping is deterministic and a SQL
    ``dense_rank() OVER (ORDER BY col)`` oracle reproduces it exactly.

    Scale shape: the vocabulary is collected via per-block dedup (rows
    shipped = distinct-per-block, not corpus rows), sorted driver-side
    (caller asserts boundedness — the same contract as every broadcast
    lookup in this engine), and shipped back once via ``ray.put``; the
    corpus pass is a zero-shuffle map. NULL values encode as NULL."""
    import ray

    out_col = out_col or f"{col}_id"

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[[col]].dropna().drop_duplicates()

    vocab_df = ds.map_batches(distinct, batch_format="pandas").to_pandas()
    vocab = np.unique(vocab_df[col].to_numpy(dtype=object).astype(str))
    code_of = pd.Series(np.arange(start, start + len(vocab),
                                  dtype=np.int64), index=vocab)
    ref = ray.put(code_of)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        codes = df[col].map(ray.get(ref))
        df = df.copy()
        df[out_col] = codes.astype("Int64")
        return df

    return ds.map_batches(encode, batch_format="pandas")


def weighted_reservoir_topk(ds: rd.Dataset, *, id_col: str,
                            weight_col: str, k: int,
                            keep_cols: list[str] | None = None) -> pd.DataFrame:
    """EXACT weighted sample of ``k`` rows without replacement — the
    Efraimidis-Spirakis A-Res reservoir, distributed: every row gets the
    deterministic key ``ln(u) / w`` with ``u = (sha256_32(id)+1) / 2^32``
    in (0, 1], each block keeps only its local top-``k`` keys, and the
    driver merges the <= k x blocks survivors. Inclusion probabilities
    are proportional-to-weight without replacement (the A-Res guarantee);
    determinism comes from hashing the id instead of drawing randoms, so
    the same corpus always yields the same sample — rerun- and
    resume-stable like ``hash_sample``. Rows with weight <= 0 are never
    selected. Shuffle-free: only local top-k candidates leave any block."""
    import hashlib

    cols = [id_col, weight_col] + [c for c in (keep_cols or [])
                                   if c not in (id_col, weight_col)]

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(np.float64)
        ok = w > 0
        df = df[ok]
        if not len(df):
            return df[cols].assign(akey=np.float64(0))[cols + ["akey"]]
        u32 = np.fromiter(
            (int(hashlib.sha256(str(v).encode()).hexdigest()[:8], 16)
             for v in df[id_col]), dtype=np.int64, count=len(df))
        u = (u32 + 1.0) / 4294967296.0
        akey = np.log(u) / w[ok]
        out = df[cols].assign(akey=akey)
        return out.sort_values(["akey", id_col],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    cand = (ds.map_batches(local_top, batch_format="pandas")
            .to_pandas())
    if "akey" not in cand.columns:   # zero candidate blocks: typed empty
        cand = pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in cols}).assign(
            akey=pd.Series([], dtype="float64"))
    return (cand.sort_values(["akey", id_col], ascending=[False, True],
                             kind="mergesort").head(k)
            .reset_index(drop=True))
