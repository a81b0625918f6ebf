"""Driver-mimicking correctness harness: run every __ray_entry__ query and
its DuckDB oracle side-by-side and compare (row count, sorted columns,
order-insensitive values). Usage:

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"COLS ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # Dtype-exact like the driver: a float column on one side and an
        # integer column on the other hash-mismatches even if values agree
        # (this is how the round-1 events_asof float64 leak slipped through).
        if av.dtype.kind != bv.dtype.kind and {av.dtype.kind, bv.dtype.kind} <= {"f", "i", "u"}:
            return f"DTYPE col={c}: ray={av.dtype} sql={bv.dtype}"
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            # Driver-precision: the gate hashes values bit-exactly, so a
            # last-ulp mean drift IS a failure (the round-4 default
            # rtol=1e-5 masked exactly that in lineitem_profile). Require
            # bit equality (NaN==NaN); report the drift magnitude so a
            # genuine ulp-level miss is distinguishable from a wrong
            # algorithm.
            af, bf = av.astype(float), bv.astype(float)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            ok = bool(eq.all())
            if not ok:
                d = np.abs(af - bf)
                d = d[~np.isnan(d)]
                mx = float(d.max()) if len(d) else float("nan")
                bad = np.nonzero(~eq)[0][:3]
                detail = "; ".join(
                    f"[{i}] ray={af[i]!r} sql={bf[i]!r}" for i in bad)
                return f"VALUES col={c} (maxabs={mx:.3e}): {detail}"
        else:
            ok = (av == bv).all()
        if not ok:
            bad = np.nonzero(av != bv)[0][:3] if av.dtype == bv.dtype else [0]
            detail = "; ".join(f"[{i}] ray={av[i]!r} sql={bv[i]!r}" for i in bad)
            return f"VALUES col={c}: {detail}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(ray_df)}")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SQL-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:24s} {verdict} rows={len(ray_df)}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
