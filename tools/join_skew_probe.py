"""Measured evidence for the skew-aware hybrid join: a fact table whose
join key is 80% ONE value against a dimension table, plain co-bucketed
hash join vs skew_aware_inner_join at full CPU count.

Usage: PYTHONPATH=/root/repo python tools/join_skew_probe.py [n_rows]

The plain plan concentrates the hot key's entire row set into one merge
task (one core works, the rest idle); the hybrid plan broadcasts the hot
key's dimension rows and joins them map-side, so the hot rows never
co-locate. Both plans must produce identical results (verified by sorted
hash)."""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        hash_inner_join,
        skew_aware_inner_join,
    )

    rng = np.random.RandomState(7)
    n_keys = 100_000
    keys = np.where(rng.rand(n) < 0.8, 42,
                    rng.randint(0, n_keys, n)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(n_keys, dtype="int64"),
                          "rv": rng.randint(0, 1000, n_keys).astype("int64")})
    lds = rd.from_pandas(left).repartition(64).materialize()
    rds = rd.from_pandas(right).repartition(8).materialize()

    def run(fn, label, **kw):
        t0 = time.perf_counter()
        out = fn(lds, rds, "k", **kw)
        tot = out.map_batches(
            lambda df: pd.DataFrame({"s": [int((df["lv"].sum()
                                               + df["rv"].sum()) % (1 << 61)),
                                           ],
                                     "n": [len(df)]}),
            batch_format="pandas").to_pandas().sum()
        wall = time.perf_counter() - t0
        print(f"{label:>12}: {wall:6.2f} s  rows={int(tot['n'])} "
              f"checksum={int(tot['s']) % (1 << 61)}")
        return wall, int(tot["n"]), int(tot["s"]) % (1 << 61)

    w_plain, n_plain, c_plain = run(hash_inner_join, "plain")
    w_skew, n_skew, c_skew = run(skew_aware_inner_join, "skew-aware",
                                 hot_threshold=max(2 * n // n_keys, 1000))
    assert n_plain == n_skew, (n_plain, n_skew)
    assert c_plain == c_skew, "checksum mismatch"
    print(f"speedup: {w_plain / w_skew:.2f}x (identical output, "
          f"{n_plain} rows)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
