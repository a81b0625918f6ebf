"""Total-order sort at scale: range_sort (sample-sort exchange) vs Ray
Data's native sort-based ``Dataset.sort`` on the same input, identical
output order verified. Usage:

    PYTHONPATH=/root/repo python tools/sort_probe.py [n_rows] [cpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ai_knowledgegraph_extractor_ray.ops.sort import range_sort

    rng = np.random.RandomState(11)
    nb = 64
    per = n // nb
    frames = [pd.DataFrame({
        "v": rng.randint(0, n // 4, per).astype("int64"),  # ~4x ties
        "id": np.arange(i * per, (i + 1) * per, dtype=np.int64)})
        for i in range(nb)]
    ds = rd.from_pandas(frames).materialize()

    t0 = time.perf_counter()
    ours = range_sort(ds, ["v", "id"]).materialize()
    t_ours = time.perf_counter() - t0

    t0 = time.perf_counter()
    native = ds.sort(["v", "id"]).materialize()
    t_native = time.perf_counter() - t0

    a = ours.to_pandas().reset_index(drop=True)
    b = native.to_pandas().reset_index(drop=True)
    same = a.equals(b)
    print({"n_rows": n, "cpus": cpus,
           "range_sort_s": round(t_ours, 2),
           "native_sort_s": round(t_native, 2),
           "speedup": round(t_native / t_ours, 2),
           "rows_per_sec_ours": int(n / t_ours),
           "identical_order": bool(same)})
    ray.shutdown()
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
