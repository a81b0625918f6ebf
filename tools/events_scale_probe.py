"""Scale probe for the round-4b event operators: generate a synthetic
events table N_ROWS x (event_id, ts, user_id, event_type, value) in /tmp,
then time session_concurrency / events_gapfill / events_twa /
events_equidepth / events_impute on a warm 32-CPU session. Establishes
the linear-regime throughput the sf0.1 bench can't show (100k rows are
startup-cost-dominated).

    PYTHONPATH=/root/repo python tools/events_scale_probe.py [n_rows]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pandas as pd


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    out = "/tmp/events_scale_probe"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    rng = np.random.RandomState(77)
    n_users = max(n // 100, 10)
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = base + rng.randint(0, 30 * 86400 * 10**6, n)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(np.sort(ts_us), unit="us"),
        "user_id": rng.randint(0, n_users, n).astype("int64"),
        "event_type": rng.choice(
            ["click", "view", "buy", "error", "scroll"], n),
        "value": rng.uniform(0, 500, n).round(2)})
    df.to_parquet(f"{out}/events.parquet")
    print(f"corpus: {n} rows / {n_users} users "
          f"({os.path.getsize(f'{out}/events.parquet') / 1e6:.0f} MB)")

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    jobs = {
        "session_concurrency":
            lambda: q.q_session_concurrency(out).count(),
        "events_gapfill": lambda: q.q_events_gapfill(out).count(),
        "events_twa": lambda: q.q_events_twa(out).count(),
        "events_equidepth": lambda: q.q_events_equidepth(out).count(),
        "events_impute": lambda: q.q_events_impute(out).count(),
        "events_timeband": lambda: q.q_events_timeband(out).count(),
        "user_mobility": lambda: len(q.q_user_mobility(out)),
        "basket_rules": lambda: len(q.q_basket_rules(out)),
    }
    jobs["events_twa"]()          # warm the worker pool (untimed)
    for name, fn in jobs.items():
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        print(f"{name:22s} {dt:7.2f} s  out_rows={rows:>9}  "
              f"in_rows/s={n / dt:,.0f}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
