"""Triangle counting at scale: degree-ordered distributed count on a
Zipf-skewed random graph, verified against DuckDB's three-way self-join
on the same edge list. Usage:

    PYTHONPATH=/root/repo python tools/triangle_probe.py [n_edges] [cpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def main() -> int:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ai_knowledgegraph_extractor_ray.ops.graph import triangle_count

    rng = np.random.RandomState(5)
    n_nodes = m // 10
    # Zipf-ish endpoints: heavy hubs stress the degree-ordering bound
    a = (rng.zipf(1.5, m) % n_nodes).astype(np.int64)
    b = (rng.zipf(1.5, m) % n_nodes).astype(np.int64)
    df = pd.DataFrame({
        "canonical_src": pd.Series(a).map("n{:07d}".format),
        "canonical_dst": pd.Series(b).map("n{:07d}".format)})
    nb = 64
    frames = np.array_split(df, nb)
    ds = rd.from_pandas(list(frames)).materialize()

    t0 = time.perf_counter()
    ours = int(triangle_count(ds)["triangles"][0])
    t_ours = time.perf_counter() - t0

    import duckdb
    con = duckdb.connect()
    con.register("edges", df)
    t0 = time.perf_counter()
    want = con.execute("""
        WITH und AS (SELECT DISTINCT
               least(canonical_src, canonical_dst) AS u,
               greatest(canonical_src, canonical_dst) AS v
             FROM edges WHERE canonical_src <> canonical_dst)
        SELECT count(*) FROM und e1
        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v""").fetchone()[0]
    t_duck = time.perf_counter() - t0

    print({"n_edges": m, "n_nodes": n_nodes, "cpus": cpus,
           "triangles": ours, "match": ours == want,
           "ours_s": round(t_ours, 2), "duckdb_join_s": round(t_duck, 2),
           "edges_per_sec": int(m / t_ours)})
    ray.shutdown()
    return 0 if ours == want else 1


if __name__ == "__main__":
    raise SystemExit(main())
