"""Scale probe for pagerank_distributed (round-5 VERDICT #6 done-bar):
>= 10M synthetic nodes, rank state exchange-partitioned — the driver never
holds the rank vector. Reports wall time per stage, output count, and
driver RSS before/after.

    PYTHONPATH=/root/repo python tools/pagerank_scale_probe.py [n_nodes] [n_edges]
"""

from __future__ import annotations

import resource
import sys
import time


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000_000

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ai_knowledgegraph_extractor_ray.ops.graph import pagerank_distributed

    def rss_mb() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    # deterministic synthetic power-law-ish edges, written shard-by-shard
    # so the generator itself never holds the graph
    import os
    import shutil
    out = "/tmp/pr_probe_edges"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    t0 = time.perf_counter()
    shard = 2_000_000
    rng = np.random.RandomState(0)
    for i in range(0, n_edges, shard):
        k = min(shard, n_edges - i)
        # skewed sources (zipf-ish via squaring uniform), uniform dsts
        src = (rng.rand(k) ** 2 * n_nodes).astype(np.int64)
        dst = rng.randint(0, n_nodes, k)
        t = pa.table({
            "canonical_src": pa.compute.binary_join_element_wise(
                "n", pa.compute.cast(pa.array(src), pa.string()), ""),
            "canonical_dst": pa.compute.binary_join_element_wise(
                "n", pa.compute.cast(pa.array(dst), pa.string()), ""),
            "weight": pa.array(rng.randint(1, 4, k), pa.int64())})
        pq.write_table(t, f"{out}/part-{i // shard:04d}.parquet")
    gen_s = time.perf_counter() - t0
    print(f"generated {n_edges} edges over ~{n_nodes} nodes in {gen_s:.1f}s "
          f"(rss {rss_mb():.0f} MB)")

    edges = rd.read_parquet(out)
    t0 = time.perf_counter()
    ranks = pagerank_distributed(edges, iters=3)
    sink = "/tmp/pr_probe_ranks"
    shutil.rmtree(sink, ignore_errors=True)
    ranks.write_parquet(sink)  # consume as a stream — never collected
    pr_s = time.perf_counter() - t0

    meta = pq.read_table(sink, columns=["rank"])
    n_out = len(meta)
    total_rank = float(pa.compute.sum(meta["rank"]).as_py())
    print(f"pagerank_distributed: {n_out} nodes ranked in {pr_s:.1f}s "
          f"({n_edges * 3 / pr_s / 1e6:.2f}M edge-visits/s), "
          f"sum(rank)={total_rank:.1f}, driver rss {rss_mb():.0f} MB")
    ray.shutdown()


if __name__ == "__main__":
    main()
