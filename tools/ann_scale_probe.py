"""Similarity-search scale probe: brute-force cosine top-k vs IVF over a
synthetic embedding corpus with planted cluster structure.

    PYTHONPATH=/root/repo python tools/ann_scale_probe.py [n_vecs] [dim]

Corpus: ``n_vecs`` vectors in ``dim`` dims drawn around 64 random centers
(so IVF's coarse quantizer has real structure to find). Reports wall times
and IVF recall@10 against the exact brute-force answer. One JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries, k = 16, 10

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import similarity

    centers_seed = 0xCE
    n_centers = 64

    def gen(batch: dict) -> pa.Table:
        ids = batch["id"].to_pylist()
        rng_c = np.random.RandomState(centers_seed)
        centers = rng_c.standard_normal((n_centers, dim)).astype(np.float32) * 3
        out = np.empty((len(ids), dim), dtype=np.float32)
        for j, i in enumerate(ids):
            r = np.random.RandomState(i % (2**31))
            out[j] = centers[i % n_centers] + r.standard_normal(dim)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(out.tolist(),
                                               pa.list_(pa.float32()))})

    ds = (rd.range(n_vecs, override_num_blocks=64)
          .map_batches(gen, batch_format="pyarrow").materialize())

    qdf = ds.limit(n_queries).to_pandas()
    queries = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)

    t0 = time.perf_counter()
    exact = similarity.knn_brute_force(ds, queries, k=k).to_pandas()
    bf_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    idx = similarity.IVFIndex.build(ds, n_clusters=n_centers,
                                    train_sample=8192)
    idx.assigned = idx.assigned.materialize()
    build_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    approx = idx.search(queries, k=k, nprobe=8).to_pandas()
    ivf_wall = time.perf_counter() - t0

    # partition-pruned layout: write centroid_id=K/ dirs, search reading
    # only probed partitions; report bytes touched vs the full layout
    import os
    import shutil

    layout = "/tmp/ann_probe_ivf_layout"
    shutil.rmtree(layout, ignore_errors=True)
    t0 = time.perf_counter()
    widx = idx.write(layout)
    write_wall = time.perf_counter() - t0

    def dir_bytes(d: str) -> int:
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs)

    total_bytes = dir_bytes(layout)
    q_unit = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    probe = np.argsort(-(q_unit @ idx.centroids.T), axis=1)[:, :8]
    probed_bytes = sum(dir_bytes(os.path.join(layout, f"centroid_id={c}"))
                       for c in sorted({int(c) for c in probe.ravel()}))
    t0 = time.perf_counter()
    pruned = widx.search_pruned(queries, k=k, nprobe=8).to_pandas()
    pruned_wall = time.perf_counter() - t0

    # probe-proportionality: ONE query at nprobe=8 touches ~8/64 of the bytes
    one_q_bytes = sum(dir_bytes(os.path.join(layout, f"centroid_id={c}"))
                      for c in sorted({int(c) for c in probe[:1].ravel()}))
    pruned_matches = pruned[["query_id", "vec_id", "rank"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True).equals(
        approx[["query_id", "vec_id", "rank"]].sort_values(
            ["query_id", "rank"]).reset_index(drop=True))
    shutil.rmtree(layout, ignore_errors=True)

    recalls = []
    for qi in range(n_queries):
        want = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(want & got) / max(len(want), 1))

    out = {
        "n_vecs": n_vecs,
        "dim": dim,
        "brute_force_wall_s": round(bf_wall, 1),
        "brute_force_vec_scores_per_sec": round(n_vecs * n_queries / bf_wall),
        "ivf_build_wall_s": round(build_wall, 1),
        "ivf_search_wall_s": round(ivf_wall, 1),
        "ivf_recall_at_10": round(float(np.mean(recalls)), 4),
        "nprobe": 8,
        "n_clusters": n_centers,
        "layout_write_wall_s": round(write_wall, 1),
        "pruned_search_wall_s": round(pruned_wall, 1),
        "layout_total_bytes": total_bytes,
        "layout_probed_bytes": probed_bytes,
        "probed_bytes_fraction": round(probed_bytes / max(total_bytes, 1), 3),
        "one_query_bytes_fraction": round(one_q_bytes / max(total_bytes, 1), 3),
        "pruned_matches_inmemory": bool(pruned_matches),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0 if out["ivf_recall_at_10"] >= 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
