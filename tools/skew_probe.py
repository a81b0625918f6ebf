"""Skew-mitigation wall-time probe: 80% of conversations hash into one of
32 base partitions; auto_split_skew should cut the straggler wall."""
import time, tempfile, shutil, zlib
import numpy as np, pyarrow as pa, pyarrow.parquet as pq
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
@ray.remote
def _noop(): return 0
ray.get([_noop.remote() for _ in range(64)])
from ai_knowledgegraph_extractor_ray.config import KGConfig
from ai_knowledgegraph_extractor_ray.pipelines import kg
from ai_knowledgegraph_extractor_ray.sources import transcripts as src

P = 32
n_hot, n_cold = 160_000, 40_000
corpus = "/tmp/skew_probe_corpus"
import os
if not os.path.exists(corpus + ".done"):
    hot, cold = [], []
    i = 0
    while len(hot) < n_hot or len(cold) < n_cold:
        cid = f"conv_{i:07d}"
        (hot if zlib.crc32(cid.encode()) % P == 0 else cold).append(cid)
        i += 1
    ids = hot[:n_hot] + cold[:n_cold]
    base = src.synthetic_transcripts(n_convs=len(ids), seed=9, include_golden=False,
                                     override_num_blocks=64)
    remap = {f"conv_{j:08d}": ids[j] for j in range(len(ids))}
    def rn(t: pa.Table) -> pa.Table:
        new = pa.array([remap[c] for c in t["conv_id"].to_pylist()], pa.string())
        return t.set_column(0, "conv_id", new)
    shutil.rmtree(corpus, ignore_errors=True)
    base.map_batches(rn, batch_format="pyarrow").write_parquet(corpus)
    open(corpus + ".done", "w").write("ok")

for tag, split in (("plain", False), ("split", True)):
    cfg = KGConfig(num_partitions=P, auto_split_skew=split, skew_split_threshold=2.0)
    out = tempfile.mkdtemp(prefix=f"skew_{tag}_", dir="/dev/shm")
    t0 = time.perf_counter()
    s = kg.run_kg_job(src.read_transcripts(corpus, override_num_blocks=128), cfg, out, resume=False)
    wall = time.perf_counter() - t0
    print(f"[{tag}] wall={wall:.2f}s parts={s['partitions_total']} "
          f"max_part_wall={s['max_partition_wall_s']:.2f}s "
          f"sum={s['sum_partition_wall_s']:.1f}s edges={s['n_edges']}")
    shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
