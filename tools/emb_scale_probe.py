"""Recall/amplification probe for banded embedding_near_pairs: 50k vectors,
2000 planted near-dup pairs at cosine>=0.9; measure recall, precision and
vector-carrying rows emitted per vector."""
import numpy as np, pandas as pd, ray, time
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from ai_knowledgegraph_extractor_ray.ops import dedup

rng = np.random.RandomState(7)
N, D, P = 50_000, 64, 2000
base = rng.standard_normal((N, D)).astype(np.float32)
# plant: vec i+N = small perturbation of vec i (cosine ~0.97)
planted = base[:P] + 0.15 * rng.standard_normal((P, D)).astype(np.float32)
allv = np.vstack([base, planted])
unit = allv / np.linalg.norm(allv, axis=1, keepdims=True)
true_cos = (unit[:P] * unit[N:N+P]).sum(axis=1)
truth = {(i, N+i) for i in range(P) if true_cos[i] >= 0.9}
print("planted true pairs:", len(truth))

df = pd.DataFrame({"vec_id": np.arange(N+P, dtype=np.int64),
                   "embedding": [v.tolist() for v in allv]})
ds = rd.from_pandas(df).repartition(32)
t0 = time.perf_counter()
pairs = dedup.embedding_near_pairs(ds, threshold=0.9).to_pandas()
dt = time.perf_counter() - t0
got = set(zip(pairs["id_a"], pairs["id_b"]))
hits = len(got & truth)
# random 64-d vectors essentially never reach cos 0.9, so precision ~= hits/got
print(f"wall={dt:.1f}s pairs={len(got)} recall={hits/len(truth):.3f} "
      f"nonplanted={len(got-truth)}")
ray.shutdown()
