"""Scale probe for incremental dedup: index a planted 100k-doc corpus
once, then dedup a 10k-doc new batch (half of it near-dups of indexed
docs) against the index — recall/precision on the planted pairs plus
walls for index build vs incremental probe vs full re-run.

Usage: PYTHONPATH=/root/repo python tools/incr_dedup_probe.py [n_old] [n_new]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np
import pandas as pd

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
         "nu xi omicron pi rho sigma tau upsilon phi chi psi omega data "
         "graph node edge spark batch stream merge table column row key "
         "value join filter sort window shuffle hash").split()


def synth(rng: np.random.RandomState, n: int, start_id: int,
          near_of: pd.DataFrame | None = None, near_frac: float = 0.5):
    """n docs; if near_of given, near_frac of them are 1-word edits of
    random docs from it (planted near-dups)."""
    ids, texts, planted = [], [], []
    base_pool = None if near_of is None else near_of.reset_index(drop=True)
    for i in range(n):
        did = start_id + i
        if base_pool is not None and rng.rand() < near_frac:
            src_row = base_pool.iloc[rng.randint(len(base_pool))]
            toks = src_row["text"].split()
            j = rng.randint(len(toks))
            toks[j] = WORDS[rng.randint(len(WORDS))] + "x"
            texts.append(" ".join(toks))
            planted.append((int(src_row["doc_id"]), did))
        else:
            texts.append(" ".join(rng.choice(WORDS, 60)))
        ids.append(did)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "text": pd.Series(texts, dtype="string")}), planted


def main() -> int:
    n_old = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    import ray
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ai_knowledgegraph_extractor_ray.ops.dedup import (
        build_minhash_index,
        dedup_against_index,
        minhash_candidate_pairs,
    )

    rng = np.random.RandomState(21)
    old_df, _ = synth(rng, n_old, 0)
    new_df, planted = synth(rng, n_new, n_old, near_of=old_df)
    old = rd.from_pandas(old_df).repartition(32).materialize()
    new = rd.from_pandas(new_df).repartition(8).materialize()

    idx = "/tmp/incr_probe_idx"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_minhash_index(old, idx)
    t_index = time.perf_counter() - t0

    t0 = time.perf_counter()
    got = dedup_against_index(new, idx, old, threshold=0.5).to_pandas()
    t_incr = time.perf_counter() - t0
    got_pairs = set(zip(got["old_id"].astype(int), got["new_id"].astype(int)))
    truth = set(planted)
    recall = len(got_pairs & truth) / max(len(truth), 1)
    precision = len(got_pairs & truth) / max(len(got_pairs), 1)

    # full re-run comparison: near-dup pairs over old+new combined
    t0 = time.perf_counter()
    both = old.union(new).materialize()
    full = minhash_candidate_pairs(both, threshold=0.5).to_pandas()
    t_full = time.perf_counter() - t0

    print(json.dumps({
        "n_old": n_old, "n_new": n_new, "planted": len(truth),
        "index_build_s": round(t_index, 1),
        "incremental_s": round(t_incr, 1),
        "full_rerun_s": round(t_full, 1),
        "recall": round(recall, 4),
        "precision": round(precision, 4),
        "found_pairs": len(got_pairs),
        "speedup_vs_full": round(t_full / t_incr, 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
