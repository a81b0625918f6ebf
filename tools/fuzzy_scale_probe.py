"""Scale probe: fuzzy_label_pairs at a large synthetic vocabulary.

    PYTHONPATH=/root/repo python tools/fuzzy_scale_probe.py [n_labels]

Measures wall time, output-pair volume, and recall against the planted
truth set (each planted typo must pair with its base label; every
distance-2 transposition decoy must be absent). Deterministic corpus:
n distinct base labels from a seeded generator; every 10th label also
plants one single-deletion typo (truth pair), every 50th a
transposition decoy.

One JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import string
import sys
import time


def make_labels(n: int) -> tuple[list[str], set, set]:
    import numpy as np
    rng = np.random.default_rng(7)
    alpha = np.array(list(string.ascii_lowercase))
    base = ["".join(alpha[rng.integers(0, 26, size=rng.integers(8, 16))])
            for _ in range(n)]
    base = list(dict.fromkeys(base))
    labels, truth, decoys = list(base), set(), set()
    for i, s in enumerate(base):
        if i % 10 == 0 and len(s) > 8:
            t = s[:4] + s[5:]                       # planted deletion typo
            labels.append(t)
            truth.add(tuple(sorted((s, t))))
        if i % 50 == 0 and len(s) > 9:
            d = s[1] + s[0] + s[2:]                 # distance-2 decoy
            labels.append(d)
            decoys.add(tuple(sorted((s, d))))
    return labels, truth, decoys


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

    labels, truth, decoys = make_labels(n)
    ds = rd.from_pandas(pd.DataFrame({"label": labels})).repartition(64)
    t0 = time.perf_counter()
    out = fuzzy_label_pairs(ds).to_pandas()
    wall = round(time.perf_counter() - t0, 2)
    ok = all(_within_one_edit(a, b)
             for a, b in zip(out["label_a"], out["label_b"]))
    found = {tuple(sorted(p))
             for p in zip(out["label_a"], out["label_b"])}
    print(json.dumps({
        "n_labels": len(labels), "planted_truth": len(truth),
        "pairs_found": int(len(out)),
        "recall_planted": round(len(truth & found) / max(len(truth), 1), 4),
        "decoys_leaked": len(decoys & found),
        "extra_pairs": len(found - truth),
        "all_verified": bool(ok),
        "wall_s": wall,
        "labels_per_sec": round(len(labels) / wall, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
