"""Scale probe for dup_ngram_stats: 200k docs (~60 tokens each, n=8) with
a planted 5% of docs sharing a fixed 12-token span — measures wall, the
cross-doc gram set size (the broadcast bound), and recall of the planted
spans (every planted doc must show >= 5 duplicated 8-gram positions).

Usage: PYTHONPATH=/root/repo python tools/dup_ngram_probe.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

WORDS = np.array(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega data graph node edge "
    "spark batch stream merge table column row key value join filter sort "
    "window shuffle hash block probe scan".split())

SPAN = "planted span one two three four five six seven eight nine ten"


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rng = np.random.RandomState(7)
    toks = rng.choice(WORDS, size=(n_docs, 60))
    texts = [" ".join(r) for r in toks]
    planted = rng.rand(n_docs) < 0.05
    texts = [f"{t} {SPAN}" if p else t for t, p in zip(texts, planted)]

    import ray
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from ai_knowledgegraph_extractor_ray.ops.dedup import dup_ngram_stats

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(range(n_docs), dtype="int64"),
        "text": pd.Series(texts, dtype="string"),
    })).repartition(32).materialize()

    t0 = time.perf_counter()
    out = dup_ngram_stats(ds, n=8).to_pandas()
    wall = time.perf_counter() - t0

    from ai_knowledgegraph_extractor_ray.ops.dedup import remove_dup_spans
    t0 = time.perf_counter()
    cleaned = remove_dup_spans(ds, n=8).to_pandas()
    wall_rm = time.perf_counter() - t0
    cleaned = cleaned.sort_values("doc_id").reset_index(drop=True)
    # guarantees: every planted doc loses its whole 12-token span (the
    # straddle grams near the boundary are ALSO legitimately cross-doc —
    # only 44 possible prefix words across 10k planted docs — so removal
    # is >= 12, typically 13-16); chance 8-gram collisions touch only a
    # handful of clean docs (birthday bound ~4 at 200k x 53 grams / 44^8)
    span_gone = (~cleaned.loc[planted, "text_clean"]
                 .str.contains("planted span", regex=False)).all()
    rm_ge_span = (cleaned.loc[planted, "n_tokens_removed"] >= 12).all()
    clean_touched = int((cleaned.loc[~planted, "n_tokens_removed"] > 0).sum())

    out = out.sort_values("doc_id").reset_index(drop=True)
    # the 12-token span yields 5 in-span 8-grams plus boundary grams
    hit = (out.loc[planted, "n_dup_positions"] >= 5).mean()
    clean_fp = (out.loc[~planted, "n_dup_positions"] > 0).mean()
    print(json.dumps({
        "n_docs": n_docs,
        "wall_s": round(wall, 1),
        "docs_per_s": int(n_docs / wall),
        "planted_recall": round(float(hit), 4),
        "clean_dup_rate": round(float(clean_fp), 4),
        "mean_dup_bp_planted": int(out.loc[planted, "dup_bp"].mean()),
        "remove_wall_s": round(wall_rm, 1),
        "remove_docs_per_s": int(n_docs / wall_rm),
        "span_fully_removed": bool(span_gone and rm_ge_span),
        "clean_docs_touched": clean_touched,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
