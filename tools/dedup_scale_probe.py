"""Dedup scale probe: plant known exact + near duplicates in a synthetic
corpus, run the dedup stack, report recall/precision and wall time.

    PYTHONPATH=/root/repo python tools/dedup_scale_probe.py [n_docs]

Corpus: word-soup documents (~80 tokens from a 400-word vocabulary).
10% of docs are exact copies of an earlier doc; 10% are near copies with
3 tokens replaced (n-gram Jaccard ~0.85). Ground truth = the planted
(copy, original) pairs. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd


def build_corpus(n_docs: int, seed: int = 17) -> tuple[pd.DataFrame, set, set]:
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:03d}" for i in range(400)])
    texts: list[str] = []
    exact_truth: set[tuple[int, int]] = set()
    near_truth: set[tuple[int, int]] = set()
    for i in range(n_docs):
        r = rng.rand()
        if i > 10 and r < 0.10:                      # exact duplicate
            src = int(rng.randint(0, i))
            texts.append(texts[src])
            exact_truth.add((min(src, i), max(src, i)))
        elif i > 10 and r < 0.20:                    # near duplicate
            src = int(rng.randint(0, i))
            toks = texts[src].split()
            for _ in range(3):
                toks[int(rng.randint(0, len(toks)))] = str(
                    vocab[rng.randint(0, len(vocab))])
            texts.append(" ".join(toks))
            near_truth.add((min(src, i), max(src, i)))
        else:
            texts.append(" ".join(vocab[rng.randint(0, len(vocab), size=80)]))
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})
    return df, exact_truth, near_truth


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import dedup

    df, exact_truth, near_truth = build_corpus(n_docs)
    ds = rd.from_pandas(df).repartition(64).materialize()

    t0 = time.perf_counter()
    n_kept = dedup.exact_dedup(ds).count()
    exact_wall = time.perf_counter() - t0
    # distinct texts = docs minus exact copies (copies of copies collapse)
    n_distinct = df["text"].nunique()

    t0 = time.perf_counter()
    pairs = dedup.minhash_candidate_pairs(ds, threshold=0.7).to_pandas()
    minhash_wall = time.perf_counter() - t0
    got = ({(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
           if len(pairs) else set())

    # ground truth at the PAIR level, restricted to directly planted pairs;
    # exact copies also produce jaccard-1.0 pairs — count both as expected
    expected = exact_truth | near_truth
    found_planted = sum(1 for p in expected if p in got)
    recall = found_planted / len(expected) if expected else 1.0
    # precision: every reported pair must genuinely clear the threshold —
    # verify a sample exactly
    sample = pairs.head(500)
    ok = 0
    text_of = df["text"].to_dict()
    for a, b, j in zip(sample["id_a"], sample["id_b"], sample["jaccard"]):
        ja = dedup.jaccard_of(dedup.word_ngrams(text_of[int(a)]),
                              dedup.word_ngrams(text_of[int(b)]))
        ok += abs(ja - j) < 1e-9 and ja >= 0.7
    precision_sample = ok / max(len(sample), 1)

    t0 = time.perf_counter()
    survivors = dedup.near_dedup_minhash(ds, threshold=0.7).count()
    near_dedup_wall = time.perf_counter() - t0

    out = {
        "n_docs": n_docs,
        "exact_dedup_kept": int(n_kept),
        "exact_distinct_truth": int(n_distinct),
        "exact_correct": bool(n_kept == n_distinct),
        "exact_wall_s": round(exact_wall, 1),
        "minhash_pairs": int(len(pairs)),
        "planted_pairs": len(expected),
        "planted_recall": round(recall, 4),
        "verified_precision_sample": round(precision_sample, 4),
        "minhash_wall_s": round(minhash_wall, 1),
        "near_dedup_survivors": int(survivors),
        "near_dedup_wall_s": round(near_dedup_wall, 1),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0 if out["exact_correct"] and recall >= 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())
