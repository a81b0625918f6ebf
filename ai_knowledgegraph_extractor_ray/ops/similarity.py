"""Similarity search over an embedding column (list<float>).

* ``knn_brute_force`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul and emits only its
  LOCAL top-k per query, and a final uniform ``groupby(query_id)`` reduces
  per-block top-ks to the global answer. Data moved by the shuffle is
  O(num_blocks * Q * k), independent of corpus size — the scale path.
* ``IVFIndex`` — the clustered variant: k-means centroids trained on a
  bounded sample, assignments computed distributed (one matmul per batch),
  searches probe only the ``nprobe`` nearest centroid partitions. On a real
  cluster the assignment column doubles as the partition key so a probe
  touches only its buckets' files (partition pruning at the read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return np.divide(m, norms, where=norms > 0)


def knn_brute_force(ds: rd.Dataset, queries: np.ndarray, k: int = 10, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_ids: np.ndarray | None = None) -> rd.Dataset:
    """Exact cosine top-k of every query against the whole dataset.

    Returns (query_id, vec_id, score, rank), rank 0 = best. Deterministic
    tie-break on vec_id."""
    q = _unit(np.asarray(queries, dtype=np.float32))
    qids = (np.arange(len(q)) if query_ids is None
            else np.asarray(query_ids)).astype(np.int64)
    q_ref = ray.put(q)

    def local_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _unit(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = qm @ vecs.T                     # (Q, B)
        kk = min(k, sims.shape[1])
        # argpartition then exact sort of the k candidates per query
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            cand = part[qi]
            out_q.append(np.full(kk, qids[qi]))
            out_id.append(ids[cand])
            out_s.append(sims[qi, cand])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s).astype(np.float64)),
        })

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", id_col], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")


# --- IVF ---------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 0xC1) -> np.ndarray:
    """Plain seeded Lloyd's on unit vectors (cosine k-means)."""
    rng = np.random.RandomState(seed)
    sample = _unit(sample)
    cent = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


class IVFIndex:
    """Inverted-file ANN: coarse cosine k-means + per-centroid buckets.

    ``build`` trains centroids on a driver-side sample (bounded:
    ``train_sample`` rows, NOT the corpus) and computes assignments
    distributed; ``search`` probes the ``nprobe`` closest centroids only.
    """

    def __init__(self, centroids: np.ndarray, assigned: rd.Dataset | None,
                 id_col: str, vec_col: str, path: str | None = None):
        self.centroids = centroids
        self.assigned = assigned          # ds + "centroid_id" column
        self.id_col = id_col
        self.vec_col = vec_col
        self.path = path                  # cluster-partitioned parquet layout

    @classmethod
    def build(cls, ds: rd.Dataset, *, n_clusters: int = 16,
              train_sample: int = 4096, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "IVFIndex":
        sample = ds.limit(train_sample).to_pandas()
        train = np.asarray(sample[vec_col].tolist(), dtype=np.float32)
        centroids = _kmeans(train, n_clusters)
        c_ref = ray.put(centroids)

        def assign(t: pa.Table) -> pa.Table:
            cent = ray.get(c_ref)
            vecs = _unit(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
            a = (vecs @ cent.T).argmax(axis=1).astype(np.int32)
            return t.append_column("centroid_id", pa.array(a))

        return cls(centroids, ds.map_batches(assign, batch_format="pyarrow"),
                   id_col, vec_col)

    def write(self, path: str) -> "IVFIndex":
        """Persist as a CLUSTER-PARTITIONED parquet layout: one
        ``centroid_id=K/`` hive directory per centroid plus the centroid
        matrix. This is the on-cluster IVF win the in-memory mode can't
        realize: a probe then reads ONLY its clusters' files — bytes
        scanned scale with nprobe/n_clusters, not corpus size
        (``search_pruned``; evidenced in tools/ann_scale_probe.py)."""
        import os
        if self.assigned is None:
            raise ValueError("index was opened from disk; nothing to write")
        # Consolidate blocks per cluster first: write_parquet splits EVERY
        # block by partition value, so unaligned blocks would fan out to
        # n_blocks x n_clusters tiny files (measured 10x slower to read).
        # One hash exchange keyed on the centroid id gives ~1 block — and
        # hence ~1 file — per cluster directory.
        from .agg import bucketed_groupby
        aligned = bucketed_groupby(self.assigned, ["centroid_id"],
                                   lambda df: df,
                                   buckets=max(len(self.centroids), 1))
        aligned.write_parquet(path, partition_cols=["centroid_id"])
        np.save(os.path.join(path, "_centroids.npy"), self.centroids)
        return IVFIndex(self.centroids, self.assigned, self.id_col,
                        self.vec_col, path=path)

    @classmethod
    def open(cls, path: str, *, id_col: str = "vec_id",
             vec_col: str = "embedding") -> "IVFIndex":
        """Open a written layout without loading any vector data — only the
        centroid matrix (n_clusters x dim) comes off storage."""
        import os
        centroids = np.load(os.path.join(path, "_centroids.npy"))
        return cls(centroids, None, id_col, vec_col, path=path)

    def search_pruned(self, queries: np.ndarray, k: int = 10,
                      nprobe: int = 4) -> rd.Dataset:
        """Probe-pruned search over a written layout: reads only the
        partition directories any query probes (union over queries), then
        runs the standard per-block local-top-k / per-query merge. The
        centroid id rides back in the file PATH (hive layout), re-derived
        vectorized — identical results to ``search`` on the same index."""
        if self.path is None:
            raise ValueError("search_pruned needs a written layout; call "
                             "write(path) or open(path) first")
        import os

        import pyarrow.compute as pc
        q = _unit(np.asarray(queries, dtype=np.float32))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        import glob
        dirs = [os.path.join(self.path, f"centroid_id={c}")
                for c in sorted({int(c) for c in probe.ravel()})]
        # read_parquet expands a single directory but not a list of them —
        # list the probed partitions' files explicitly
        files = [f for d in dirs
                 for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
        if not files:
            return rd.from_items([])
        # the reader infers hive partitioning from the paths and attaches
        # centroid_id as a STRING partition column — cast it back
        pruned = rd.read_parquet(files)

        def fix_cid(t: pa.Table) -> pa.Table:
            i = t.column_names.index("centroid_id")
            return t.set_column(i, "centroid_id",
                                pc.cast(t["centroid_id"], pa.int32()))

        return self._search_on(
            pruned.map_batches(fix_cid, batch_format="pyarrow"),
            q, probe, k)

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> rd.Dataset:
        """Approximate top-k: per query, only rows assigned to its nprobe
        nearest centroids are scored. Same output schema as brute force."""
        q = _unit(np.asarray(queries, dtype=np.float32))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        if self.assigned is None:
            return self.search_pruned(queries, k=k, nprobe=nprobe)
        return self._search_on(self.assigned, q, probe, k)

    def _search_on(self, assigned: rd.Dataset, q: np.ndarray,
                   probe: np.ndarray, k: int) -> rd.Dataset:
        q_ref = ray.put(q)
        probe_ref = ray.put(probe)
        id_col, vec_col = self.id_col, self.vec_col
        kk = k

        def local_topk(t: pa.Table) -> pa.Table:
            qm, pr = ray.get(q_ref), ray.get(probe_ref)
            vecs = _unit(np.asarray(t[vec_col].to_pylist(), dtype=np.float32))
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = t["centroid_id"].to_numpy(zero_copy_only=False)
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qm)):
                mask = np.isin(cents, pr[qi])
                if not mask.any():
                    continue
                sims = vecs[mask] @ qm[qi]
                sel_ids = ids[mask]
                kx = min(kk, len(sims))
                cand = np.argpartition(-sims, kx - 1)[:kx]
                out_q.append(np.full(kx, qi, dtype=np.int64))
                out_id.append(sel_ids[cand])
                out_s.append(sims[cand])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s).astype(np.float64)),
            })

        def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["score", id_col], ascending=[False, True],
                                kind="mergesort").head(kk).reset_index(drop=True)
            df["rank"] = np.arange(len(df), dtype=np.int64)
            return df

        local = assigned.map_batches(local_topk, batch_format="pyarrow")
        return local.groupby("query_id").map_groups(reduce_topk,
                                                    batch_format="pandas")
