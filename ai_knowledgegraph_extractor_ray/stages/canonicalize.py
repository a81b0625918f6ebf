"""Entity linking + canonicalization: mentions -> alias table -> canonical graph.

The reference links entities only by exact case-insensitive label match inside
one document (reference: services.py:489-490). At corpus scale that becomes a
distributed canonicalization problem (SURVEY.md §2.4 J2): cluster the surface
forms of *all* conversations into canonical entities, then rewrite every edge
onto canonical ids and deduplicate.

Scale design (SURVEY.md §7.2, shuffles #2/#3/#4):

* **Mention counting is two-phase.** ``map_batches`` first collapses each
  block to distinct ``(norm, label) -> count`` partials (the combiner), so the
  ``groupby(norm)`` shuffle moves at most |distinct variants| rows per block,
  never one row per mention — this is what defuses hot-key skew (a surface
  form appearing in 30% of conversations contributes one partial row per
  block, not millions of mention rows); ``alias_salt_buckets`` sets the
  merge fan-out of the bucketed reduce.
* **LSH blocking over *distinct norms*, not mentions.** MinHash signatures of
  char-3-gram shingles, banded; only norms sharing a band bucket are compared
  (verified with true Jaccard + an embedding-cosine score from a hash-feature
  scorer actor pool). Buckets are size-capped: a degenerate bucket (e.g. all
  empty-shingle norms) degrades to "no link" instead of an O(n^2) blowup.
* **Cluster merge is driver-side union-find over candidate PAIRS** (tiny:
  bounded by sum of bucket-pair counts), never over mentions or the full
  vocabulary. The alias table itself stays a Dataset end-to-end (root
  assignment + per-root reduce are distributed; it streams to parquet);
  only a FREQUENCY-THRESHOLDED slice — clustered norms plus the
  ``broadcast_vocab_cap`` hottest — is broadcast via ``ray.put`` into the
  rewrite stage, the long tail falling back to identity hashing (which
  yields the identical canonical id for unclustered norms). A shuffle join
  on surface form would move the (large) edge table for the benefit of the
  (small) alias side.
* **Canonical edge dedup** is the same partial-count trick keyed on the
  canonical (src, pred, dst) triple; ``weight`` = number of supporting
  extractions, matching the north star's "deduplicated edge IDs".
"""

from __future__ import annotations

import hashlib
import re
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import KGConfig

_WS = re.compile(r"\s+")


def normalize_surface(label: str) -> str:
    """Normalization key: casefold + whitespace collapse (the scaled analogue
    of the reference's ``k.lower() == x.lower()`` lookup, services.py:489)."""
    return _WS.sub(" ", label.strip()).casefold()


def canonical_id_of(cluster_key: str) -> str:
    return "e_" + hashlib.sha256(cluster_key.encode()).hexdigest()[:16]


# --- phase 1: mention partials ----------------------------------------------

def _mention_partials(batch: pa.Table) -> pa.Table:
    """Collapse one block of node rows to (norm, label) -> count partials
    (the combiner: a hot surface form leaves the block as ONE row — this
    per-block partial IS the hot-key defense; no extra salt column is
    needed because a key contributes at most one row per block per
    variant)."""
    labels = batch["label"].to_pylist()
    counts: dict[tuple[str, str], int] = {}
    for lab in labels:
        if lab is None:
            continue
        key = (normalize_surface(lab), lab)
        counts[key] = counts.get(key, 0) + 1
    return pa.table({
        "norm": pa.array([k[0] for k in counts], pa.string()),
        "label": pa.array([k[1] for k in counts], pa.string()),
        "cnt": pa.array(list(counts.values()), pa.int64()),
    })


def _pick_variant(df: pd.DataFrame) -> pd.DataFrame:
    """Final per-norm reduce: total mentions + most frequent original-case
    variant (ties -> lexicographically smallest, deterministic)."""
    df = df.sort_values(["cnt", "label"], ascending=[False, True], kind="mergesort")
    top = df.groupby("norm", sort=False, as_index=False).first()
    totals = df.groupby("norm", sort=False, as_index=False)["cnt"].sum()
    out = top[["norm", "label"]].merge(totals, on="norm")
    return out.rename(columns={"label": "canonical_label", "cnt": "n_mentions"})


def build_surface_table(nodes: rd.Dataset, cfg: KGConfig) -> rd.Dataset:
    """node mentions -> distinct surface table (norm, canonical_label,
    n_mentions). ONE shuffle, moving per-block (norm, label) count partials
    only — a hot surface form contributes at most one row per block per
    variant, so the merge is skew-proof — bucketed on crc32(norm) so the
    merge+variant-pick runs as a vectorized pandas reduce per bucket, never
    one Python task per distinct surface form."""
    from ..ops.agg import bucketed_groupby

    partials = nodes.map_batches(_mention_partials, batch_format="pyarrow")

    def merge_and_pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["norm", "label"], as_index=False, sort=False)["cnt"].sum()
        return _pick_variant(df)

    return bucketed_groupby(partials, ["norm"], merge_and_pick,
                            buckets=cfg.alias_salt_buckets)


# --- phase 2: MinHash/LSH blocking over distinct norms ----------------------

def shingles(norm: str, k: int = 3) -> set[int]:
    s = f" {norm} "
    return {zlib.crc32(s[i:i + k].encode()) for i in range(max(1, len(s) - k + 1))}


_MINHASH_A: np.ndarray | None = None
_MINHASH_B: np.ndarray | None = None


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < num_perm:
        rng = np.random.RandomState(0xC0FFEE)  # fixed: signatures must agree across actors
        _MINHASH_A = rng.randint(1, 2**31 - 1, size=num_perm).astype(np.uint64)
        _MINHASH_B = rng.randint(0, 2**31 - 1, size=num_perm).astype(np.uint64)
    return _MINHASH_A[:num_perm], _MINHASH_B[:num_perm]

_MERSENNE = np.uint64(2**61 - 1)


def minhash_signature(sh: set[int], num_perm: int) -> np.ndarray:
    a, b = _minhash_params(num_perm)
    if not sh:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p, min over shingles — vectorized (num_perm, n_shingles)
    prod = (a[:, None] * vals[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[str]:
    rows = len(sig) // bands
    return [
        f"{b}:{zlib.crc32(sig[b * rows:(b + 1) * rows].tobytes()):08x}"
        for b in range(bands)
    ]


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class _PairScorer:
    """Shared per-batch body of the embed-scorer actor pool (stage A4):
    embed both sides, append the pair cosine. Subclasses provide
    ``_embed_batch`` (rows -> L2-normalized (n, dim) float32)."""

    def _embed_batch(self, texts: list[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        va = self._embed_batch(batch["norm_a"].to_pylist())
        vb = self._embed_batch(batch["norm_b"].to_pylist())
        cos = (va * vb).sum(axis=1)
        return batch.append_column("cos_sim", pa.array(cos, pa.float32()))


class HashEmbedScorer(_PairScorer):
    """Deterministic hash-feature embeddings (char-3-gram feature hashing
    into R^dim, L2 normalized) — the CI/default scorer; no model runtime
    exists in this sandbox (SURVEY.md §2.3). The actor-pool plumbing,
    batching and cosine math are the real production shape."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for sh in shingles(t):
                out[i, sh % self.dim] += 1.0 if (sh >> 16) & 1 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out


class ModelEmbedScorer(_PairScorer):
    """Learned-model scorer: loads a sentence-transformers-compatible model
    ONCE PER ACTOR in ``__init__`` (the map_batches actor-pool contract) and
    batch-encodes in ``__call__``. Mirrors the LLM-client pattern — real
    implementation behind an import gate, injectable ``loader`` for CI (any
    object with ``encode(list[str]) -> array``). Selected by
    ``KGConfig(embed_model=...)`` or ``extra['embed_model_loader']``."""

    def __init__(self, model_name: str = "", loader=None):
        if loader is not None:
            self.model = loader()
        else:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:
                raise ImportError(
                    "sentence-transformers is not installed; leave "
                    "embed_model unset (hash scorer) or inject "
                    "extra['embed_model_loader']") from e
            self.model = SentenceTransformer(model_name)

    def _embed_batch(self, texts: list[str]) -> np.ndarray:
        v = np.asarray(self.model.encode(list(texts)), dtype=np.float32)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        out = np.zeros_like(v)     # where= without out= leaves zero-norm
        np.divide(v, norms, out=out, where=norms > 0)  # rows uninitialized
        return out


def make_embed_scorer(cfg: KGConfig) -> tuple[type, dict]:
    """(scorer class, constructor kwargs) for the configured A4 scorer —
    passed to ``map_batches(cls, fn_constructor_kwargs=...)`` so each actor
    builds its own model exactly once."""
    loader = cfg.extra.get("embed_model_loader")
    if cfg.embed_model or loader is not None:
        return ModelEmbedScorer, {"model_name": cfg.embed_model,
                                  "loader": loader}
    return HashEmbedScorer, {}


@dataclass(frozen=True)
class LinkParams:
    num_perm: int = 32
    bands: int = 8            # 8 bands x 4 rows: ~Jaccard 0.5+ candidates
    jaccard_threshold: float = 0.66
    cosine_threshold: float = 0.60
    max_bucket: int = 64      # degenerate-bucket guard
    # typo tier: union edit-distance-1 norm pairs (deletion-neighborhood
    # blocking, fuzzy_label_pairs) into the LSH candidates — catches short
    # typo'd aliases whose shingle Jaccard falls below the LSH threshold.
    # Off by default: exact reference-parity runs must not cluster extra.
    typo_tier: bool = False


def _candidate_pairs(surfaces: rd.Dataset, p: LinkParams) -> pd.DataFrame:
    """LSH blocking: norm -> (band bucket) shuffle -> within-bucket pairs with
    true-Jaccard verification. Returns the (small) verified pair list."""

    def to_buckets(t: pa.Table) -> pa.Table:
        norms, keys = [], []
        for n in t["norm"].to_pylist():
            sig = minhash_signature(shingles(n), p.num_perm)
            for bk in band_keys(sig, p.bands):
                norms.append(n)
                keys.append(bk)
        return pa.table({"bucket": pa.array(keys, pa.string()),
                         "norm": pa.array(norms, pa.string())})

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ns = sorted(set(df["norm"]))[: p.max_bucket]
        a_out, b_out, jac = [], [], []
        sh = {n: shingles(n) for n in ns}
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                jv = jaccard(sh[ns[i]], sh[ns[j]])
                if jv >= p.jaccard_threshold:
                    a_out.append(ns[i])
                    b_out.append(ns[j])
                    jac.append(jv)
        return pd.DataFrame({"norm_a": pd.Series(a_out, dtype="string"),
                             "norm_b": pd.Series(b_out, dtype="string"),
                             "jaccard": pd.Series(jac, dtype="float64")})

    from ..ops.agg import bucketed_groupby, per_group_apply
    from ..ops.dedup import keep_nonsingleton_buckets

    bucketed = keep_nonsingleton_buckets(
        surfaces.select_columns(["norm"])
        .map_batches(to_buckets, batch_format="pyarrow"))
    pairs = bucketed_groupby(bucketed, ["bucket"],
                             per_group_apply(["bucket"], pairs_in_bucket))
    df = pairs.to_pandas()  # verified pairs only: tiny vs mention volume
    if "norm_a" not in df.columns:  # every bucket empty -> schemaless frame
        return pd.DataFrame(columns=["norm_a", "norm_b", "jaccard"])
    return df.drop_duplicates(["norm_a", "norm_b"])


def _typo_pairs(surfaces: rd.Dataset) -> pd.DataFrame:
    """The typo tier's pair list: exact edit-distance-1 norm pairs from
    the deletion-neighborhood blocking. These BYPASS the embed scorer —
    for the short strings this tier exists for ('ibm'/'ibn'), shingle
    overlap is near zero, so a shingle-hash cosine would veto exactly
    the pairs the exact character-level verify already proved close."""
    fz = fuzzy_label_pairs(surfaces.select_columns(["norm"]),
                           col="norm").to_pandas()
    if "norm_a" not in fz.columns or not len(fz):
        return pd.DataFrame(columns=["norm_a", "norm_b", "jaccard"])
    fz["jaccard"] = [jaccard(shingles(a), shingles(b))
                     for a, b in zip(fz["norm_a"], fz["norm_b"])]
    return fz


def _union_find_clusters(pairs: pd.DataFrame) -> dict[str, str]:
    """norm -> cluster-root norm (lexicographically smallest member, so the
    clustering is independent of pair arrival order)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["norm_a"], pairs["norm_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _arrow_out(df: pd.DataFrame) -> pa.Table:
    """pandas UDF output -> Arrow with object columns cast to pandas
    'string' first: an EMPTY object column would infer pa.null (schema
    drift vs non-empty blocks) and trips Ray's pandas size estimator into
    per-block 'cannot call vectorize on size 0 inputs' log noise."""
    for c in df.columns:
        if df[c].dtype == object:
            df = df.assign(**{c: df[c].astype("string")})
    return pa.Table.from_pandas(df, preserve_index=False)


ALIAS_COLS = ["norm", "canonical_id", "canonical_label", "cluster_mentions",
              "is_clustered"]


def build_alias_table(nodes: rd.Dataset, cfg: KGConfig,
                      link: LinkParams | None = None,
                      use_embed_scorer: bool = True) -> rd.Dataset:
    """Full linking pass: mention partials -> surface table -> LSH candidate
    pairs -> (optional) embedding-cosine verification -> union-find clusters
    -> alias DATASET (norm, canonical_id, canonical_label, cluster_mentions,
    is_clustered), one row per distinct norm.

    The surface vocabulary is never fully collected on the driver: only the
    VERIFIED candidate pairs (duplicate-volume-sized) come back for the
    union-find, their root map is broadcast, and the per-root reduce
    (representative label, total mentions) runs as a bucketed distributed
    groupby over the surface Dataset. ``is_clustered`` marks norms that are
    members of a multi-norm cluster — the rewrite stage must always have
    those in its broadcast map; everything else can fall back to identity
    hashing."""
    link = link or LinkParams()
    # materialize: consumed twice (candidate blocking + root assignment);
    # vocabulary-sized but stays distributed in the object store
    surfaces = build_surface_table(nodes, cfg).materialize()

    pairs = _candidate_pairs(surfaces, link)

    if use_embed_scorer and len(pairs):
        scorer_cls, scorer_kw = make_embed_scorer(cfg)
        if len(pairs) < 10_000:
            # actor-pool spawn (~1 s) dwarfs scoring a small pair list;
            # the pool pays off only on duplicate-heavy corpora
            scored = scorer_cls(**scorer_kw)(
                pa.Table.from_pandas(pairs, preserve_index=False)).to_pandas()
        else:
            scored = rd.from_pandas(pairs).map_batches(
                scorer_cls, fn_constructor_kwargs=scorer_kw,
                batch_format="pyarrow",
                concurrency=cfg.link_scorer_concurrency, num_cpus=1,
            ).to_pandas()
        pairs = scored[scored["cos_sim"] >= link.cosine_threshold]

    if link.typo_tier:
        pairs = pd.concat(
            [pairs[["norm_a", "norm_b", "jaccard"]],
             _typo_pairs(surfaces)],
            ignore_index=True).drop_duplicates(["norm_a", "norm_b"])

    root_of = _union_find_clusters(pairs)
    clustered = frozenset(pairs["norm_a"]) | frozenset(pairs["norm_b"])
    root_ref = ray.put((root_of, clustered))

    # Split streams: UNCLUSTERED norms (the overwhelming majority) are
    # singleton clusters — root = self, representative label = own variant,
    # totals = own mentions — a pure per-block map, NO shuffle. Only the
    # CLUSTERED norms (duplicate-volume-sized) need a cross-row reduce, and
    # only they ride the bucketed groupby. This removes a full-vocabulary
    # shuffle from the alias build.
    def unclustered_alias(df: pd.DataFrame) -> pd.DataFrame:
        rmap, members = ray.get(root_ref)
        # vectorized (a list-comprehension mask on an EMPTY batch would be
        # df[[]] — column selection — and break the schema)
        df = df[~df["norm"].isin(members)]
        out = pd.DataFrame({
            "norm": df["norm"].astype("string"),
            "canonical_id": df["norm"].map(canonical_id_of).astype("string"),
            "canonical_label": df["canonical_label"],
            "cluster_mentions": df["n_mentions"].astype("int64"),
        })
        out["is_clustered"] = False
        return _arrow_out(out[ALIAS_COLS])

    def clustered_rooted(df: pd.DataFrame) -> pa.Table:
        rmap, members = ray.get(root_ref)
        df = df[df["norm"].isin(members)]
        return _arrow_out(df.assign(
            root=pd.Series([rmap.get(n, n) for n in df["norm"]],
                           index=df.index, dtype="string")))

    def per_root(df: pd.DataFrame) -> pd.DataFrame:
        # whole clusters land in one bucket (keyed on root); vectorized pick
        df = df.sort_values(["n_mentions", "norm"], ascending=[False, True],
                            kind="mergesort")
        rep = df.groupby("root", sort=False)["canonical_label"].first()
        tot = df.groupby("root", sort=False)["n_mentions"].sum()
        out = (df[["norm", "root"]]
               .merge(rep.rename("canonical_label"), on="root")
               .merge(tot.rename("cluster_mentions"), on="root"))
        out["canonical_id"] = out["root"].map(canonical_id_of).astype("string")
        out["is_clustered"] = True
        return out[ALIAS_COLS]

    unclustered = surfaces.map_batches(unclustered_alias,
                                       batch_format="pandas")
    if not clustered:
        return unclustered
    # clustered rows are bounded by 2x|verified pairs| — already a driver-
    # side quantity (the union-find ran on them) — so the per-root reduce is
    # a driver groupby over a tiny frame, not a distributed shuffle
    cl_df = surfaces.map_batches(clustered_rooted,
                                 batch_format="pandas").to_pandas()
    return unclustered.union(rd.from_pandas(per_root(cl_df)))


def hot_alias_frame(alias: rd.Dataset, cap: int) -> pd.DataFrame:
    """The broadcast slice of the alias Dataset: ALL clustered norms (their
    mapping is semantic — identity fallback would break cluster unification)
    plus the ``cap`` most-mentioned unclustered norms (the hot vocabulary;
    broadcasting them keeps the overwhelmingly common surfaces off the
    fallback path). Per-block top-``cap`` partials bound the driver collect
    to clustered + cap x num_blocks rows, never the full vocabulary."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["is_clustered"]]
        # top-k over UNCLUSTERED rows only: clustered rows are kept anyway,
        # and letting them crowd the per-block top-k could evict globally
        # hot unclustered norms from the broadcast
        un = df[~df["is_clustered"]]
        top = un.nlargest(min(cap, len(un)), "cluster_mentions")
        return (pd.concat([keep, top]).drop_duplicates("norm")[ALIAS_COLS])

    parts = alias.map_batches(partial, batch_format="pandas").to_pandas()
    if "norm" not in parts.columns:
        return pd.DataFrame(columns=ALIAS_COLS)
    parts = parts.drop_duplicates("norm")
    clustered = parts[parts["is_clustered"]]
    hot = parts[~parts["is_clustered"]].nlargest(cap, "cluster_mentions")
    return pd.concat([clustered, hot], ignore_index=True)


# --- phase 3: rewrite edges onto canonical ids + global dedup ---------------

def canonicalize_edges(edges: rd.Dataset, alias: rd.Dataset | pd.DataFrame,
                       cfg: KGConfig) -> rd.Dataset:
    """Rewrite (subj, pred, obj) surface triples onto canonical entities and
    aggregate to deduplicated weighted canonical edges.

    Broadcast is FREQUENCY-THRESHOLDED: only the clustered norms (mandatory
    for unification) plus the ``cfg.broadcast_vocab_cap`` hottest unclustered
    norms ride the object store (``ray.put`` once, read per task). The long
    tail falls back to identity hashing — ``canonical_id_of(norm)`` is
    EXACTLY the id the alias table assigns an unclustered norm (root = the
    norm itself), so canonical ids never diverge; only the display label of
    a below-cap norm comes from the edges' surface casings instead of the
    corpus-majority variant. Because different casings of a below-cap norm
    then reach the reduce with the SAME canonical id but different labels,
    the reduce groups on the canonical triple ONLY and picks each triple's
    label pair deterministically (max aggregated weight, ties broken
    lexicographically) — labels can never split a triple's weight (ADVICE
    round 2). Partial counting inside map_batches again bounds the final
    shuffle to distinct canonical triples per block."""
    if isinstance(alias, rd.Dataset):
        alias = hot_alias_frame(alias, cfg.broadcast_vocab_cap)
    alias_ref = ray.put({
        n: (cid, clab) for n, cid, clab in zip(
            alias["norm"], alias["canonical_id"], alias["canonical_label"])
    })

    def rewrite_and_count(batch: pa.Table) -> pa.Table:
        amap = ray.get(alias_ref)
        counts: dict[tuple, int] = {}
        for subj, pred, obj in zip(batch["subj"].to_pylist(),
                                   batch["pred"].to_pylist(),
                                   batch["obj"].to_pylist()):
            if subj is None or obj is None:
                continue    # null endpoint: no entity to canonicalize onto
                # (the nodes-side partial skips null labels the same way)
            sn, on = normalize_surface(subj), normalize_surface(obj)
            s = amap.get(sn, (canonical_id_of(sn), subj))
            o = amap.get(on, (canonical_id_of(on), obj))
            key = (s[0], pred, o[0], s[1], o[1])
            counts[key] = counts.get(key, 0) + 1
        keys = list(counts)
        return pa.table({
            "canonical_src": pa.array([k[0] for k in keys], pa.string()),
            "pred": pa.array([k[1] for k in keys], pa.string()),
            "canonical_dst": pa.array([k[2] for k in keys], pa.string()),
            "src_label": pa.array([k[3] for k in keys], pa.string()),
            "dst_label": pa.array([k[4] for k in keys], pa.string()),
            "weight": pa.array(list(counts.values()), pa.int64()),
        })

    from ..ops.agg import bucketed_groupby

    partials = edges.map_batches(rewrite_and_count, batch_format="pyarrow")
    keys3 = ["canonical_src", "pred", "canonical_dst"]
    keys5 = keys3 + ["src_label", "dst_label"]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # aggregate per label pair FIRST (block-layout-independent totals),
        # then reduce to one row per triple: weight = sum over label pairs,
        # label pair = the heaviest (ties -> lexicographic min) — fully
        # deterministic, and identical to a plain 5-key sum whenever labels
        # really are functions of the ids (the in-broadcast regime)
        by_label = df.groupby(keys5, as_index=False, sort=False)["weight"].sum()
        tot = by_label.groupby(keys3, as_index=False, sort=False)["weight"].sum()
        rep = (by_label.sort_values(
            ["weight", "src_label", "dst_label"],
            ascending=[False, True, True], kind="mergesort")
            .drop_duplicates(keys3)[keys3 + ["src_label", "dst_label"]])
        return tot.merge(rep, on=keys3)[keys5 + ["weight"]]

    # shuffle key = the TRIPLE, so every label variant of it co-locates
    return bucketed_groupby(partials, keys3, merge)


def _canonical_nodes_merge(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby(["canonical_id", "canonical_label"], sort=False)
    out = g.agg(n_mentions=("cluster_mentions", "max"),
                n_aliases=("norm", "nunique")).reset_index()
    return out.sort_values("canonical_id", kind="mergesort").reset_index(drop=True)


def canonical_nodes_table(alias: rd.Dataset | pd.DataFrame):
    """Distinct canonical entities (id, label, total mentions, n_aliases).
    Dataset in -> Dataset out; DataFrame in -> DataFrame out. Same
    split-stream shape as the alias build: unclustered aliases map 1:1 to
    canonical nodes with no shuffle; only clustered aliases (pair-bounded)
    need a cross-row reduce, done driver-side."""
    if isinstance(alias, pd.DataFrame):
        return _canonical_nodes_merge(alias.drop(columns="is_clustered",
                                                 errors="ignore"))
    cols = ["canonical_id", "canonical_label", "n_mentions", "n_aliases"]

    def unclustered_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["is_clustered"]]
        out = pd.DataFrame({
            "canonical_id": df["canonical_id"],
            "canonical_label": df["canonical_label"],
            "n_mentions": df["cluster_mentions"].astype("int64"),
        })
        out["n_aliases"] = 1
        return _arrow_out(out[cols])

    def clustered_only(t):
        # Arrow in/out: a pandas filter here returned empty object-dtype
        # blocks that Ray's size estimator warns on ("vectorize on size 0
        # inputs") — Arrow empties carry their schema silently
        import pyarrow.compute as pc
        return t.filter(pc.fill_null(t["is_clustered"], False))

    un = alias.map_batches(unclustered_nodes, batch_format="pandas")
    cl_df = alias.map_batches(clustered_only,
                              batch_format="pyarrow").to_pandas()
    if len(cl_df) == 0:
        return un
    # pair-bounded, same driver-side justification as the alias build
    return un.union(rd.from_pandas(
        _canonical_nodes_merge(cl_df.drop(columns="is_clustered"))[cols]))


# --- fuzzy alias pairing (round 4) ------------------------------------------

def _within_one_edit(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len) without the DP table."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                       # exactly one substitution allowed
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:                        # normalize: a is the shorter one
        a, b, la, lb = b, a, lb, la
    i = 0                              # one insertion into a yields b
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_label_pairs(labels: rd.Dataset, col: str = "label") -> rd.Dataset:
    """Distinct label pairs within Levenshtein distance 1 — the fuzzy
    tier of entity linking (typo'd aliases the exact lower() match in
    the alias table can't catch).

    Scale shape (the SymSpell deletion-neighborhood identity): two
    strings are within one edit only if they share an element of
    {s} ∪ single-deletions(s), so each distinct label fans out to its
    <= len+1 deletion variants, ONE shuffle co-buckets labels sharing a
    variant, and in-bucket self-joins emit candidate pairs that a
    linear-time exact check then verifies. No all-pairs stage anywhere:
    candidate volume is bounded by variant collisions, which for
    near-full-length variants stay near-linear in the vocabulary. A
    pathological corpus (thousands of labels one edit apart in one
    neighborhood) concentrates its own cluster's pairs in one bucket —
    the same inherent hot-key caveat as the LSH band buckets.

    Output: (<col>_a, <col>_b) with <col>_a < <col>_b, distinct."""
    from ..ops.agg import bucketed_groupby

    ca, cb = f"{col}_a", f"{col}_b"

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: df[col].drop_duplicates()})

    def distinct_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    uniq = bucketed_groupby(
        labels.map_batches(distinct_partial, batch_format="pandas"),
        [col], distinct_merge)

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        vs, ls = [], []
        for s in df[col].astype(str):
            vs.append(s)
            ls.append(s)
            for i in range(len(s)):
                vs.append(s[:i] + s[i + 1:])
                ls.append(s)
        return pd.DataFrame({"variant": vs, col: ls})

    fan = uniq.map_batches(variants, batch_format="pandas")

    def pair_merge(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="variant")
        m = m[m[f"{col}_x"] < m[f"{col}_y"]]
        return (m[[f"{col}_x", f"{col}_y"]]
                .drop_duplicates()
                .rename(columns={f"{col}_x": ca, f"{col}_y": cb}))

    cand = bucketed_groupby(fan, ["variant"], pair_merge)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()      # same pair from multiple variants
        keep = [_within_one_edit(a, b)
                for a, b in zip(df[ca], df[cb])]
        return df[np.array(keep, dtype=bool)] if len(df) else df

    return bucketed_groupby(cand, [ca, cb], verify, buckets=4)
