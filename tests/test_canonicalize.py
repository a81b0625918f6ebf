"""Entity linking + canonicalization: alias table, LSH blocking, broadcast
rewrite, global weighted edge dedup."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_knowledgegraph_extractor_ray.config import KGConfig
from ai_knowledgegraph_extractor_ray.stages import canonicalize as cz

CFG = KGConfig(alias_salt_buckets=4, link_scorer_concurrency=1)


def nodes_ds(labels):
    return rd.from_pandas(pd.DataFrame({"label": pd.Series(labels, dtype="string")}))


def test_normalize_surface():
    assert cz.normalize_surface("  Acme   Corp ") == "acme corp"
    assert cz.normalize_surface("ACME Corp") == "acme corp"


def test_minhash_identical_and_disjoint():
    a = cz.minhash_signature(cz.shingles("acme corporation"), 32)
    b = cz.minhash_signature(cz.shingles("acme corporation"), 32)
    c = cz.minhash_signature(cz.shingles("zzz totally different"), 32)
    assert (a == b).all()
    assert (a == c).mean() < 0.5


def test_surface_table_counts_and_variant_pick():
    ds = nodes_ds(["Acme Corp", "ACME Corp", "Acme Corp", "Beta Inc"])
    surf = cz.build_surface_table(ds, CFG).to_pandas().set_index("norm")
    assert int(surf.loc["acme corp", "n_mentions"]) == 3
    # most frequent original-case variant wins
    assert surf.loc["acme corp", "canonical_label"] == "Acme Corp"
    assert int(surf.loc["beta inc", "n_mentions"]) == 1


def test_alias_links_near_duplicates():
    labels = (["Acme Corporation"] * 5 + ["Acme Corporatio"] * 2  # typo variant
              + ["Globex Industries"] * 3)
    alias = cz.build_alias_table(nodes_ds(labels), CFG).to_pandas()
    by_norm = alias.set_index("norm")
    assert (by_norm.loc["acme corporation", "canonical_id"]
            == by_norm.loc["acme corporatio", "canonical_id"])
    # cluster canonical label comes from the most-mentioned member
    assert by_norm.loc["acme corporatio", "canonical_label"] == "Acme Corporation"
    assert (by_norm.loc["globex industries", "canonical_id"]
            != by_norm.loc["acme corporation", "canonical_id"])
    assert int(by_norm.loc["acme corporation", "cluster_mentions"]) == 7


def test_alias_does_not_link_distinct():
    alias = cz.build_alias_table(
        nodes_ds(["Acme Corporation", "Meridian Capital", "John Doe"]),
        CFG).to_pandas()
    assert alias["canonical_id"].nunique() == 3


def test_embed_scorer_batch_shape():
    import pyarrow as pa
    scorer = cz.HashEmbedScorer()
    t = pa.table({"norm_a": ["acme corp", "john doe"],
                  "norm_b": ["acme corp", "zzz unrelated"]})
    out = scorer(t)
    sims = out["cos_sim"].to_pylist()
    assert sims[0] == pytest.approx(1.0, abs=1e-5)
    assert sims[1] < 0.9


def test_canonicalize_edges_dedup_and_weight():
    edges = rd.from_pandas(pd.DataFrame({
        "subj": ["Acme Corp", "ACME Corp", "Acme Corp", "Beta Inc"],
        "pred": ["acquired", "acquired", "acquired", "located_in"],
        "obj": ["Beta Inc", "Beta Inc", "Gamma LLC", "Austin"],
    }))
    alias = cz.build_alias_table(
        nodes_ds(["Acme Corp", "Acme Corp", "ACME Corp", "Beta Inc",
                  "Gamma LLC", "Austin"]), CFG)
    out = cz.canonicalize_edges(edges, alias, CFG).to_pandas()
    key = out.set_index(["src_label", "pred", "dst_label"])["weight"]
    # exact-dup edges collapse with weight, case variants unify
    assert int(key.loc[("Acme Corp", "acquired", "Beta Inc")]) == 2
    assert int(key.loc[("Acme Corp", "acquired", "Gamma LLC")]) == 1
    assert len(out) == 3
    assert out["canonical_src"].str.startswith("e_").all()


def test_canonicalize_unknown_surface_falls_back():
    """Edges whose endpoints never appeared as nodes still canonicalize
    deterministically (hash of their own norm)."""
    edges = rd.from_pandas(pd.DataFrame({
        "subj": ["Mystery Co"], "pred": ["acquired"], "obj": ["Acme Corp"]}))
    alias = cz.build_alias_table(nodes_ds(["Acme Corp"]), CFG)
    out = cz.canonicalize_edges(edges, alias, CFG).to_pandas()
    assert out.iloc[0]["canonical_src"] == cz.canonical_id_of("mystery co")


def test_canonical_nodes_table():
    alias = cz.build_alias_table(
        nodes_ds(["Acme Corporation"] * 3 + ["Acme Corporatio"]), CFG)
    nodes = cz.canonical_nodes_table(alias).to_pandas()
    assert len(nodes) == 1
    assert int(nodes.iloc[0]["n_aliases"]) == 2
    assert int(nodes.iloc[0]["n_mentions"]) == 4


def test_broadcast_cap_identity_fallback():
    """With a broadcast cap of 1, below-cap unclustered norms resolve via
    identity hashing to EXACTLY the canonical id the alias table assigns
    them, and clustered norms still unify (always broadcast)."""
    from dataclasses import replace
    labels = (["Acme Corporation"] * 5 + ["Acme Corporatio"] * 2
              + ["Rare Solo Co"])
    alias = cz.build_alias_table(nodes_ds(labels), CFG)
    edges = rd.from_pandas(pd.DataFrame({
        "subj": ["Acme Corporatio", "Rare Solo Co"],
        "pred": ["acquired", "acquired"],
        "obj": ["Rare Solo Co", "Acme Corporation"]}))
    capped = replace(CFG, broadcast_vocab_cap=1)
    out = cz.canonicalize_edges(edges, alias, capped).to_pandas()
    full = cz.canonicalize_edges(edges, alias, CFG).to_pandas()
    cols = ["canonical_src", "pred", "canonical_dst", "weight"]
    assert (out[cols].sort_values(cols).reset_index(drop=True)
            .equals(full[cols].sort_values(cols).reset_index(drop=True)))
    # typo variant still rewrites onto the cluster id despite the cap
    cluster_id = (alias.to_pandas().set_index("norm")
                  .loc["acme corporation", "canonical_id"])
    assert cluster_id in set(out["canonical_src"])


def test_hot_alias_frame_is_capped():
    import hashlib
    # mutually dissimilar labels (hash-derived) so LSH links nothing
    labels = ["Zz" + hashlib.sha256(str(i).encode()).hexdigest()[:12]
              for i in range(50)]
    alias = cz.build_alias_table(nodes_ds(labels), CFG)
    assert not alias.to_pandas()["is_clustered"].any()
    hot = cz.hot_alias_frame(alias, cap=5)
    assert len(hot) == 5            # no clusters -> exactly the cap
    assert not hot["norm"].duplicated().any()


def test_hot_key_skew_partials_bounded():
    """A hot surface form (many mentions) must reach the shuffle as partial
    counts, not mention rows: surface table still exact."""
    labels = ["Acme Corporation"] * 5000 + ["Rare Co"]
    ds = nodes_ds(labels).repartition(8)
    surf = cz.build_surface_table(ds, CFG).to_pandas().set_index("norm")
    assert int(surf.loc["acme corporation", "n_mentions"]) == 5000
    assert int(surf.loc["rare co", "n_mentions"]) == 1


def test_below_cap_label_variants_never_split_triple_weight():
    """Regime the broadcast_vocab_cap targets (>cap vocabulary): a norm
    OUTSIDE the broadcast map appearing in two casings must still produce
    ONE canonical triple with the summed weight and a deterministic label
    (ADVICE round 2: 5-key grouping split the weight by casing)."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.config import KGConfig
    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        ALIAS_COLS,
        canonicalize_edges,
    )

    SUBJ = ["Acme", "Acme", "ACME", "acme", "Acme"]
    OBJ = ["Bob Smith", "Bob Smith", "Bob Smith", "Bob Smith", "BOB SMITH"]
    edges = rd.from_pandas(pd.DataFrame({
        "subj": SUBJ, "pred": ["works_at"] * 5, "obj": OBJ}))
    # empty broadcast map == every norm is below the cap
    empty_alias = pd.DataFrame(columns=ALIAS_COLS)
    out = canonicalize_edges(edges, empty_alias, KGConfig()).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["weight"] == 5
    # deterministic label pick: heaviest pair is ("Acme", "Bob Smith") x2
    assert row["src_label"] == "Acme"
    assert row["dst_label"] == "Bob Smith"

    # determinism across block layouts
    out2 = canonicalize_edges(
        rd.from_pandas(pd.DataFrame({
            "subj": SUBJ, "pred": ["works_at"] * 5, "obj": OBJ}))
        .repartition(5), empty_alias, KGConfig()).to_pandas()
    assert out2.iloc[0].equals(row)


# --- stage A4: learned-model scorer seam (round-3 item 7) --------------------

class _TinyModel:
    """sentence-transformers-compatible stub: encode(list[str]) -> array.
    Maps any 'acme*' surface to one shared vector and everything else to
    per-text orthogonal-ish vectors, so the model DECIDES the clustering."""

    def encode(self, texts):
        import zlib

        import numpy as np
        out = np.zeros((len(texts), 8), dtype=np.float32)
        for i, t in enumerate(texts):
            if t.startswith("acme"):
                out[i, 0] = 1.0
            else:
                # crc32, not hash(): builtin str hash is salted per process,
                # and the model runs inside Ray workers — per-worker seeds
                # would make the same text embed differently (flaky merges).
                out[i, (zlib.crc32(t.encode()) % 7) + 1] = 1.0
        return out


def _load_tiny_model():
    return _TinyModel()


def test_model_embed_scorer_drives_clustering():
    """build_alias_table with an injected model loader: the MODEL's scores
    (not the hash fallback) gate cluster formation — 'swap one method' is
    executable, per the make_embed_scorer seam."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.config import KGConfig
    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        build_alias_table,
        make_embed_scorer,
        ModelEmbedScorer,
    )

    cfg = KGConfig(extra={"embed_model_loader": _load_tiny_model})
    cls, kw = make_embed_scorer(cfg)
    assert cls is ModelEmbedScorer

    # surfaces that pass LSH blocking (high char-3-gram Jaccard)
    nodes = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1"] * 6,
        "label": ["Acme Corporation", "ACME CORPORATION", "acme corporation!",
                  "Data Engine", "Data Enginee", "Quartz"],
        "node_type": ["Organization"] * 6,
    }))
    alias = build_alias_table(nodes, cfg).to_pandas()
    by_norm = alias.set_index("norm")
    acme = [n for n in by_norm.index if n.startswith("acme")]
    assert len(set(by_norm.loc[acme, "canonical_id"])) == 1   # model: same vec
    # 'data engine*' pass blocking but the model gives them DIFFERENT vectors
    data = [n for n in by_norm.index if n.startswith("data engine")]
    assert len(data) == 2
    assert len(set(by_norm.loc[data, "canonical_id"])) == 2   # model said no


def test_model_embed_scorer_actor_pool_path():
    """>=10k pairs routes through map_batches(cls, fn_constructor_kwargs):
    each actor constructs the model itself (picklable loader, not model)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        ModelEmbedScorer,
    )

    pairs = pd.DataFrame({
        "norm_a": ["acme a"] * 50, "norm_b": ["acme b"] * 50,
        "jaccard": [0.9] * 50})
    scored = rd.from_pandas(pairs).map_batches(
        ModelEmbedScorer,
        fn_constructor_kwargs={"model_name": "",
                               "loader": _load_tiny_model},
        batch_format="pyarrow", concurrency=2, num_cpus=1).to_pandas()
    assert np.allclose(scored["cos_sim"], 1.0)


def test_model_scorer_without_runtime_raises_importerror():
    import pytest

    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        ModelEmbedScorer,
    )
    try:
        import sentence_transformers  # noqa: F401
        pytest.skip("sentence-transformers present in this env")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="sentence-transformers"):
        ModelEmbedScorer("all-MiniLM-L6-v2")


def test_within_one_edit_cases():
    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        _within_one_edit)

    assert _within_one_edit("abc", "abc")
    assert _within_one_edit("abc", "abd")      # substitution
    assert _within_one_edit("abc", "ab")       # deletion
    assert _within_one_edit("ab", "abc")       # insertion
    assert _within_one_edit("abc", "axbc")     # mid insertion
    assert not _within_one_edit("ab", "ba")    # transposition = 2 edits
    assert not _within_one_edit("abc", "adc2")
    assert not _within_one_edit("abcd", "ab")


def test_fuzzy_label_pairs_blocking_and_verify():
    """Deletion-neighborhood candidates include a distance-2 decoy
    ('ab'/'ba' share deletion variants) that the exact verify must
    reject; true distance-1 pairs across sub/del/ins all surface."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.stages.canonicalize import (
        fuzzy_label_pairs)

    labels = ["Paris", "Pariss", "Parys", "ab", "ba",
              "London", "Londn", "Tokyo", "Tokyo"]
    ds = rd.from_pandas(pd.DataFrame({"label": labels}))
    out = fuzzy_label_pairs(ds).to_pandas()
    got = {tuple(r) for r in out[["label_a", "label_b"]].itertuples(
        index=False)}
    assert ("Paris", "Pariss") in got
    assert ("Paris", "Parys") in got
    assert ("Londn", "London") in got
    assert ("ab", "ba") not in got             # decoy rejected
    assert ("Pariss", "Parys") not in got      # distance 2
    # output is distinct, ordered pairs
    assert (out["label_a"] < out["label_b"]).all()
    assert not out.duplicated().any()


def test_typo_tier_links_short_aliases():
    """'IBM'/'IBN' share no trigram shingles, so LSH+cosine never links
    them; the typo tier (edit-distance-1, scorer-bypassed) does. Off by
    default to preserve exact reference parity."""
    labels = ["IBM"] * 5 + ["IBN"] * 2 + ["Globex Industries"] * 3

    base = cz.build_alias_table(nodes_ds(labels), CFG).to_pandas()
    bn = base.set_index("norm")
    assert bn.loc["ibm", "canonical_id"] != bn.loc["ibn", "canonical_id"]

    link = cz.LinkParams(typo_tier=True)
    fuzz = cz.build_alias_table(nodes_ds(labels), CFG,
                                link=link).to_pandas()
    fn = fuzz.set_index("norm")
    assert fn.loc["ibm", "canonical_id"] == fn.loc["ibn", "canonical_id"]
    assert fn.loc["ibn", "canonical_label"] == "IBM"   # most-mentioned rep
    assert int(fn.loc["ibm", "cluster_mentions"]) == 7
    assert (fn.loc["globex industries", "canonical_id"]
            != fn.loc["ibm", "canonical_id"])
