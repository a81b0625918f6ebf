"""End-to-end pipeline tests: transcripts parquet -> graph parquet, checked
against (a) golden reference fixtures and (b) direct application of the
oracle extractor to the assembled texts (the per-turn text-equality +
P/R invariant)."""

import json
from pathlib import Path

import pandas as pd
import pytest
import ray.data as rd

from ai_knowledgegraph_extractor_ray.config import KGConfig
from ai_knowledgegraph_extractor_ray.functions.rules import extract_rule_graph
from ai_knowledgegraph_extractor_ray.pipelines import kg
from ai_knowledgegraph_extractor_ray.sources import transcripts as src

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "reference_rule_graphs.json").read_text()
)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("transcripts") / "transcripts.parquet"
    table = src.synthetic_transcripts_table(n_convs=60, seed=42)
    import pyarrow.parquet as pq
    pq.write_table(table, path)
    return str(path)


@pytest.fixture(scope="module")
def job(corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    cfg = KGConfig(num_partitions=8, extract_concurrency=2)
    summary = kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out)
    return cfg, out, summary


def test_summary_counts(job):
    cfg, out, summary = job
    assert summary["n_conversations"] == 60
    assert summary["n_nodes"] > 0 and summary["n_edges"] > 0
    assert summary["partitions_computed"] >= 1


def test_per_turn_text_equality(corpus_path):
    """Per-row invariant: each turn's text survives the pipeline's ordering/
    concat unchanged — "\n".join of ordered turns re-splits to the turns."""
    df = rd.read_parquet(corpus_path).to_pandas()
    for conv_id, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        joined = "\n".join(g["text"])
        assert joined.split("\n") == list(g["text"])


def test_golden_conversations_match_reference(job):
    """The planted demo/seed conversations must produce exactly the
    reference's graphs (node ids, labels, types, and all triples)."""
    cfg, out, _ = job
    for name in ("demo_sample", "seed_doc1", "seed_doc2", "seed_doc3_csv"):
        fix = GOLDEN[name]
        got = kg.get_conversation_graph(out, cfg.version, f"golden_{name}",
                                        cfg.num_partitions)
        assert got["nodes"] == fix["graph"]["nodes"], name
        assert got["edges"] == fix["graph"]["edges"], name


def test_pipeline_matches_direct_oracle(job, corpus_path):
    """P/R invariant at full-corpus granularity: pipeline triples == direct
    extraction over each conversation's ordered concatenated text (P=R=1.0
    by construction; the reference-parity of the oracle itself is pinned by
    test_rules.py)."""
    cfg, out, _ = job
    edges = kg.read_edges(out, cfg.version).to_pandas()
    got = {(r.conv_id, r.subj, r.pred, r.obj) for r in edges.itertuples()}

    df = rd.read_parquet(corpus_path).to_pandas()
    want = set()
    for conv_id, g in df.groupby("conv_id"):
        text = "\n".join(g.sort_values("turn_idx")["text"])
        rg = extract_rule_graph(text)
        label = dict(zip(rg.node_ids, rg.labels))
        for s, d, r in zip(rg.edge_src, rg.edge_dst, rg.edge_rel):
            want.add((conv_id, label[s], r, label[d]))
    assert got == want


def test_resume_skips_committed(job, corpus_path):
    cfg, out, first = job
    again = kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out)
    assert again["partitions_computed"] == 0
    assert again["partitions_resumed"] == first["partitions_total"]
    assert again["n_edges"] == first["n_edges"]


def test_partial_resume(corpus_path, tmp_path):
    """Simulate a crash: commit only half the partitions, then resume; the
    final graph must equal a clean run's."""
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    cfg = KGConfig(num_partitions=6, extract_concurrency=2)
    ts = src.read_transcripts(corpus_path)
    kg.run_kg_job(ts, cfg, out_a, resume=False)

    # fake a partial run: copy 3 committed partitions (data + manifests) to b
    import shutil
    vdir_a = Path(out_a) / f"version={cfg.version}"
    vdir_b = Path(out_b) / f"version={cfg.version}"
    (vdir_b / "_manifests").mkdir(parents=True)
    for pid in (0, 2, 4):
        part = f"part-{pid:05d}"
        if (vdir_a / part).exists():
            shutil.copytree(vdir_a / part, vdir_b / part)
            shutil.copy(vdir_a / "_manifests" / f"{part}.json",
                        vdir_b / "_manifests" / f"{part}.json")

    resumed = kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out_b)
    assert resumed["partitions_resumed"] >= 1
    ea = kg.read_edges(out_a, cfg.version).to_pandas()
    eb = kg.read_edges(out_b, cfg.version).to_pandas()
    key = ["conv_id", "edge_id"]
    assert sorted(map(tuple, ea[key].values)) == sorted(map(tuple, eb[key].values))


def test_partition_size_guard_warns(corpus_path, tmp_path):
    """Oversized partitions (num_partitions too low for the data volume)
    raise a ResourceWarning naming the knob, instead of OOMing at scale."""
    cfg = KGConfig(num_partitions=2, extract_concurrency=2,
                   partition_bytes_warn=1000)
    with pytest.warns(ResourceWarning, match="num_partitions"):
        kg.run_kg_job(src.read_transcripts(corpus_path),
                      cfg, str(tmp_path / "out"), resume=False)


def test_resume_invalidates_changed_input(corpus_path, tmp_path):
    """Resume over CHANGED input must re-run the affected partition, not
    silently reuse its stale output (lineage fingerprint validation)."""
    out = str(tmp_path / "out")
    cfg = KGConfig(num_partitions=4, extract_concurrency=2)
    kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out, resume=False)

    # mutate one conversation's text and rerun with resume
    df = pd.read_parquet(corpus_path)
    victim = df["conv_id"].iloc[0]
    df.loc[df["conv_id"] == victim, "text"] = (
        "Mutant Corp acquired Stale Cache for cash.")
    changed = str(tmp_path / "changed.parquet")
    df.to_parquet(changed, index=False)

    from ai_knowledgegraph_extractor_ray.stages.conversation import partition_of
    victim_pid = partition_of(victim, cfg.num_partitions)

    resumed = kg.run_kg_job(src.read_transcripts(changed), cfg, out)
    assert resumed["partitions_computed"] >= 1          # stale one re-ran
    assert resumed["partitions_resumed"] == resumed["partitions_total"] - 1

    # the re-extracted graph reflects the new text
    nodes = kg.read_nodes(out, cfg.version).to_pandas()
    assert "Mutant Corp" in set(nodes[nodes["conv_id"] == victim]["label"])

    # unchanged input + validation on -> clean full resume
    again = kg.run_kg_job(src.read_transcripts(changed), cfg, out)
    assert again["partitions_computed"] == 0

    # validate_input=False trusts manifests blindly (documented fast path)
    blind = kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out,
                          validate_input=False)
    assert blind["partitions_computed"] == 0
    assert victim_pid in {
        int(p) for p in range(cfg.num_partitions)}  # sanity: pid valid


def test_reads_skip_uncommitted_partitions(corpus_path, tmp_path):
    """Orphaned part dirs (crash mid-partition, or stale dirs from an older
    num_partitions run) must not be read: paths come from committed
    manifests, not a glob."""
    out = str(tmp_path / "out")
    cfg = KGConfig(num_partitions=4, extract_concurrency=2)
    kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out, resume=False)
    before = kg.read_nodes(out, cfg.version).to_pandas()

    # plant an orphan part dir with valid parquet but NO manifest
    from ai_knowledgegraph_extractor_ray.state import lineage
    orphan = lineage.partition_dir(out, cfg.version, 99)
    orphan.mkdir(parents=True)
    fake = before.head(5).copy()
    fake["label"] = "Orphan Ghost"
    fake.to_parquet(orphan / "nodes.parquet", index=False)

    after = kg.read_nodes(out, cfg.version).to_pandas()
    assert "Orphan Ghost" not in set(after["label"])
    assert len(after) == len(before)


def test_version_cutoff_prefix_semantics(corpus_path, tmp_path):
    """Version K = extraction over the turn prefix (reference update
    semantics, main.py:231-259): cutoff at turn_idx<=1 must equal running
    the oracle on the 2-turn prefix text."""
    out = str(tmp_path / "v2")
    cfg = KGConfig(num_partitions=4, version=2, version_cutoff=1,
                   extract_concurrency=2)
    kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out)
    edges = kg.read_edges(out, 2).to_pandas()
    df = rd.read_parquet(corpus_path).to_pandas()
    g = df[df["conv_id"] == "conv_00000010"].sort_values("turn_idx")
    prefix = "\n".join(g[g["turn_idx"] <= 1]["text"])
    rg = extract_rule_graph(prefix)
    label = dict(zip(rg.node_ids, rg.labels))
    want = {(label[s], r, label[d])
            for s, d, r in zip(rg.edge_src, rg.edge_dst, rg.edge_rel)}
    sel = edges[edges["conv_id"] == "conv_00000010"]
    got = {(r.subj, r.pred, r.obj) for r in sel.itertuples()}
    assert got == want


def test_canonicalize_job(job):
    """Phase-2 canonical graph: weighted dedup must conserve raw edge count,
    and hot synthetic orgs must unify across conversations."""
    cfg, out, summary = job
    res = kg.run_kg_job  # phase 1 already ran in the fixture
    canon = kg.run_canonicalize_job(out, cfg)
    assert canon["n_canonical_entities"] <= canon["n_aliases"]
    ce = kg.read_canonical_edges(out, cfg.version).to_pandas()
    assert int(ce["weight"].sum()) == summary["n_edges"]
    assert len(ce) == canon["n_canonical_edges"]
    # canonical triples are globally unique
    assert not ce.duplicated(["canonical_src", "pred", "canonical_dst"]).any()
    # alias table is a function: each norm maps to exactly one canonical id
    aliases = pd.read_parquet(
        f"{out}/version={cfg.version}/canonical/aliases")  # partitioned dir
    assert not aliases["norm"].duplicated().any()
    assert aliases["canonical_id"].notna().all()
    # phase-2 manifest carries per-table schema signatures (round 5)
    sigs = canon["schema_sig"]
    assert set(sigs) == {"aliases", "canonical_nodes", "canonical_edges"}
    assert all(len(v) == 16 for v in sigs.values())


def test_deterministic_across_partitioning(corpus_path, tmp_path):
    """Same triples regardless of partition count (distribution-invariance)."""
    outs = []
    for i, p in enumerate((3, 11)):
        out = str(tmp_path / f"p{p}")
        cfg = KGConfig(num_partitions=p, extract_concurrency=2)
        kg.run_kg_job(src.read_transcripts(corpus_path), cfg, out, resume=False)
        e = kg.read_edges(out, cfg.version).to_pandas()
        outs.append(sorted(map(tuple, e[["conv_id", "subj", "pred", "obj"]].values)))
    assert outs[0] == outs[1]


def test_canonicalize_resume(job):
    """Phase-2 resume: rerun with unchanged phase-1 output is a no-op; a
    changed phase 1 invalidates the canonical manifest."""
    cfg, out, _ = job
    first = kg.run_canonicalize_job(out, cfg)
    again = kg.run_canonicalize_job(out, cfg)
    assert again.get("resumed") is True
    assert again["n_canonical_edges"] == first["n_canonical_edges"]
    forced = kg.run_canonicalize_job(out, cfg, resume=False)
    assert "resumed" not in forced
    # forced rerun must OVERWRITE, not append: write_parquet appends into an
    # existing dir, so the job clears stale output first (round-2 fix)
    assert forced["n_canonical_edges"] == first["n_canonical_edges"]
    assert forced["n_aliases"] == first["n_aliases"]
    ce = kg.read_canonical_edges(out, cfg.version).to_pandas()
    assert len(ce) == first["n_canonical_edges"]


def test_kg_job_hierarchical_exchange_path(corpus_path, tmp_path):
    """num_partitions > 1024 routes through the two-level exchange; the
    graph equals a small-P run's."""
    cfg_small = KGConfig(num_partitions=8, extract_concurrency=2)
    cfg_large = KGConfig(num_partitions=2000, extract_concurrency=2)
    out_s, out_l = str(tmp_path / "s"), str(tmp_path / "l")
    kg.run_kg_job(src.read_transcripts(corpus_path), cfg_small, out_s,
                  resume=False)
    kg.run_kg_job(src.read_transcripts(corpus_path), cfg_large, out_l,
                  resume=False)
    key = ["conv_id", "subj", "pred", "obj"]
    es = kg.read_edges(out_s, 1).to_pandas()[key]
    el = kg.read_edges(out_l, 1).to_pandas()[key]
    assert sorted(map(tuple, es.values)) == sorted(map(tuple, el.values))


def test_package_root_api_and_canonical_readers(job):
    """Package-root convenience surface + canonical table readers."""
    import ai_knowledgegraph_extractor_ray as pkg
    cfg, out, _ = job
    pkg.run_canonicalize_job(out, cfg)
    aliases = pkg.read_aliases(out, cfg.version).to_pandas()
    nodes = pkg.read_canonical_nodes(out, cfg.version).to_pandas()
    edges = pkg.read_canonical_edges(out, cfg.version).to_pandas()
    assert not aliases["norm"].duplicated().any()
    assert set(nodes["canonical_id"]) >= set(edges["canonical_src"]) - set(
        aliases["canonical_id"])  # edge endpoints resolve via aliases/fallback
    assert pkg.get_stats(out, cfg.version)["total_conversations"] == 60


def test_auto_split_skew_rebalances_partitions(tmp_path):
    """Straggler mitigation (round-3 item 8): a corpus where ~90% of
    conversations hash into ONE base partition fans that partition out into
    sub-partitions sized back to ~the mean — identical graph output, point
    lookups and resume working under the persisted split layout."""
    import json
    import zlib

    import pyarrow.parquet as pq

    from ai_knowledgegraph_extractor_ray.config import KGConfig
    from ai_knowledgegraph_extractor_ray.pipelines import kg
    from ai_knowledgegraph_extractor_ray.sources import transcripts as src

    P = 4
    # conv ids engineered so most land on base pid 0
    hot, cold = [], []
    i = 0
    while len(hot) < 180 or len(cold) < 20:
        cid = f"conv_{i:06d}"
        if zlib.crc32(cid.encode()) % P == 0:
            if len(hot) < 180:
                hot.append(cid)
        elif len(cold) < 20:
            cold.append(cid)
        i += 1
    ids = hot + cold
    base = src.synthetic_transcripts_table(n_convs=len(ids), seed=5,
                                           include_golden=False)
    remap = dict(zip(sorted(set(base["conv_id"].to_pylist())), ids))
    import pyarrow as pa
    new_ids = pa.array([remap[c] for c in base["conv_id"].to_pylist()],
                       pa.string())
    tbl = base.set_column(0, "conv_id", new_ids)
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)

    plain_out, split_out = str(tmp_path / "plain"), str(tmp_path / "split")
    plain_cfg = KGConfig(num_partitions=P, auto_split_skew=False)
    split_cfg = KGConfig(num_partitions=P, auto_split_skew=True,
                         skew_split_threshold=2.0)
    s1 = kg.run_kg_job(src.read_transcripts(str(p)), plain_cfg, plain_out,
                       resume=False)
    s2 = kg.run_kg_job(src.read_transcripts(str(p)), split_cfg, split_out,
                       resume=False)

    # the hot partition fanned out
    assert s2["partitions_total"] > s1["partitions_total"]
    m1 = kg.lineage.committed_partitions(plain_out, 1)
    m2 = kg.lineage.committed_partitions(split_out, 1)
    mean2 = sum(m["n_turns"] for m in m2.values()) / len(m2)
    assert max(m["n_turns"] for m in m1.values()) > 3 * mean2
    assert max(m["n_turns"] for m in m2.values()) < 2.5 * mean2

    # identical graph output
    e1 = kg.read_edges(plain_out, 1).to_pandas()
    e2 = kg.read_edges(split_out, 1).to_pandas()
    cols = ["conv_id", "edge_id", "src_node_id", "dst_node_id", "pred"]
    assert (e1[cols].sort_values(cols).reset_index(drop=True)
            .equals(e2[cols].sort_values(cols).reset_index(drop=True)))

    # split map persisted with the version; point lookup honors it
    assert kg.load_split_map(split_out, 1)
    g = kg.get_conversation_graph(split_out, 1, hot[0], P)
    assert g["conv_id"] == hot[0]

    # resume under the persisted layout: everything already committed
    s3 = kg.run_kg_job(src.read_transcripts(str(p)), split_cfg, split_out,
                       resume=True)
    assert s3["partitions_resumed"] == s2["partitions_total"]
    assert s3["partitions_computed"] == 0


def test_incremental_cross_version_links_unchanged_partitions(tmp_path):
    """Round-4 incremental update: building version 2 over a corpus where
    only a few conversations changed re-extracts ONLY the touched
    partitions; every other partition is linked from version 1 (IO copy,
    fingerprint carried forward) and the final output is byte-equal to a
    from-scratch version-2 run."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "kg")
    cfg1 = KGConfig(num_partitions=8, extract_concurrency=2, version=1)
    base = src.synthetic_transcripts_table(n_convs=60, seed=42)
    p1 = tmp_path / "v1.parquet"
    pq.write_table(base, p1)
    kg.run_kg_job(src.read_transcripts(str(p1)), cfg1, out, resume=False)

    # v2 corpus: ONE conversation's text changes
    df = base.to_pandas()
    touched_conv = df["conv_id"].iloc[0]
    mask = df["conv_id"] == touched_conv
    df.loc[mask, "text"] = df.loc[mask, "text"] + " CHANGED"
    p2 = tmp_path / "v2.parquet"
    df.to_parquet(p2, index=False)

    cfg2 = KGConfig(num_partitions=8, extract_concurrency=2, version=2)
    s2 = kg.run_kg_job(src.read_transcripts(str(p2)), cfg2, out)
    from ai_knowledgegraph_extractor_ray.stages.conversation import partition_of
    touched_pid = partition_of(touched_conv, 8)
    assert s2["partitions_computed"] >= 1
    assert s2["partitions_linked"] == s2["partitions_total"] - s2["partitions_computed"]
    assert s2["partitions_linked"] > 0
    # linked manifests carry provenance; the touched partition was computed
    from ai_knowledgegraph_extractor_ray.state import lineage
    ms = lineage.committed_partitions(out, 2)
    assert "linked_from_version" not in ms[touched_pid]
    linked_ms = [m for m in ms.values() if m.get("linked_from_version") == 1]
    assert len(linked_ms) == s2["partitions_linked"]

    # ground truth: from-scratch version-2 run over the same corpus
    out_ref = str(tmp_path / "kg_ref")
    kg.run_kg_job(src.read_transcripts(str(p2)), cfg2, out_ref, resume=False)
    for reader in (kg.read_nodes, kg.read_edges):
        got = reader(out, 2).to_pandas()
        want = reader(out_ref, 2).to_pandas()
        key = list(got.columns)
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            want.sort_values(key).reset_index(drop=True))
    # version column restamped in linked partitions
    assert (kg.read_nodes(out, 2).to_pandas()["version"] == 2).all()

    # config change (different window_chars) must NOT link
    out3 = str(tmp_path / "kg3")
    kg.run_kg_job(src.read_transcripts(str(p1)),
                  KGConfig(num_partitions=8, extract_concurrency=2,
                           version=1), out3, resume=False)
    s3 = kg.run_kg_job(
        src.read_transcripts(str(p1)),
        KGConfig(num_partitions=8, extract_concurrency=2, version=2,
                 window_chars=2000), out3)
    assert s3["partitions_linked"] == 0
