"""Triple extraction stage: conversation texts -> graph rows.

The per-batch body of the extractor actor pool (SURVEY.md §2.2 M1-M11). Each
actor holds its backend state (compiled patterns / model client) across
batches; work happens per batch over Arrow columns. The LLM fallback chain of
the reference (openai -> ollama -> rules, validation-gated, reference:
services.py:85-115) becomes a per-row try/validate/fallback inside the actor —
a poisoned row degrades to the deterministic backend instead of failing the
partition.

Output is a single unified "graph rows" Arrow table (kind: node|edge) so one
streaming pass produces both graph tables; the sink partitions by kind.
"""

from __future__ import annotations

import hashlib
import json
from typing import Protocol

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import KGConfig
from ..functions.rules import RuleGraph, extract_rule_graph
from ..functions import json_repair

GRAPH_ROW_FIELDS = [
    ("kind", pa.string()),            # "node" | "edge"
    ("conv_id", pa.string()),
    ("window_id", pa.int32()),
    ("node_id", pa.string()),         # nodes only
    ("label", pa.string()),           # nodes only (surface form)
    ("node_type", pa.string()),       # nodes only
    ("edge_id", pa.string()),         # edges only (content hash)
    ("src_node_id", pa.string()),
    ("dst_node_id", pa.string()),
    ("subj", pa.string()),            # edges only: surface forms
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("version", pa.int32()),
    ("partition_id", pa.int32()),
    ("conv_fp", pa.uint64()),
    ("backend", pa.string()),         # which extractor produced the row
    ("n_turns", pa.int32()),          # conv rows only
]
GRAPH_ROWS = pa.schema(GRAPH_ROW_FIELDS)


class ExtractorBackend(Protocol):
    """One text unit in, one graph out. Implementations must be pure
    per-call (no cross-call state that affects results)."""

    name: str

    def extract(self, text: str) -> RuleGraph: ...


class RuleBackend:
    """The deterministic oracle backend (reference: services.py:379-547)."""

    name = "rules"

    def extract(self, text: str) -> RuleGraph:
        return extract_rule_graph(text)


class LLMBackend:
    """LLM-backed extraction with validate -> rules fallback.

    The sandbox has no model runtime, so the client seam
    (``_generate``) raises NotImplementedError unless a ``fake_responses``
    callable is injected; the Ray-side plumbing (batching, JSON repair,
    validation, fallback) is real and tested via the deterministic fake.
    Mirrors reference semantics: prompt over text[:max_chars]
    (services.py:375), robust JSON parse (services.py:233-320), structural
    validation with node/edge caps (services.py:117-176), referential
    formatting (services.py:549-580), rules fallback on any failure
    (services.py:102-115).
    """

    name = "llm"

    def __init__(self, cfg: KGConfig, fake_responses=None):
        self.cfg = cfg
        self.fallback = RuleBackend()
        self.fake_responses = fake_responses
        # Protocol chain, one client per provider per ACTOR (connection
        # reuse; Ollama's one-shot health probe amortized over the actor's
        # lifetime). Mirrors the reference's openai -> ollama -> rules
        # chain (services.py:85-115) with cfg.llm_provider picking the
        # members and order.
        self.clients: list = []
        if fake_responses is None and (cfg.llm_base_url
                                       or cfg.llm_openai_base_url):
            from ..functions.llm_client import OllamaClient, OpenAIClient
            for provider in (p.strip() for p in cfg.llm_provider.split(",")):
                if provider == "ollama":
                    if cfg.llm_base_url:   # no URL -> provider just absent
                        self.clients.append(OllamaClient(
                            cfg.llm_base_url, cfg.llm_model,
                            timeout_s=cfg.llm_timeout_s))
                elif provider == "openai":
                    base = cfg.llm_openai_base_url or cfg.llm_base_url
                    self.clients.append(OpenAIClient(
                        base, cfg.llm_model, api_key=cfg.llm_api_key,
                        timeout_s=cfg.llm_timeout_s))
                elif provider:
                    raise ValueError(f"unknown llm_provider {provider!r}")
            if not self.clients:
                raise ValueError(
                    f"llm_provider={cfg.llm_provider!r} matched no "
                    "configured endpoint (set llm_base_url / "
                    "llm_openai_base_url)")

    def _generate(self, text_chunk: str) -> str:
        if self.fake_responses is not None:
            return self.fake_responses(text_chunk)
        if self.clients:
            from ..functions.llm_client import extraction_prompt
            prompt = extraction_prompt(text_chunk, self.cfg.llm_max_chars)
            last: Exception | None = None
            for client in self.clients:
                try:
                    return client.generate(prompt)
                except Exception as e:     # next provider, then rules
                    last = e
            raise last
        raise NotImplementedError(
            "no LLM runtime configured; set llm_base_url, inject "
            "fake_responses, or use backend='rules'")

    def extract(self, text: str) -> RuleGraph:
        if not text or not text.strip():
            return RuleGraph()
        try:
            raw = self._generate(text[: self.cfg.llm_max_chars])
            data = json_repair.parse_llm_json(raw)
            graph = json_repair.validate_and_format_graph(data)
            if not json_repair.validate_extraction_result(
                    graph, self.cfg.max_nodes_per_unit, self.cfg.max_edges_per_unit):
                raise ValueError("validation failed")
        except Exception:
            return self.fallback.extract(text)
        g = RuleGraph()
        for n in graph["nodes"]:
            g.node_ids.append(str(n["id"]))
            g.labels.append(str(n["label"]))
            g.types.append(str(n["type"]))
        id_to_label = dict(zip(g.node_ids, g.labels))
        for e in graph["edges"]:
            g.edge_src.append(str(e["source"]))
            g.edge_dst.append(str(e["target"]))
            g.edge_rel.append(str(e["relationship"]))
        return g


def make_backend(cfg: KGConfig) -> ExtractorBackend:
    if cfg.backend == "rules":
        return RuleBackend()
    if cfg.backend == "llm":
        return LLMBackend(cfg, fake_responses=cfg.extra.get("fake_responses"))
    raise ValueError(f"unknown backend {cfg.backend!r}")


def edge_id_of(conv_id: str, version: int, subj: str, pred: str, obj: str) -> str:
    return hashlib.sha256(
        f"{conv_id}\x00{version}\x00{subj}\x00{pred}\x00{obj}".encode()
    ).hexdigest()[:20]


class Extractor:
    """map_batches callable class -> actor pool. State (backend, any model
    client) is built once per actor in __init__; __call__ handles one Arrow
    batch of assembled conversations/windows."""

    def __init__(self, cfg: KGConfig):
        self.cfg = cfg
        self.backend = make_backend(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in GRAPH_ROW_FIELDS}
        conv_ids = batch["conv_id"].to_pylist()
        win_ids = batch["window_id"].to_pylist()
        texts = batch["text"].to_pylist()
        versions = batch["version"].to_pylist()
        pids = batch["partition_id"].to_pylist()
        fps = batch["conv_fp"].to_pylist()
        n_turns = batch["n_turns"].to_pylist()

        bname = self.backend.name

        def emit(kind, cid, wid, ver, pid, fp, *, node_id=None, label=None,
                 node_type=None, edge_id=None, src=None, dst=None, subj=None,
                 pred=None, obj=None, nt=None):
            cols["kind"].append(kind)
            cols["conv_id"].append(cid)
            cols["window_id"].append(wid)
            cols["node_id"].append(node_id)
            cols["label"].append(label)
            cols["node_type"].append(node_type)
            cols["edge_id"].append(edge_id)
            cols["src_node_id"].append(src)
            cols["dst_node_id"].append(dst)
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)
            cols["version"].append(ver)
            cols["partition_id"].append(pid)
            cols["conv_fp"].append(fp)
            cols["backend"].append(bname)
            cols["n_turns"].append(nt)

        for cid, wid, text, ver, pid, fp, nt in zip(
                conv_ids, win_ids, texts, versions, pids, fps, n_turns):
            try:
                g = self.backend.extract(text)
                status = bname
            except Exception:
                # a poisoned row must never fail its partition (SURVEY §4.2):
                # degrade to the deterministic backend, else to an empty
                # graph, and mark the unit's lineage row
                try:
                    g = extract_rule_graph(text)
                    status = "rules_fallback"
                except Exception:
                    g = RuleGraph()
                    status = "error"
            # marker row per text unit: lineage counts + guarantees every
            # input partition commits even when extraction yields no graph
            emit("conv", cid, wid, ver, pid, fp, nt=nt)
            if status != bname:
                cols["backend"][-1] = status
            label_of = dict(zip(g.node_ids, g.labels))
            for nid, label, typ in zip(g.node_ids, g.labels, g.types):
                emit("node", cid, wid, ver, pid, fp,
                     node_id=nid, label=label, node_type=typ)
            for src, dst, rel in zip(g.edge_src, g.edge_dst, g.edge_rel):
                subj, obj = label_of.get(src, ""), label_of.get(dst, "")
                emit("edge", cid, wid, ver, pid, fp,
                     edge_id=edge_id_of(cid, ver, subj, rel, obj),
                     src=src, dst=dst, subj=subj, pred=rel, obj=obj)

        return pa.Table.from_pydict(
            {name: pa.array(cols[name], typ) for name, typ in GRAPH_ROW_FIELDS},
            schema=GRAPH_ROWS,
        )


def renumber_conversation_windows(df) -> "pd.DataFrame":
    """Conversation-level node ids for windowed extraction (SURVEY §7.3):
    first-appearance numbering ACROSS a conversation's ordered windows, not
    per window. Runs on one partition's graph-rows frame inside the fused
    partition task — all windows of a conversation are colocated there.

    Node identity is the exact surface label (mirroring the reference's
    per-document node_map keyed on label, services.py:410-419): the first
    window in which a label appears fixes its id n<rank> and its type guess;
    later windows' re-extractions of the same label collapse into it. Edge
    endpoints are remapped via their surface forms and cross-window
    duplicate (src, pred, dst) triples are suppressed, extending the
    reference's per-document dedup to the conversation. Identity for
    single-window conversations (window_chars=0)."""
    import pandas as pd

    nodes = df[df["kind"] == "node"]
    if not len(nodes):
        return df
    nodes = nodes.assign(_ord=nodes["node_id"].str.slice(1).astype(int))
    nodes = nodes.sort_values(["conv_id", "window_id", "_ord"],
                              kind="mergesort")
    firsts = nodes.drop_duplicates(["conv_id", "label"]).copy()
    firsts["node_id"] = "n" + (
        firsts.groupby("conv_id", sort=False).cumcount() + 1).astype(str)
    gid = firsts.set_index(["conv_id", "label"])["node_id"]

    edges = df[df["kind"] == "edge"]
    if len(edges):
        edges = edges.sort_values(["conv_id", "window_id"], kind="mergesort")
        edges = edges.assign(
            src_node_id=gid.reindex(pd.MultiIndex.from_arrays(
                [edges["conv_id"], edges["subj"]])).to_numpy(),
            dst_node_id=gid.reindex(pd.MultiIndex.from_arrays(
                [edges["conv_id"], edges["obj"]])).to_numpy())
        edges = edges.drop_duplicates(
            ["conv_id", "src_node_id", "pred", "dst_node_id"])

    convs = df[df["kind"] == "conv"]
    return pd.concat([convs, firsts.drop(columns="_ord"), edges],
                     ignore_index=True)[df.columns]


def extract_graphs(conversations: rd.Dataset, cfg: KGConfig) -> rd.Dataset:
    """Attach the extractor stage.

    The deterministic rule backend is STATELESS (patterns compile at module
    import in every worker), so it runs as plain tasks — no actor pool to
    spawn, tasks scale elastically with the cluster, and nothing idles. Only
    genuinely stateful backends (LLM client / model weights) pay for an
    actor pool: there the per-actor __init__ cost is what the pool exists to
    amortize. (Measured: a 30-actor pool on a 32-CPU node costs seconds of
    spawn time, which inverted the 8->32 CPU scaling curve for short jobs.)
    """
    if cfg.backend == "rules":
        return conversations.map_batches(
            Extractor(cfg),
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
    return conversations.map_batches(
        Extractor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=1,
    )
