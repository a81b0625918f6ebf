"""LLM response handling: JSON rescue strategies, structural validation,
referential formatting (reference: services.py:233-320, 117-176, 549-580)."""

import pytest

from ai_knowledgegraph_extractor_ray.functions import json_repair as jr

GOOD = '{"nodes": [{"id": "n1", "label": "Acme", "type": "Organization"}], "edges": []}'


def test_direct_parse():
    assert jr.parse_llm_json(GOOD)["nodes"][0]["label"] == "Acme"


def test_fenced_code_rescue():
    assert jr.parse_llm_json(f"Here is the graph:\n```json\n{GOOD}\n```\nDone!")[
        "nodes"][0]["id"] == "n1"


def test_plain_fence_and_inline_tick():
    assert jr.parse_llm_json(f"```\n{GOOD}\n```")["nodes"]
    assert jr.parse_llm_json(f"result: `{GOOD}`")["nodes"]


def test_brace_span_rescue():
    assert jr.parse_llm_json(f"Sure! {GOOD} Hope that helps.")["nodes"]


def test_trailing_comma_repair():
    messy = '{"nodes": [{"id": "n1", "label": "A", "type": "T"},], "edges": [],}'
    out = jr.parse_llm_json(messy)
    assert out["nodes"][0]["id"] == "n1"


def test_bare_key_repair():
    messy = '{nodes: [], edges: []}'
    assert jr.parse_llm_json(messy) == {"nodes": [], "edges": []}


def test_unparseable_raises():
    with pytest.raises(ValueError):
        jr.parse_llm_json("I could not produce a graph, sorry.")
    with pytest.raises(ValueError):
        jr.parse_llm_json("")


def test_format_drops_dangling_edges_and_defaults():
    raw = {
        "nodes": [{"id": "n1", "label": "A"}, {"id": "n2", "label": "B"},
                  "garbage", {"label": "no id"}],
        "edges": [
            {"source": "n1", "target": "n2"},              # ok, default rel
            {"source": "n1", "target": "nX",
             "relationship": "works_at"},                  # dangling -> drop
        ],
    }
    out = jr.validate_and_format_graph(raw)
    assert [n["id"] for n in out["nodes"]] == ["n1", "n2"]
    assert out["nodes"][0]["type"] == "Entity"
    assert out["edges"] == [
        {"source": "n1", "target": "n2", "relationship": "related_to"}]


def test_validate_extraction_result_caps_and_shapes():
    ok = {"nodes": [{"id": "n1", "label": "A", "type": "T"}],
          "edges": [{"source": "n1", "target": "n1", "relationship": "r"}]}
    assert jr.validate_extraction_result(ok)
    assert not jr.validate_extraction_result({"nodes": {}, "edges": []})
    assert not jr.validate_extraction_result(
        {"nodes": [{"id": "", "label": "A", "type": "T"}], "edges": []})
    big = {"nodes": [{"id": f"n{i}", "label": "x", "type": "T"}
                     for i in range(5)], "edges": []}
    assert not jr.validate_extraction_result(big, max_nodes=3)
