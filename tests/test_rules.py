"""Golden parity tests: our deterministic extractor vs the reference's
observed behavior (fixtures produced by executing the reference extractor,
reference: services.py:379-547, on probe texts)."""

import json
from pathlib import Path

import pytest

from ai_knowledgegraph_extractor_ray.functions.rules import (
    MAX_ENTITIES,
    extract_entities,
    extract_rule_graph,
    graph_to_dict,
    guess_entity_type,
)

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "reference_rule_graphs.json").read_text()
)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_graph_parity(name):
    fix = GOLDEN[name]
    got = graph_to_dict(extract_rule_graph(fix["text"]))
    assert got == fix["graph"], f"graph mismatch for fixture {name}"


def test_entity_cap():
    text = ". ".join(
        f"Uniq{chr(97 + i)}qq Word{chr(97 + i)}ww spoke" for i in range(26)
    )
    assert len(extract_entities(text)) == MAX_ENTITIES


def test_empty_and_blank():
    for t in ("", "   ", "\n\t"):
        g = extract_rule_graph(t)
        assert g.node_ids == [] and g.edge_src == []


def test_no_self_loops_and_no_dangling():
    for fix in GOLDEN.values():
        g = extract_rule_graph(fix["text"])
        ids = set(g.node_ids)
        for s, d in zip(g.edge_src, g.edge_dst):
            assert s != d
            assert s in ids and d in ids


def test_node_ids_dense_first_appearance():
    for fix in GOLDEN.values():
        g = extract_rule_graph(fix["text"])
        assert g.node_ids == [f"n{i}" for i in range(1, len(g.node_ids) + 1)]


def test_edge_dedup():
    g = extract_rule_graph("Bob manages Alpha Team. Bob manages Alpha Team.")
    triples = list(zip(g.edge_src, g.edge_dst, g.edge_rel))
    assert len(triples) == len(set(triples))


def test_guess_entity_type_order():
    ctx = ""
    assert guess_entity_type("Acme Corporation", ctx) == "Organization"
    assert guess_entity_type("New York", ctx) == "Location"
    assert guess_entity_type("SmartBot", ctx) == "Technology"
    assert guess_entity_type("Senior Engineer", ctx) == "JobTitle"
    assert guess_entity_type("John Smith", ctx) == "Person"
    assert guess_entity_type("John Smith", "John Smith works at X") == "Person"
    assert guess_entity_type("Widget", ctx) == "Entity"


def test_determinism():
    text = GOLDEN["demo_sample"]["text"]
    a = graph_to_dict(extract_rule_graph(text))
    b = graph_to_dict(extract_rule_graph(text))
    assert a == b


def test_prefilter_never_underadmits():
    """The lowercase-literal prefilter is a pure fast-path: disabling it
    (empty-string literal admits every sentence) must never change the
    extracted graph. Randomized texts over the relation vocabulary with
    mixed whitespace separators."""
    import random

    from ai_knowledgegraph_extractor_ray.functions import rules

    no_prefilter = [(p, rel, ("",)) for p, rel, _ in rules.RELATION_PATTERNS]
    rng = random.Random(0xACE)
    words = ["Acme", "Corp", "John", "Doe", "is", "the", "CEO", "CTO", "of",
             "in", "at", "founded", "located", "acquired", "works", "serves",
             "as", "head", "developed", "built", "used", "by", "1999", "Beta",
             "Labs", "manages", "leads", ".", "!", "?"]
    seps = [" ", "\t", "\n", "  ", "\xa0"]
    original = rules.RELATION_PATTERNS
    try:
        for _ in range(200):
            text = "".join(
                rng.choice(words) + rng.choice(seps)
                for _ in range(rng.randint(3, 40)))
            with_pref = rules.graph_to_dict(rules.extract_rule_graph(text))
            rules.RELATION_PATTERNS = no_prefilter
            without = rules.graph_to_dict(rules.extract_rule_graph(text))
            rules.RELATION_PATTERNS = original
            assert with_pref == without, text
    finally:
        rules.RELATION_PATTERNS = original
