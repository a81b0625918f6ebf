"""Differential mega-fuzz: our extractor vs the EXECUTED reference — 5000
template cases + 2000 whitespace-separator cases + 2000 random word-soup
cases, byte-compared. Exits non-zero on the first divergences.

    PYTHONPATH=/root/repo python tools/fuzz_reference.py

Round-2 result: all 9000 cases byte-equal (seed 0xD1FF), including
adversarial entity names that collide with relation vocabulary ("Works
At", "Ceo", "Is Located", "Serves As Head") and the full \s separator
alphabet (space, tab, newline, CRLF, nbsp, vertical tab, form feed).
"""
import logging
logging.disable(logging.CRITICAL)   # the reference print-logs per sentence
import importlib.util, random, sys, types, io, contextlib
sys.path.insert(0, "/root/repo")
for name in ("PyPDF2", "docx", "requests"):
    sys.modules.setdefault(name, types.ModuleType(name))
cfg = types.ModuleType("config")
cfg.settings = types.SimpleNamespace(OLLAMA_BASE_URL="x", OLLAMA_MODEL="x",
                                     USE_OPENAI=False, OPENAI_API_KEY=None)
sys.modules["config"] = cfg
spec = importlib.util.spec_from_file_location("ref_services", "/root/reference/services.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
ref = mod.KnowledgeGraphExtractor()

from ai_knowledgegraph_extractor_ray.functions.rules import extract_rule_graph, graph_to_dict

def canon(g):
    return {"nodes": [{"id": n["id"], "label": n["label"], "type": n["type"]} for n in g["nodes"]],
            "edges": [{"source": e["source"], "target": e["target"], "relationship": e["relationship"]} for e in g["edges"]]}

TEMPLATES = ["{a} is the CEO of {b}.", "{a} is the CTO of {b}.",
    "{a} works as a {w} engineer at {b}.", "{a} worked for {b}.",
    "{a} founded {b} in {c}.", "{a} founded {b} in {c} in {yr}.",
    "{a} established {b}.", "{a} created {b} and {c}.",
    "{a} in {b} in {yr}.", "{a}, headquartered in {b}, grew.",
    "{a} is located in the {b}.", "{a} acquired {b} for money.",
    "{a} bought {b}. {b} purchased {c}!", "{a} manages the {b}.",
    "{a} oversees {b}? {a} leads {c}.", "{a} serves as head of {b}.",
    "{a} now serves as chief of {b}.", "{a} developed a platform called {b}.",
    "{a} built {b}. {c} designed {a}.", "{a} is used by {b}.",
    "{a} met {b} near {c}.", "Mr. {a} is the CEO of {b}.",
    "Dr. {a} joined. {a} leads {b}.", "{a} is based in {b}.",
    "{a} serves as {w} of {b}."]
NAMES = ["Acme", "Acme Corp", "Beta Industries", "John Doe", "Jane", "MixedCase",
         "ALLCAP", "lowercase", "San Francisco", "New York City", "The Board",
         "Data Systems Inc", "On Guler", "X", "Ab", "Big Data Platform",
         "Works At", "Ceo", "Is Located", "In", "The", "Serves As Head"]
WORDS = ["senior", "staff", "Lead", "principal", "vice", "chief"]
SEPS = [" ", "\t", "\n", "\xa0", "  ", " \n", "\t\t", "\r\n", "\x0b", "\x0c"]
SOUP = NAMES + WORDS + ["is", "the", "of", "in", "at", "for", "by", "and",
                        "1999", "2024", ".", "!", "?", ",", "(", ")", '"',
                        "CEO", "CTO", "founded", "acquired", "works", "built",
                        "located", "based", "serves", "used", "called"]
SEED = int(sys.argv[1], 0) if len(sys.argv) > 1 else 0xD1FF
rng = random.Random(SEED)
bad = 0
for phase, n in (("template", 5000), ("ws", 2000), ("soup", 2000)):
    for case in range(n):
        if phase == "template":
            text = " ".join(rng.choice(TEMPLATES).format(
                a=rng.choice(NAMES), b=rng.choice(NAMES), c=rng.choice(NAMES),
                w=rng.choice(WORDS), yr=rng.randint(1900, 2030))
                for _ in range(rng.randint(1, 5)))
        elif phase == "ws":
            base = rng.choice(TEMPLATES).format(
                a=rng.choice(NAMES), b=rng.choice(NAMES), c=rng.choice(NAMES),
                w=rng.choice(WORDS), yr=rng.randint(1900, 2030))
            text = "".join(tok if i == 0 else rng.choice(SEPS) + tok
                           for i, tok in enumerate(base.split(" ")))
        else:
            text = "".join(rng.choice(SOUP) + rng.choice(SEPS)
                           for _ in range(rng.randint(2, 60)))
        ours = graph_to_dict(extract_rule_graph(text))
        with contextlib.redirect_stdout(io.StringIO()):
            theirs = canon(ref._extract_with_rules(text))
        if ours != theirs:
            bad += 1
            print(f"DIVERGE [{phase} {case}]: {text!r}")
            if bad > 5:
                sys.exit(1)
print("seed", hex(SEED), "all", 5000+2000+2000, "cases byte-equal" if bad == 0 else f"{bad} diverged")
