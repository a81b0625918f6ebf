"""Ray-free scaling microbench: extract_rule_graph in N raw processes."""
import sys, time
from multiprocessing import Pool
sys.path.insert(0, "/root/repo")
from ai_knowledgegraph_extractor_ray.sources.transcripts import synth_turn_text, turns_per_conv

def work(args):
    seed, lo, hi = args
    from ai_knowledgegraph_extractor_ray.functions.rules import extract_rule_graph
    n_edges = 0
    for conv in range(lo, hi):
        text = "\n".join(synth_turn_text(seed, conv, t)
                         for t in range(turns_per_conv(conv, seed)))
        g = extract_rule_graph(text)
        n_edges += len(g.edge_rel)
    return n_edges

N_CONVS = 120_000
for procs in (2, 8, 32):
    chunks = [(42, i * N_CONVS // procs, (i + 1) * N_CONVS // procs)
              for i in range(procs)]
    t0 = time.perf_counter()
    with Pool(procs) as p:
        p.map(work, chunks)
    dt = time.perf_counter() - t0
    print(f"procs={procs:2d} wall={dt:5.1f}s convs/s={N_CONVS/dt:8.0f} per-proc={N_CONVS/dt/procs:7.0f}", flush=True)
