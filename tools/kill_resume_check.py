"""True kill/resume check: SIGKILL a KG job mid-run, resume it, and verify
the final graph equals a clean run's.

    PYTHONPATH=/root/repo python tools/kill_resume_check.py

Spawns a worker subprocess (its own Ray session) running the job over a
corpus sized to take ~20s, SIGKILLs it partway through, reruns with
resume=True, and diffs edge sets against an uninterrupted run. Exits 0 on
success; prints a one-line JSON verdict.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

WORKER = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ai_knowledgegraph_extractor_ray.config import KGConfig
from ai_knowledgegraph_extractor_ray.pipelines import kg
from ai_knowledgegraph_extractor_ray.sources import transcripts as src

out, n_convs, resume = sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1"
cfg = KGConfig(num_partitions=16)
ts = src.synthetic_transcripts(n_convs=n_convs, seed=42, override_num_blocks=8)
summary = kg.run_kg_job(ts, cfg, out, resume=resume)
print("SUMMARY " + str(summary), flush=True)
ray.shutdown()
"""


def run_worker(out: str, n_convs: int, resume: bool,
               kill_after: float | None = None) -> tuple[int, str]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        path = f.name
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.Popen(
        [sys.executable, path, out, str(n_convs), "1" if resume else "0"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    if kill_after is not None:
        time.sleep(kill_after)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return -9, ""
    out_text, _ = proc.communicate(timeout=600)
    return proc.returncode, out_text


def edge_set(out_dir: str) -> set:
    import glob

    import pandas as pd
    files = glob.glob(f"{out_dir}/version=1/part-*/edges.parquet")
    dfs = [pd.read_parquet(f) for f in files]
    if not dfs:
        return set()
    e = pd.concat(dfs)
    return {(r.conv_id, r.subj, r.pred, r.obj) for r in e.itertuples()}


def manifests(out_dir: str) -> int:
    import glob
    return len(glob.glob(f"{out_dir}/version=1/_manifests/part-*.json"))


def main() -> int:
    n_convs = 60_000
    base = tempfile.mkdtemp(prefix="kill_resume_")
    clean, crashed = f"{base}/clean", f"{base}/crashed"

    t0 = time.time()
    rc, _ = run_worker(clean, n_convs, resume=False)
    clean_wall = time.time() - t0
    assert rc == 0, f"clean run failed rc={rc}"
    clean_edges = edge_set(clean)

    kill_at = max(4.0, clean_wall * 0.7)
    rc, _ = run_worker(crashed, n_convs, resume=False, kill_after=kill_at)
    committed_before = manifests(crashed)

    rc, _ = run_worker(crashed, n_convs, resume=True)
    assert rc == 0, f"resume run failed rc={rc}"
    committed_after = manifests(crashed)

    resumed_edges = edge_set(crashed)
    verdict = {
        "clean_wall_s": round(clean_wall, 1),
        "killed_after_s": round(kill_at, 1),
        "partitions_committed_at_kill": committed_before,
        "partitions_committed_after_resume": committed_after,
        "edges_clean": len(clean_edges),
        "edges_resumed": len(resumed_edges),
        "equal": resumed_edges == clean_edges,
    }
    print(json.dumps(verdict))
    return 0 if verdict["equal"] and committed_after == 16 else 1


if __name__ == "__main__":
    sys.exit(main())
