"""Sort-groupby vs raw-Ray exchange, same fused KG job, same corpus —
reproduces the round-2 scaling evidence (BASELINE.md).

    PYTHONPATH=/root/repo python tools/exchange_probe.py [cpus] [mult]

Runs the fused transcripts->graph job twice on the cached bench corpus
(mult x sf0.1 documents conversations): once through Ray Data's sort-based
``groupby(partition_id).map_groups`` and once through
``ops/exchange.hash_exchange``. Prints one JSON line with both walls.
Round-2 measurements at mult=192: the sort variant spends ~6 s of
near-serial barrier wall on ~3.6 CPU-s of shuffle bookkeeping at 32 CPUs;
the exchange removes it (8->32 scaling efficiency 0.50 -> 0.71-0.78).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 192

    import ray
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_knowledgegraph_extractor_ray.config import KGConfig
    from ai_knowledgegraph_extractor_ray.ops.exchange import hash_exchange
    from ai_knowledgegraph_extractor_ray.sources import transcripts as src
    from ai_knowledgegraph_extractor_ray.stages.conversation import (
        add_partition_id,
        assemble_partition,
    )
    from ai_knowledgegraph_extractor_ray.stages.extract import Extractor
    from ai_knowledgegraph_extractor_ray.state import lineage

    @ray.remote
    def _noop() -> int:
        return 0

    ray.get([_noop.remote() for _ in range(cpus * 2)])

    n_docs = pq.ParquetFile(
        "/root/testdata/sf0.1/documents.parquet").metadata.num_rows
    n_convs = mult * n_docs
    corpus = f"/tmp/kg_bench_corpus_{n_convs}_s42"
    if not os.path.exists(corpus + ".done"):
        shutil.rmtree(corpus, ignore_errors=True)
        src.synthetic_transcripts(
            n_convs=n_convs, seed=42,
            override_num_blocks=max(cpus * 2, 16)).write_parquet(corpus)
        open(corpus + ".done", "w").write("ok")

    cfg = KGConfig(num_partitions=256)
    extractor = Extractor(cfg)

    def run_exchange() -> tuple[float, int]:
        out = tempfile.mkdtemp(prefix="kg_ex_")
        t0 = time.perf_counter()

        def reduce_fn(pid: int, tbl: pa.Table):
            conv = assemble_partition(tbl.to_pandas(), version=cfg.version)
            if len(conv) == 0:
                return None
            rows = extractor(pa.Table.from_pandas(
                conv, preserve_index=False)).to_pandas()
            return lineage.write_partition(
                rows, out, cfg.version).to_dict("records")[0]

        records = hash_exchange(src.read_transcripts(corpus),
                                cfg.num_partitions, reduce_fn)
        dt = time.perf_counter() - t0
        nt = sum(r["n_turns"] for r in records)
        shutil.rmtree(out, ignore_errors=True)
        return dt, nt

    def run_sort_groupby() -> tuple[float, int]:
        out = tempfile.mkdtemp(prefix="kg_sort_")
        t0 = time.perf_counter()
        ds = add_partition_id(src.read_transcripts(corpus),
                              cfg.num_partitions)

        def process(df: pd.DataFrame) -> pd.DataFrame:
            conv = assemble_partition(df, version=cfg.version)
            if len(conv) == 0:
                return lineage.empty_manifest_frame()
            rows = extractor(pa.Table.from_pandas(
                conv, preserve_index=False)).to_pandas()
            return lineage.write_partition(rows, out, cfg.version)

        manifests = ds.groupby("partition_id").map_groups(
            process, batch_format="pandas").to_pandas()
        dt = time.perf_counter() - t0
        nt = int(manifests["n_turns"].sum())
        shutil.rmtree(out, ignore_errors=True)
        return dt, nt

    t_ex, nt_ex = run_exchange()
    t_sort, nt_sort = run_sort_groupby()
    assert nt_ex == nt_sort
    print(json.dumps({
        "cpus": cpus, "turns": nt_ex,
        "exchange_wall_s": round(t_ex, 2),
        "sort_groupby_wall_s": round(t_sort, 2),
        "exchange_tput": round(nt_ex / t_ex),
        "sort_tput": round(nt_sort / t_sort),
        "speedup": round(t_sort / t_ex, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
