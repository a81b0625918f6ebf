"""Per-partition lineage manifests: the engine's checkpoint/resume unit.

Replaces the reference's ACID transaction-per-document persistence
(reference: database_service.py:24-83) with idempotent partition commits:

    out_dir/version=K/part-00042/{nodes,edges,convs}.parquet
    out_dir/version=K/_manifests/part-00042.json      <- written LAST

The manifest write is the commit point — a resumed job trusts only
partitions whose manifest exists and parses, so a crash mid-partition
leaves at worst orphaned data files that the rerun overwrites. This is
object-store friendly (no renames required). Extraction is a pure function
of a partition's input (deterministic backend), so re-running an
uncommitted partition is idempotent.

Each manifest records the partition's input fingerprint (xor of per-turn
hashes, order-insensitive): a resume over *changed* input is detected by
``validate_manifest`` rather than silently reusing stale output.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from . import schema_evo


def version_dir(out_dir: str, version: int) -> Path:
    return Path(out_dir) / f"version={version}"


def partition_dir(out_dir: str, version: int, pid: int) -> Path:
    return version_dir(out_dir, version) / f"part-{pid:05d}"


def manifest_path(out_dir: str, version: int, pid: int) -> Path:
    return version_dir(out_dir, version) / "_manifests" / f"part-{pid:05d}.json"


def committed_partitions(out_dir: str, version: int) -> dict[int, dict]:
    """partition_id -> manifest for every committed partition of a version."""
    mdir = version_dir(out_dir, version) / "_manifests"
    if not mdir.is_dir():
        return {}
    out = {}
    for p in sorted(mdir.glob("part-*.json")):
        try:
            m = json.loads(p.read_text())
            out[int(m["partition_id"])] = m
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn manifest == uncommitted
    return out


NODE_COLS = ["conv_id", "node_id", "label", "node_type", "version", "window_id"]
EDGE_COLS = ["conv_id", "edge_id", "src_node_id", "dst_node_id",
             "subj", "pred", "obj", "version", "window_id"]
CONV_COLS = ["conv_id", "window_id", "n_turns", "version", "backend"]


def write_partition(group: pd.DataFrame, out_dir: str, version: int,
                    input_bytes: int = 0,
                    started_at: float | None = None,
                    config_sig: str = "") -> pd.DataFrame:
    """Commit one partition's graph rows. Runs inside the partition's
    reduce task, returning the manifest as a one-row DataFrame so the
    manifests themselves form a small Dataset the driver can aggregate.
    ``started_at`` (a perf_counter value) lets the caller charge the whole
    partition task (assemble+extract+write) to ``wall_time_s``; the
    default times only the commit."""
    t0 = started_at if started_at is not None else time.perf_counter()
    pid = int(group["partition_id"].iloc[0])
    pdir = partition_dir(out_dir, version, pid)
    pdir.mkdir(parents=True, exist_ok=True)

    nodes = group.loc[group["kind"] == "node", NODE_COLS]
    edges = group.loc[group["kind"] == "edge", EDGE_COLS]
    convs = group.loc[group["kind"] == "conv", CONV_COLS]
    nodes.to_parquet(pdir / "nodes.parquet", index=False)
    edges.to_parquet(pdir / "edges.parquet", index=False)
    convs.to_parquet(pdir / "convs.parquet", index=False)

    conv_fp = group.drop_duplicates("conv_id")["conv_fp"].astype("uint64").values
    fingerprint = f"{np.bitwise_xor.reduce(conv_fp) if len(conv_fp) else 0:016x}"
    manifest = {
        "partition_id": pid,
        "version": version,
        "input_fingerprint": fingerprint,
        "n_conversations": int(group["conv_id"].nunique()),
        "n_turns": int(convs.drop_duplicates("conv_id")["n_turns"].sum()),
        "n_nodes": int(len(nodes)),
        "n_edges": int(len(edges)),
        "input_bytes": int(input_bytes),
        "wall_time_s": round(time.perf_counter() - t0, 4),
        # partition-layout + extraction-config signature: cross-version
        # reuse links a partition only when this matches (same
        # num_partitions / window_chars / backend — a fingerprint match
        # under a different layout or extractor would be meaningless)
        "config_sig": config_sig,
        # per-table schema signatures (state/schema_evo.py): lets readers
        # and audits detect mixed-schema version ranges from manifests
        # alone — the lake's Alembic-revision analogue
        "schema_sig": {
            "nodes": schema_evo.schema_sig(
                pa.Schema.from_pandas(nodes, preserve_index=False)),
            "edges": schema_evo.schema_sig(
                pa.Schema.from_pandas(edges, preserve_index=False)),
            "convs": schema_evo.schema_sig(
                pa.Schema.from_pandas(convs, preserve_index=False)),
        },
    }
    mpath = manifest_path(out_dir, version, pid)
    mpath.parent.mkdir(parents=True, exist_ok=True)
    tmp = mpath.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest))
    tmp.replace(mpath)  # local-fs atomicity; on object stores the manifest
    # object's existence is still the commit point
    return pd.DataFrame([manifest])


MANIFEST_COLS = ["partition_id", "version", "input_fingerprint",
                 "n_conversations", "n_turns", "n_nodes", "n_edges",
                 "input_bytes", "wall_time_s"]


def empty_manifest_frame() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="object" if c == "input_fingerprint"
                                      else "float64" if c == "wall_time_s"
                                      else "int64")
                         for c in MANIFEST_COLS})


def validate_manifest(manifest: dict, fingerprint: str) -> bool:
    """True iff a committed partition's recorded input fingerprint matches a
    freshly computed one (resume-on-changed-input detection)."""
    return manifest.get("input_fingerprint") == fingerprint


def link_partition(out_dir: str, prev_version: int, new_version: int,
                   pid: int, manifest: dict, edge_id_fn=None) -> dict:
    """Cross-version partition reuse: copy a prior version's committed
    data files into the new version with the ``version`` column restamped
    (pure IO — no assembly, no extraction, no shuffle), then commit a
    manifest carrying the input fingerprint and counts forward plus
    ``linked_from_version`` for provenance. The caller has already
    verified the new version's input fingerprint for this partition
    equals ``manifest['input_fingerprint']`` under the same layout/config.

    Write order matches ``write_partition``: data first, manifest last
    (the commit point), so a crash mid-link leaves an uncommitted
    partition the rerun overwrites."""
    t0 = time.perf_counter()
    src = partition_dir(out_dir, prev_version, pid)
    dst = partition_dir(out_dir, new_version, pid)
    dst.mkdir(parents=True, exist_ok=True)
    for name in ("nodes.parquet", "edges.parquet", "convs.parquet"):
        df = pd.read_parquet(src / name)
        if "version" in df.columns:
            df["version"] = np.full(len(df), new_version,
                                    dtype=df["version"].dtype)
        if name == "edges.parquet" and edge_id_fn is not None and len(df):
            # edge ids embed the version (extract.edge_id_of), so a linked
            # partition re-mints them for the new version — a pure string
            # hash over already-extracted rows, still no re-extraction
            df["edge_id"] = [
                edge_id_fn(c, s, p, o) for c, s, p, o in
                zip(df["conv_id"], df["subj"], df["pred"], df["obj"])]
        df.to_parquet(dst / name, index=False)
    m = dict(manifest)
    m["version"] = new_version
    m["linked_from_version"] = prev_version
    m["wall_time_s"] = round(time.perf_counter() - t0, 4)
    mpath = manifest_path(out_dir, new_version, pid)
    mpath.parent.mkdir(parents=True, exist_ok=True)
    tmp = mpath.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(m))
    tmp.replace(mpath)
    return m


def uncommit_partition(out_dir: str, version: int, pid: int) -> None:
    """Invalidate a committed partition: delete the manifest FIRST (the
    commit point), then the data files — the inverse write order of
    ``write_partition``, so no crash window leaves data trusted without a
    matching manifest."""
    import shutil
    manifest_path(out_dir, version, pid).unlink(missing_ok=True)
    shutil.rmtree(partition_dir(out_dir, version, pid), ignore_errors=True)
