"""Partitioned parquet sink — the resumable output layout.

``ray.data.Dataset.write_parquet(partition_cols=...)`` splits EVERY block
by value, so a dataset of B blocks containing V partition values writes up
to B x V files — thousands of tiny fragments that re-read ~10x slower
(measured on this engine's testdata; see BASELINE.md). The fix is to
co-locate each partition value into one block FIRST: one hash exchange
keyed on the partition column, then the hive-style write emits ~1 file
per value directory.

The directory-per-value layout is what makes output resumable at 100 TB:
a re-run lists the finished ``col=value/`` directories and skips them
(the KG pipeline's manifest commit in ``pipelines/kg.py`` is the
transactional version of the same idea).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def write_partitioned_parquet(ds: rd.Dataset, path: str, *,
                              partition_col: str,
                              num_partitions: int | None = None) -> None:
    """Write ``ds`` under ``path`` as hive-partitioned parquet
    (``{path}/{partition_col}={value}/``), one exchange partition's worth
    of files per value instead of one per (block, value) pair.

    Scale note: partition-value cardinality should be bounded (languages,
    shards, dates, cluster ids). A near-unique column would create one
    directory per row — key the exchange on a bucket of it instead."""
    import pyarrow.compute as pc

    from .exchange import hash_exchange_dataset

    # the exchange hashes the key column's BINARY view, so stamp a string
    # form of the partition column (an int64/date column has no binary
    # cast; same idiom as bucketed_groupby's composite key)
    skey = "__pkey"

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(skey, pa.array([], pa.string()))
        return t.append_column(
            skey, pc.fill_null(pc.cast(t[partition_col], pa.string()), "None"))

    out = hash_exchange_dataset(ds.map_batches(stamp, batch_format="pyarrow"),
                                num_partitions,
                                lambda t: t.drop_columns([skey]),
                                key=skey)
    out.write_parquet(path, partition_cols=[partition_col])


def read_partitioned_parquet(path: str, *, partition_col: str,
                             values: list | None = None,
                             columns: list[str] | None = None) -> rd.Dataset:
    """Read a layout written by ``write_partitioned_parquet``. ``values``
    prunes at the directory level — only the named partitions' files are
    listed and scanned (the point of the layout: a 100-TB corpus read for
    one shard touches one directory). Hive partitioning turns the
    partition column into a STRING column on read (Ray 2.49 behavior);
    values are matched against their string form."""
    import os

    if values is None:
        return rd.read_parquet(path, columns=columns)
    if not values:
        raise ValueError("values=[] — pass None to read all partitions")
    pairs = [(os.path.join(path, f"{partition_col}={v}"), v) for v in values]
    missing = [v for d, v in pairs if not os.path.isdir(d)]
    if missing:
        # silent partial coverage is worse than an error in a resumable
        # layout: a typo'd or unfinished shard must be visible
        raise FileNotFoundError(
            f"partition directories missing under {path}: "
            f"{partition_col}={missing!r}")
    want_part_col = columns is None or partition_col in columns
    if columns is None:
        file_cols = None
    else:
        file_cols = [c for c in columns if c != partition_col]
        if not file_cols:
            # only the partition column was requested; parquet readers can't
            # project zero columns, so read the narrowest real column and
            # drop it in the final projection below
            import pyarrow.parquet as pq
            d0 = pairs[0][0]
            f0 = next(os.path.join(d0, f) for f in sorted(os.listdir(d0))
                      if f.endswith(".parquet"))
            file_cols = [pq.ParquetFile(f0).schema_arrow.names[0]]
    # a list of DIRECTORIES is not expanded by read_parquet in Ray 2.49 —
    # glob the files per directory. Explicit file paths usually still
    # hive-infer the partition column (as a STRING col), but stamp it from
    # the directory name if the reader dropped it, so round-trips keep
    # the schema either way.
    parts = []
    for d, v in pairs:
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        sub = rd.read_parquet(files, columns=file_cols)
        if want_part_col:
            def ensure(t: pa.Table, _v=str(v)) -> pa.Table:
                if partition_col in t.column_names:
                    return t
                return t.append_column(
                    partition_col, pa.array([_v] * t.num_rows, pa.string()))
            sub = sub.map_batches(ensure, batch_format="pyarrow")
        parts.append(sub)
    ds = parts[0]
    for sub in parts[1:]:
        ds = ds.union(sub)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def compact_parquet_dir(path: str, *, target_mb: int = 128,
                        out_path: str | None = None) -> dict:
    """Small-file compaction — the lake-maintenance pass that keeps a
    resumable layout readable. Many tiny fragments (one per task retry /
    micro-partition / incremental append) re-read ~10x slower than
    right-sized files; this rewrites ``path``'s parquet files into
    ~``target_mb``-sized ones.

    In place (default): writes to ``{path}.compact-tmp`` and swaps
    directories only after the rewritten row count matches. The swap is
    TWO renames, not one atomic op: a crash between them leaves ``path``
    absent with the intact original at ``{path}.compact-old`` — recovery
    is ``mv {path}.compact-old {path}``. Any non-parquet sidecar files
    (manifests, _SUCCESS markers) are copied into the rewrite before the
    swap so they survive; subdirectories (nested Hive partitions) are
    refused — compact each leaf value directory instead. Returns
    ``{files_before, files_after, rows, bytes}``.

    Hive-partitioned layouts: run per value directory (the caller loops
    ``col=value/`` dirs) so partition pruning survives compaction."""
    import os
    import shutil

    entries = sorted(os.listdir(path))
    subdirs = [f for f in entries if os.path.isdir(os.path.join(path, f))]
    if subdirs:
        raise ValueError(
            f"compact_parquet_dir: {path} contains subdirectories "
            f"{subdirs[:3]} — compact each leaf partition directory")
    sidecars = [f for f in entries if not f.endswith(".parquet")]
    files = [os.path.join(path, f) for f in entries
             if f.endswith(".parquet")]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / (target_mb * 1024 * 1024)))

    ds = rd.read_parquet(files)
    rows_before = ds.count()
    tmp = (out_path or path) + ".compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(n_out).write_parquet(tmp)

    for f in sidecars:                 # manifests etc. survive the swap
        shutil.copy2(os.path.join(path, f), os.path.join(tmp, f))
    rows_after = rd.read_parquet(
        [os.path.join(tmp, f) for f in os.listdir(tmp)
         if f.endswith(".parquet")]).count()
    if rows_after != rows_before:      # never swap a bad rewrite in
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}")
    dest = out_path or path
    if out_path is None:
        old = path + ".compact-old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        shutil.rmtree(dest, ignore_errors=True)
        os.rename(tmp, dest)
    n_after = len([f for f in os.listdir(dest)
                   if f.endswith(".parquet")])
    return {"files_before": len(files), "files_after": n_after,
            "rows": rows_before, "bytes": total_bytes}
