"""DB-export sink: materialize the lake's graph tables into the
reference's relational schema so a user migrating off the reference can
point their existing SQL readers at engine output unchanged.

Table shapes mirror the reference exactly (reference: models.py:7-92 —
``documents / versions / nodes / edges`` with the same column names and
indexes; the reference's own persistence path is
database_service.py:35-173). The engine's "document" is a conversation:
``conv_id`` becomes ``documents.filename``/``file_path``, lake
``version=K`` becomes a ``versions`` row per (document, K).

Scale stance: this sink is the MIGRATION/INTEROP path, not the 100-TB
path — a single SQLite/DB file is inherently one machine's object. The
export still STREAMS: graph rows flow through ``iter_batches`` with
batched ``executemany`` inserts, so driver memory holds one batch plus
the document-id map (one small entry per conversation — the same
cardinality the reference keeps as a ``documents`` table). For corpora
whose conversation count itself outgrows one machine, export per
partition range into shards instead.
"""

from __future__ import annotations

import sqlite3

import pandas as pd

_DDL = """
CREATE TABLE IF NOT EXISTS documents (
    id INTEGER PRIMARY KEY,
    filename VARCHAR(255) NOT NULL,
    file_type VARCHAR(50) NOT NULL,
    file_path VARCHAR(500) NOT NULL UNIQUE,
    upload_date DATETIME,
    text_content TEXT
);
CREATE INDEX IF NOT EXISTS idx_document_upload_date ON documents (upload_date);
CREATE INDEX IF NOT EXISTS idx_document_file_type ON documents (file_type);

CREATE TABLE IF NOT EXISTS versions (
    id INTEGER PRIMARY KEY,
    document_id INTEGER NOT NULL REFERENCES documents(id) ON DELETE CASCADE,
    version_number INTEGER NOT NULL,
    created_at DATETIME
);
CREATE INDEX IF NOT EXISTS idx_version_document_id ON versions (document_id);
CREATE INDEX IF NOT EXISTS idx_version_created_at ON versions (created_at);

CREATE TABLE IF NOT EXISTS nodes (
    id INTEGER PRIMARY KEY,
    document_id INTEGER NOT NULL REFERENCES documents(id) ON DELETE CASCADE,
    version_id INTEGER NOT NULL REFERENCES versions(id) ON DELETE CASCADE,
    node_id VARCHAR(50) NOT NULL,
    label VARCHAR(255) NOT NULL,
    node_type VARCHAR(100) NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_node_document_id ON nodes (document_id);
CREATE INDEX IF NOT EXISTS idx_node_version_id ON nodes (version_id);
CREATE INDEX IF NOT EXISTS idx_node_type ON nodes (node_type);

CREATE TABLE IF NOT EXISTS edges (
    id INTEGER PRIMARY KEY,
    document_id INTEGER NOT NULL REFERENCES documents(id) ON DELETE CASCADE,
    version_id INTEGER NOT NULL REFERENCES versions(id) ON DELETE CASCADE,
    source_node_id VARCHAR(50) NOT NULL,
    target_node_id VARCHAR(50) NOT NULL,
    relationship_type VARCHAR(100) NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_edge_document_id ON edges (document_id);
CREATE INDEX IF NOT EXISTS idx_edge_version_id ON edges (version_id);
CREATE INDEX IF NOT EXISTS idx_edge_source ON edges (source_node_id);
CREATE INDEX IF NOT EXISTS idx_edge_target ON edges (target_node_id);
CREATE INDEX IF NOT EXISTS idx_edge_relationship ON edges (relationship_type);
"""


def export_sqlite(out_dir: str, versions: list[int], db_path: str, *,
                  batch_rows: int = 50_000) -> dict:
    """Export committed lake versions into a reference-schema SQLite DB.

    Document ids are assigned in sorted-``conv_id`` order (deterministic
    across runs); version ids in (document, version_number) order. A
    ``versions`` row is created ONLY for (document, version) pairs whose
    conversation actually appears in that lake version — a phantom row
    for a document absent from the newest version would hijack the
    reference's latest-version read into an empty graph. Refuses a
    ``db_path`` that already holds export tables (ids start at 1, so a
    second export would collide mid-write). Returns counts per table."""
    from ..pipelines import kg

    con = sqlite3.connect(db_path)
    try:
        existing = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        clash = existing & {"documents", "versions", "nodes", "edges"}
        if clash:
            raise ValueError(
                f"export_sqlite: {db_path} already contains export "
                f"tables {sorted(clash)}; export to a fresh file "
                "(ids are assigned from 1 and would collide)")
        con.executescript(_DDL)

        # membership is computed lake-side PER VERSION (convs.parquet is
        # the slimmest table); documents = the union vocabulary
        convs_by_v: dict[int, set[str]] = {}
        for v in versions:
            part = kg.read_convs(out_dir, v, columns=["conv_id"])
            s: set[str] = set()
            for b in part.iter_batches(batch_size=batch_rows,
                                       batch_format="pandas"):
                s.update(b["conv_id"].astype(str))
            convs_by_v[v] = s
        convs = set().union(*convs_by_v.values()) if convs_by_v else set()
        doc_id = {c: i + 1 for i, c in enumerate(sorted(convs))}
        con.executemany(
            "INSERT INTO documents (id, filename, file_type, file_path) "
            "VALUES (?, ?, 'txt', ?)",
            [(i, c, c) for c, i in doc_id.items()])

        # versions: one row per (document, lake version) THE DOCUMENT
        # APPEARS IN
        ver_id: dict[tuple[int, int], int] = {}
        rows = []
        for v in sorted(versions):
            for c in sorted(convs_by_v[v]):
                vid = len(ver_id) + 1
                ver_id[(doc_id[c], v)] = vid
                rows.append((vid, doc_id[c], v))
        con.executemany(
            "INSERT INTO versions (id, document_id, version_number) "
            "VALUES (?, ?, ?)", rows)

        n_nodes = n_edges = 0
        for v in sorted(versions):
            for b in kg.read_nodes(out_dir, v).iter_batches(
                    batch_size=batch_rows, batch_format="pandas"):
                recs = _stamp(b, doc_id, ver_id, v)
                con.executemany(
                    "INSERT INTO nodes (document_id, version_id, node_id, "
                    "label, node_type) VALUES (?, ?, ?, ?, ?)",
                    list(zip(recs["document_id"], recs["version_id"],
                             b["node_id"], b["label"], b["node_type"])))
                n_nodes += len(b)
            for b in kg.read_edges(out_dir, v).iter_batches(
                    batch_size=batch_rows, batch_format="pandas"):
                recs = _stamp(b, doc_id, ver_id, v)
                con.executemany(
                    "INSERT INTO edges (document_id, version_id, "
                    "source_node_id, target_node_id, relationship_type) "
                    "VALUES (?, ?, ?, ?, ?)",
                    list(zip(recs["document_id"], recs["version_id"],
                             b["src_node_id"], b["dst_node_id"], b["pred"])))
                n_edges += len(b)
        con.commit()
        return {"documents": len(doc_id), "versions": len(ver_id),
                "nodes": n_nodes, "edges": n_edges, "db_path": db_path}
    finally:
        con.close()


def _stamp(b: pd.DataFrame, doc_id: dict, ver_id: dict,
           version: int) -> dict:
    docs = [doc_id[str(c)] for c in b["conv_id"]]
    return {"document_id": docs,
            "version_id": [ver_id[(d, version)] for d in docs]}


def get_document_graph(db_path: str, filename: str,
                       version_number: int | None = None) -> dict:
    """The reference's read shape (database_service.py:175-230) against
    an exported DB: latest (or given) version's nodes+edges of one
    document, as the universal graph dict."""
    con = sqlite3.connect(db_path)
    try:
        doc = con.execute("SELECT id FROM documents WHERE filename = ?",
                          (filename,)).fetchone()
        if not doc:
            raise ValueError(f"Document {filename} not found")
        did = doc[0]
        if version_number is None:
            ver = con.execute(
                "SELECT id FROM versions WHERE document_id = ? "
                "ORDER BY version_number DESC LIMIT 1", (did,)).fetchone()
        else:
            ver = con.execute(
                "SELECT id FROM versions WHERE document_id = ? "
                "AND version_number = ?", (did, version_number)).fetchone()
        if not ver:
            raise ValueError(f"No version found for document {filename}")
        vid = ver[0]
        nodes = con.execute(
            "SELECT node_id, label, node_type FROM nodes "
            "WHERE document_id = ? AND version_id = ?", (did, vid)).fetchall()
        edges = con.execute(
            "SELECT source_node_id, target_node_id, relationship_type "
            "FROM edges WHERE document_id = ? AND version_id = ?",
            (did, vid)).fetchall()
        return {
            "nodes": [{"id": n[0], "label": n[1], "type": n[2]}
                      for n in nodes],
            "edges": [{"source": e[0], "target": e[1], "relationship": e[2]}
                      for e in edges]}
    finally:
        con.close()
