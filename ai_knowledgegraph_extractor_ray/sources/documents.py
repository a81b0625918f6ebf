"""Raw-document ingestion: the reference's format-dispatch text extraction
(S1–S6, services.py:20-62) as a Ray Data source stage.

``read_raw_documents(dir)`` reads files with ``read_binary_files`` and
extracts text per extension inside ``map_batches``:

* ``.txt``  — utf-8 decode + strip                    (services.py:50-53)
* ``.csv``  — CSV *flattened to prose*: each row's cells joined with
  ", ", rows joined with "\n" — the reference feeds CSV to the same
  entity extractor as prose (services.py:55-62; the seed doc3 golden
  graph is CEO/HQ edges extracted from CSV-as-text)
* ``.pdf`` / ``.docx`` — real decoders when PyPDF2 / python-docx are
  importable (they are not in this container); otherwise the row is
  emitted with ``error="codec_unavailable"`` rather than failing the
  batch — the dispatch seam, schema and error routing are the real
  production shape.

Output schema: (path, ext, text, error) — feed ``text`` to the KG
pipeline as single-turn conversations or to the corpus operators.
"""

from __future__ import annotations

import csv
import io
import os

import pyarrow as pa
import ray.data as rd


def _txt_to_text(data: bytes) -> str:
    return data.decode("utf-8", errors="replace").strip()


def _csv_to_text(data: bytes) -> str:
    rows = csv.reader(io.StringIO(data.decode("utf-8", errors="replace")))
    # Row-for-row join, empty rows included — matches the reference
    # (services.py:55-62), which appends an empty line for blank CSV rows.
    return "\n".join(", ".join(cell for cell in row) for row in rows)


def _pdf_to_text(data: bytes) -> str:
    try:
        import PyPDF2  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("codec_unavailable") from e
    reader = PyPDF2.PdfReader(io.BytesIO(data))
    return "\n".join((page.extract_text() or "") for page in reader.pages).strip()


def _docx_to_text(data: bytes) -> str:
    try:
        import docx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("codec_unavailable") from e
    d = docx.Document(io.BytesIO(data))
    return "\n".join(p.text for p in d.paragraphs).strip()


_DISPATCH = {
    ".txt": _txt_to_text,
    ".csv": _csv_to_text,
    ".pdf": _pdf_to_text,
    ".docx": _docx_to_text,
}

SUPPORTED_EXTENSIONS = tuple(_DISPATCH)


def extract_text(path: str, data: bytes) -> tuple[str, str, str]:
    """(ext, text, error) for one document. Unsupported extension or missing
    codec -> empty text + error tag (never an exception)."""
    ext = os.path.splitext(path)[1].lower()
    fn = _DISPATCH.get(ext)
    if fn is None:
        return ext, "", "unsupported_extension"
    try:
        return ext, fn(data), ""
    except NotImplementedError:
        return ext, "", "codec_unavailable"
    except Exception:  # noqa: BLE001 — corrupt file must not fail the batch
        return ext, "", "decode_error"


def read_raw_documents(path: str) -> rd.Dataset:
    """Directory/file of raw documents -> (path, ext, text, error) Dataset."""
    ds = rd.read_binary_files(path, include_paths=True)

    def fn(t: pa.Table) -> pa.Table:
        exts, texts, errors = [], [], []
        for p, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            ext, text, err = extract_text(p, data)
            exts.append(ext)
            texts.append(text)
            errors.append(err)
        return pa.table({
            "path": t["path"],
            "ext": pa.array(exts, pa.string()),
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def documents_as_transcripts(docs: rd.Dataset) -> rd.Dataset:
    """Each extracted document becomes a one-conversation transcript whose
    turns are the text's lines (the reference's append-with-newline
    semantics in reverse, main.py:235) — ready for the KG pipeline."""
    from ..schemas import TRANSCRIPTS
    from .transcripts import EPOCH_US

    def fn(t: pa.Table) -> pa.Table:
        conv_ids, idxs, roles, texts, tools, tss = [], [], [], [], [], []
        for path, text, err in zip(t["path"].to_pylist(), t["text"].to_pylist(),
                                   t["error"].to_pylist()):
            if err or not text:
                continue
            for i, line in enumerate(text.split("\n")):
                conv_ids.append(path)
                idxs.append(i)
                roles.append("user")
                texts.append(line)
                tools.append("")
                tss.append(EPOCH_US + i)
        import numpy as np
        return pa.Table.from_arrays(
            [pa.array(conv_ids, pa.string()), pa.array(idxs, pa.int32()),
             pa.array(roles, pa.string()), pa.array(texts, pa.string()),
             pa.array(tools, pa.string()),
             pa.array(np.array(tss, dtype="int64")).cast(pa.timestamp("us"))],
            schema=TRANSCRIPTS)

    return docs.map_batches(fn, batch_format="pyarrow")
