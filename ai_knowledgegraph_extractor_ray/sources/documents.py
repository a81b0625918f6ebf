"""Raw-document ingestion: the reference's format-dispatch text extraction
(S1–S6, services.py:20-62) as a Ray Data source stage.

``read_raw_documents(dir)`` reads files with ``read_binary_files`` and
extracts text per extension inside ``map_batches``:

* ``.txt``  — utf-8 decode + strip                    (services.py:50-53)
* ``.csv``  — CSV *flattened to prose*: each row's cells joined with
  ", ", rows joined with "\n" — the reference feeds CSV to the same
  entity extractor as prose (services.py:55-62; the seed doc3 golden
  graph is CEO/HQ edges extracted from CSV-as-text)
* ``.pdf`` — PyPDF2 when importable, else a pure-stdlib extractor for
  simple PDFs (Flate/raw content streams, Tj/TJ literal strings); a PDF
  neither path can read is emitted with ``error="decode_error"`` rather
  than failing the batch
* ``.docx`` — python-docx when importable, else a pure-stdlib
  zipfile+ElementTree extractor mirroring python-docx's paragraph join

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


_PDF_TEXT_OPS = None  # compiled lazily (regexes used only on the pdf path)


def _basic_pdf_text(data: bytes) -> str:
    """Minimal pure-stdlib PDF text extraction for SIMPLE PDFs: inflates
    FlateDecode (or raw) content streams with zlib and collects the literal
    strings shown by Tj / ' / " / TJ operators, one line per text-showing
    operation. Not a full PDF renderer — no font CMaps, hex strings, or
    cross-reference validation — but it makes the ``.pdf`` route real for
    the plain-text PDFs the reference's upload flow typically sees, instead
    of error-routing every PDF when PyPDF2 is absent."""
    global _PDF_TEXT_OPS
    import re
    import zlib
    if _PDF_TEXT_OPS is None:
        _PDF_TEXT_OPS = (
            re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL),
            # literal string followed by a text-showing operator
            re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")"),
            re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ", re.DOTALL),
            re.compile(rb"\(((?:[^()\\]|\\.)*)\)"),
        )
    stream_re, tj_re, tj_arr_re, lit_re = _PDF_TEXT_OPS

    def unescape(b: bytes) -> str:
        # single left-to-right pass (sequential .replace() decoded an
        # escaped backslash's FOLLOWING char: "\\\\n" became "\\" + LF —
        # ADVICE round 2); octal escapes \ddd handled per PDF spec 7.3.4.2
        out = bytearray()
        i, n = 0, len(b)
        simple = {0x28: b"(", 0x29: b")", 0x5C: b"\\", 0x6E: b"\n",
                  0x74: b"\t", 0x72: b"\r", 0x62: b"\b", 0x66: b"\f"}
        while i < n:
            c = b[i]
            if c != 0x5C or i + 1 >= n:         # not a backslash escape
                out.append(c)
                i += 1
                continue
            nxt = b[i + 1]
            if nxt in simple:
                out += simple[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:           # \d, \dd or \ddd octal
                j = i + 1
                while j < min(i + 4, n) and 0x30 <= b[j] <= 0x37:
                    j += 1
                out.append(int(b[i + 1:j], 8) & 0xFF)
                i = j
            else:                               # unknown escape: drop the \
                out.append(nxt)
                i += 2
        return out.decode("latin-1")

    lines: list[str] = []
    for m in stream_re.finditer(data):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw              # uncompressed content stream
        for tm in tj_re.finditer(content):
            lines.append(unescape(tm.group(1)))
        for am in tj_arr_re.finditer(content):
            # TJ arrays interleave strings with kerning numbers
            lines.append("".join(unescape(s.group(1))
                                 for s in lit_re.finditer(am.group(1))))
    if not lines:
        raise ValueError("no extractable text")
    return "\n".join(lines).strip()


def _pdf_to_text(data: bytes) -> str:
    try:
        import PyPDF2
    except ImportError:
        return _basic_pdf_text(data)
    reader = PyPDF2.PdfReader(io.BytesIO(data))
    return "\n".join((page.extract_text() or "") for page in reader.pages).strip()


_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _basic_docx_text(data: bytes) -> str:
    """Pure-stdlib DOCX text extraction (zipfile + ElementTree), mirroring
    python-docx's ``"\\n".join(p.text for p in d.paragraphs)``: body-level
    ``w:p`` paragraphs in document order, each the concatenation of its
    ``w:t`` runs with ``w:tab``/``w:br``/``w:cr`` as tab/newline."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(f"{_DOCX_NS}body")
    if body is None:
        return ""
    paras = []
    for p in body.findall(f"{_DOCX_NS}p"):
        parts = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{_DOCX_NS}t":
                parts.append(el.text or "")
            elif tag == f"{_DOCX_NS}tab":
                parts.append("\t")
            elif tag in (f"{_DOCX_NS}br", f"{_DOCX_NS}cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras).strip()


def _docx_to_text(data: bytes) -> str:
    try:
        import docx
    except ImportError:
        return _basic_docx_text(data)
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


def read_documents_jsonl(path: str, *, text_field: str = "text",
                         id_field: str = "id") -> rd.Dataset:
    """JSONL corpus source (the common crawl-dump/dataset-dump interchange
    format): one JSON object per line -> (path, ext, text, error) rows with
    the same shape as ``read_raw_documents``, so everything downstream
    (validation, transcripts derivation, the KG job) is format-agnostic.
    ``ray.data.read_json`` handles .jsonl/.json and gzip transparently;
    records missing ``text_field`` become error rows, never exceptions.
    The doc identity is ``<file>#<id_field>`` when present, else the
    file path (single-doc files)."""
    ds = rd.read_json(path, include_paths=True)

    def fn(t: pa.Table) -> pa.Table:
        names = t.column_names
        paths = (t["path"].to_pylist() if "path" in names
                 else [""] * t.num_rows)
        texts_in = (t[text_field].to_pylist() if text_field in names
                    else [None] * t.num_rows)
        ids_in = (t[id_field].to_pylist() if id_field in names
                  else [None] * t.num_rows)
        out_paths, texts, errors = [], [], []
        for p, s, i in zip(paths, texts_in, ids_in):
            out_paths.append(f"{p}#{i}" if i is not None else p)
            if isinstance(s, str) and s.strip():
                texts.append(s.strip())
                errors.append("")
            else:
                texts.append("")
                errors.append("missing_text_field")
        return pa.table({
            "path": pa.array(out_paths, pa.string()),
            "ext": pa.array([".jsonl"] * t.num_rows, pa.string()),
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


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
