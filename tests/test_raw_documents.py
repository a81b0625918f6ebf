"""Raw-document ingestion (reference S1-S6 format dispatch) and latest-
version graph lookup."""

import pyarrow.parquet as pq
import pytest

from ai_knowledgegraph_extractor_ray.config import KGConfig
from ai_knowledgegraph_extractor_ray.pipelines import kg
from ai_knowledgegraph_extractor_ray.sources import documents as rawdocs
from ai_knowledgegraph_extractor_ray.sources import transcripts as src

CSV = b"name,role,company\nJohn Doe,CEO,Acme Corporation\nJane Smith,CTO,Globex\n"
TXT = b"  Sarah Johnson works at Initech Systems in Austin.  \n"


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_bytes(TXT)
    (d / "b.csv").write_bytes(CSV)
    (d / "c.pdf").write_bytes(b"%PDF-1.4 fake")
    (d / "d.xyz").write_bytes(b"???")
    return str(d)


def test_extract_text_dispatch():
    assert rawdocs.extract_text("x.txt", TXT) == (
        ".txt", "Sarah Johnson works at Initech Systems in Austin.", "")
    ext, text, err = rawdocs.extract_text("x.csv", CSV)
    # CSV flattened to prose: cells joined ", ", rows joined newline
    assert text.splitlines() == [
        "name, role, company",
        "John Doe, CEO, Acme Corporation",
        "Jane Smith, CTO, Globex",
    ]
    assert err == ""
    # blank CSV rows become empty lines, row-for-row (reference
    # services.py:55-62 appends "" for them; ADVICE round-1 fix)
    blank = b"a,b\n\nc,d\n"
    assert rawdocs.extract_text("x.csv", blank)[1].splitlines() == [
        "a, b", "", "c, d"]
    assert rawdocs.extract_text("x.pdf", b"junk")[2] == "codec_unavailable"
    assert rawdocs.extract_text("x.weird", b"junk")[2] == "unsupported_extension"


def test_read_raw_documents(doc_dir):
    df = rawdocs.read_raw_documents(doc_dir).to_pandas()
    by_ext = df.set_index("ext")
    assert "Sarah Johnson" in by_ext.loc[".txt", "text"]
    assert "John Doe, CEO" in by_ext.loc[".csv", "text"]
    assert by_ext.loc[".pdf", "error"] == "codec_unavailable"
    assert by_ext.loc[".xyz", "error"] == "unsupported_extension"


def test_documents_to_kg_pipeline(doc_dir, tmp_path):
    """Raw files -> transcripts -> KG job: the reference upload flow."""
    ts = rawdocs.documents_as_transcripts(rawdocs.read_raw_documents(doc_dir))
    cfg = KGConfig(num_partitions=2, extract_concurrency=1)
    out = str(tmp_path / "out")
    summary = kg.run_kg_job(ts, cfg, out, resume=False)
    assert summary["n_conversations"] == 2        # txt + csv decoded
    nodes = kg.read_nodes(out, 1).to_pandas()
    # the works_at sentence produced its entities
    assert "Sarah Johnson" in set(nodes["label"])
    # CSV-as-text entities extracted too (reference seed doc3 semantics)
    assert "John Doe" in set(nodes["label"])


def test_latest_version_lookup(tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(src.synthetic_transcripts_table(n_convs=6, seed=2), p)
    out = str(tmp_path / "out")
    for version, cutoff in ((1, 1), (2, None)):
        cfg = KGConfig(num_partitions=2, version=version, version_cutoff=cutoff,
                       extract_concurrency=1)
        kg.run_kg_job(src.read_transcripts(str(p)), cfg, out, resume=False)
    latest = kg.get_conversation_graph(out, None, "conv_00000001", 2)
    explicit = kg.get_conversation_graph(out, 2, "conv_00000001", 2)
    assert latest == explicit and latest["version"] == 2
