"""Corpus operators: text analysis, dedup family, similarity search,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from ai_knowledgegraph_extractor_ray.ops import dedup, multimodal, similarity, text


def docs_ds(texts, ids=None):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(ids if ids is not None else range(len(texts)),
                            dtype="int64"),
        "text": pd.Series(texts, dtype="string"),
    }))


# --- text analysis -----------------------------------------------------------

def test_token_stats():
    out = text.token_stats(docs_ds(["one two three!", "", "a b"])).to_pandas()
    out = out.sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 0, 2]
    assert out["n_chars"].tolist() == [14, 0, 3]
    assert out["n_punct"].tolist() == [1, 0, 0]
    assert out["n_bpe_tokens"].tolist() == [4, 0, 2]


def test_redact_pii():
    out = text.redact_pii(docs_ds([
        "mail bob.smith+x@corp.example.org and alice@ex.io now",
        "host 192.168.0.1 ssn 123-45-6789 tel +1-555-0199100",
        "clean text, nothing to scrub",
        None,
    ])).to_pandas().sort_values("doc_id")
    assert out["text_redacted"].tolist() == [
        "mail [EMAIL] and [EMAIL] now",
        "host [IP] ssn [SSN] tel [PHONE]",
        "clean text, nothing to scrub",
        "",
    ]
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 1, 0, 0]
    # ordering pins disjoint counts: the SSN is NOT also counted as a phone
    assert out["n_ssn"].tolist() == [0, 1, 0, 0]
    assert out["n_phone"].tolist() == [0, 1, 0, 0]
    assert str(out["n_email"].dtype) == "int64"


def test_quality_score_orders_sensibly():
    junk = "!!! ??? ### $$$ %%%"
    prose = ("the quick brown fox jumps over the lazy dog and runs to the "
             "river where the water is cold and the sun is warm " * 3)
    out = text.quality_score(docs_ds([junk, prose])).to_pandas().sort_values("doc_id")
    assert out["quality"].iloc[1] > out["quality"].iloc[0]


def test_lang_id():
    out = text.lang_id(docs_ds([
        "the cat is in the house and the dog is on the mat",
        "le chat est dans la maison et le chien est dans le jardin",
        "der hund ist nicht in der küche und das haus ist alt",
        "xyzzy qwerty",
    ])).to_pandas().sort_values("doc_id")
    assert out["lang_guess"].tolist() == ["en", "fr", "de", "und"]


def test_fingerprint_stability_and_sensitivity():
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "completely different content about databases and distributed systems"
    out = text.fingerprint(docs_ds([a, a, b])).to_pandas().sort_values("doc_id")
    fps = out["fp"].tolist()
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


# --- dedup -------------------------------------------------------------------

def test_exact_dedup_keeps_min_id():
    ds = docs_ds(["aaa", "bbb", "aaa", "ccc", "bbb"], ids=[5, 1, 2, 9, 7])
    out = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2, 9]


def test_duplicate_groups():
    ds = docs_ds(["aaa", "bbb", "aaa", "aaa"], ids=[3, 1, 0, 2])
    out = dedup.duplicate_groups(ds).to_pandas()
    assert len(out) == 1
    assert int(out.iloc[0]["n_copies"]) == 3
    assert int(out.iloc[0]["keep_id"]) == 0


BASE = ("spark stream batch merge join filter sort window group key value "
        "row column table scan hash agg part small big fast slow data line "
        "query order customer vector dup")


def test_minhash_near_pairs_and_dedup():
    near = BASE.replace("customer", "client")           # 1-token edit
    far = " ".join(reversed(BASE.split()))              # same vocab, diff ngrams
    ds = docs_ds([BASE, near, far], ids=[0, 1, 2])
    pairs = dedup.minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    assert (0, 1) in set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 2) not in set(zip(pairs["id_a"], pairs["id_b"]))

    kept = dedup.near_dedup_minhash(ds, threshold=0.5).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2]


def test_ngram_jaccard_pairs():
    """Bigram shingles at j>=0.4 pair up a heavier edit than the trigram
    threshold tolerates, and the emitted jaccard is the exact value."""
    near = BASE.replace("customer", "client").replace("orders", "sales")
    far = "utterly different words entirely here today"
    ds = docs_ds([BASE, near, far], ids=[0, 1, 2])
    pairs = dedup.ngram_jaccard_pairs(ds, threshold=0.4, ngram=2).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert (0, 1) in got and (0, 2) not in got
    from ai_knowledgegraph_extractor_ray.ops.dedup import jaccard_of, word_ngrams
    assert got[(0, 1)] == jaccard_of(word_ngrams(BASE, 2),
                                     word_ngrams(near, 2))


def test_simhash_pairs():
    near = BASE.replace("customer", "client")
    ds = docs_ds([BASE, near, "utterly different words entirely here"],
                 ids=[0, 1, 2])
    pairs = dedup.simhash_near_pairs(ds, max_hamming=6).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got


def test_embedding_near_pairs():
    rng = np.random.RandomState(3)
    base = rng.standard_normal(32).astype(np.float32)
    rows = [base, base + 0.01 * rng.standard_normal(32).astype(np.float32),
            rng.standard_normal(32).astype(np.float32)]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([0, 1, 2], dtype="int64"),
        "embedding": [r.tolist() for r in rows],
    }))
    pairs = dedup.embedding_near_pairs(ds, threshold=0.95).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got and (0, 2) not in got


def test_embedding_near_pairs_planted_recall():
    """Banded SRP-LSH recall pin: 400 base vectors + 60 planted near-dups
    (cos ~0.97); all planted pairs found, no random pair passes the exact
    cosine verify."""
    rng = np.random.RandomState(17)
    n, d, p = 400, 32, 60
    base = rng.standard_normal((n, d)).astype(np.float32)
    planted = base[:p] + 0.12 * rng.standard_normal((p, d)).astype(np.float32)
    allv = np.vstack([base, planted])
    unit = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    cos = (unit[:p] * unit[n:n + p]).sum(axis=1)
    truth = {(i, n + i) for i in range(p) if cos[i] >= 0.9}
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n + p, dtype=np.int64),
        "embedding": [v.tolist() for v in allv]}))
    pairs = dedup.embedding_near_pairs(ds, threshold=0.9).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert truth and got >= truth        # full recall on planted pairs
    assert got - truth == set()          # exact verify: no random extras


# --- similarity --------------------------------------------------------------

@pytest.fixture(scope="module")
def vec_corpus():
    rng = np.random.RandomState(11)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series(range(200), dtype="int64"),
        "embedding": [r.tolist() for r in m],
    })).repartition(4)
    return ds, m


def test_knn_brute_force_exact(vec_corpus):
    ds, m = vec_corpus
    q = m[[5, 17]]
    out = similarity.knn_brute_force(ds, q, k=5).to_pandas()
    for qi, row in ((0, 5), (1, 17)):
        top = out[(out["query_id"] == qi) & (out["rank"] == 0)]
        assert int(top["vec_id"].iloc[0]) == row          # self is nearest
        assert top["score"].iloc[0] == pytest.approx(1.0, abs=1e-5)
    # verify full top-5 against numpy for query 0
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = unit @ unit[5]
    want = list(np.argsort(-sims)[:5])
    got = out[out["query_id"] == 0].sort_values("rank")["vec_id"].tolist()
    assert got == want


def test_ivf_recall_at_least_half(vec_corpus):
    ds, m = vec_corpus
    idx = similarity.IVFIndex.build(ds, n_clusters=8, id_col="vec_id")
    q = m[[3, 50, 99]]
    approx = idx.search(q, k=5, nprobe=3).to_pandas()
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    recalls = []
    for qi in range(3):
        want = set(np.argsort(-(unit @ unit[[3, 50, 99][qi]]))[:5])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(want & got) / 5)
    assert np.mean(recalls) >= 0.5
    # self must always be found (its bucket is probed first)
    for qi, self_id in ((0, 3), (1, 50), (2, 99)):
        top = approx[(approx["query_id"] == qi) & (approx["rank"] == 0)]
        assert int(top["vec_id"].iloc[0]) == self_id


# --- multimodal --------------------------------------------------------------

def test_media_plumbing_decode_and_frames():
    media = multimodal.synthetic_media(n_items=24)
    decoded = multimodal.decode_images(media, concurrency=1).to_pandas()
    imgs = decoded[decoded["decoded"]]
    assert len(imgs) == 8                     # every 3rd item is an image
    assert all(len(f) == 8 * 8 * 3 for f in imgs["features"])

    frames = multimodal.sample_frames(media, stride=10, concurrency=1).to_pandas()
    vids = set(frames["item_id"])
    assert vids and all(i % 3 == 2 for i in vids)
    assert all(len(f) == 3 for f in frames["frame_feature"])


def test_decoder_fake_gate():
    dec = multimodal.ImageDecoder(fake_ok=False)
    if dec._pil is None:
        with pytest.raises(NotImplementedError):
            dec._decode(b"xx", 4, 4)


def test_png_roundtrip_and_filters():
    """Real stdlib PNG codec: encode->decode is exact; all five scanline
    filter types reconstruct correctly."""
    import zlib as _z
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (multimodal.decode_png(multimodal.encode_png(px)) == px).all()

    # hand-build a PNG whose 5 scanlines use filters 0..4
    h, w, ch = 5, 4, 3
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int16)
        enc = np.empty_like(line)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, payload):
        return (len(payload).to_bytes(4, "big") + typ + payload
                + (_z.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    data = (multimodal.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert (multimodal.decode_png(data) == img).all()


def test_wav_roundtrip():
    rng = np.random.RandomState(9)
    pcm = (rng.standard_normal(8000) * 0.25).astype(np.float32)
    out, sr = multimodal.decode_wav(multimodal.encode_wav(pcm, 16000))
    assert sr == 16000 and len(out) == 8000
    assert np.abs(out - np.clip(pcm, -1, 1)).max() < 1e-3   # 16-bit quant


def test_real_payload_pipeline_no_fakes():
    """PNG/WAV payloads decode through the actor stages with fake_ok=False —
    the real codec path, not the deterministic fake."""
    media = multimodal.synthetic_media(n_items=12, real_payloads=True)
    decoded = multimodal.decode_images(media, concurrency=1,
                                       fake_ok=False).to_pandas()
    assert decoded["decoded"].sum() == 4      # every 3rd item is an image
    audio = multimodal.featurize_audio(media, concurrency=1,
                                       fake_ok=False).to_pandas()
    assert len(audio) == 4
    assert audio["duration_s"].between(0.99, 1.01).all()    # real 1 s wavs


def test_decode_deterministic():
    media = multimodal.synthetic_media(n_items=6)
    a = multimodal.decode_images(media, concurrency=1).to_pandas()
    b = multimodal.decode_images(multimodal.synthetic_media(n_items=6),
                                 concurrency=1).to_pandas()
    fa = [list(map(float, f)) for f in a[a["decoded"]].sort_values("item_id")["features"]]
    fb = [list(map(float, f)) for f in b[b["decoded"]].sort_values("item_id")["features"]]
    assert fa == fb


# --- distributed connected components ----------------------------------------

def _uf_reference(pairs):
    parent = {}
    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x]); x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for p in pairs for x in p}
    return {n: find(n) for n in nodes}


def test_connected_components_matches_union_find():
    """One compact graph exercising a 6-node chain (pointer-jump path), a
    triangle, an isolated pair, and label-chain resolution; verified against
    a reference union-find. (Kept small: each propagation round is a
    multi-shuffle Ray plan — correctness, not throughput, is under test; the
    4-CPU pytest session pays ~2-3s of fixed plan latency per round.)"""
    from ai_knowledgegraph_extractor_ray.ops.cc import connected_components
    pairs = ([(i, i + 1) for i in range(10, 16)]      # chain 10..16
             + [(0, 1), (1, 2), (0, 2)]               # triangle
             + [(30, 41)]                             # pair
             + [(16, 2)])                             # merges chain+triangle
    want = _uf_reference(pairs)
    ds = rd.from_pandas(pd.DataFrame(
        {"id_a": [a for a, _ in pairs], "id_b": [b for _, b in pairs]}))
    got = connected_components(ds).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["component"].astype(int)))
    assert got_map == want


def test_near_dedup_distributed_equals_driver():
    near = BASE.replace("customer", "client")
    far = " ".join(reversed(BASE.split()))
    ds = docs_ds([BASE, near, far, BASE + " tail"], ids=[0, 1, 2, 3])
    a = dedup.near_dedup_minhash(ds, threshold=0.5).to_pandas()
    b = dedup.near_dedup_minhash(ds, threshold=0.5,
                                 cluster_mode="distributed").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


# --- composed corpus-cleaning pipeline ----------------------------------------

def test_clean_corpus_pipeline():
    from ai_knowledgegraph_extractor_ray.pipelines.corpus_clean import clean_corpus
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river where the water is cold and the sun is warm today again")
    texts = [good, good,                        # exact dup
             good.replace("today", "tonight"),  # near dup
             "", "short",                       # validation / quality drops
             good.replace("the", "le").replace("and", "et")
                 .replace("is", "est") + " le la les dans"]  # french-ish: kept
    ds = docs_ds(texts, ids=[0, 1, 2, 3, 4, 5])
    cleaned, report = clean_corpus(ds, near_threshold=0.5, min_quality=0.3)
    assert report["input"] == 6
    assert report["after_validate"] == 5        # "" dropped
    assert report["after_exact_dedup"] == 4     # one exact dup gone
    assert report["after_near_dedup"] == 3      # near dup gone
    out = cleaned.to_pandas()
    assert 0 in set(out["doc_id"])              # survivor of the dup cluster
    assert report["after_quality_lang"] <= report["after_near_dedup"]
    assert 4 not in set(out["doc_id"])          # low-quality "short" dropped


def test_prepare_training_data_pipeline():
    """Composed data-prep: the contaminated doc (shares a 3-gram window
    with the test set) is dropped, survivors get consecutive prefix sums
    and budget-aligned pack ids."""
    from ai_knowledgegraph_extractor_ray.pipelines.corpus_clean import (
        prepare_training_data,
    )
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river where the water is cold and the sun is warm today again")
    other = ("a completely different story about the mountain where the "
             "snow is deep and the wind is strong and the path is long")
    test_doc = "the quick brown fox jumps far away"   # shares 3-grams w/ good
    train = docs_ds([good, other], ids=[0, 1])
    test = docs_ds([test_doc], ids=[99])
    out = (prepare_training_data(train, test, budget=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1]                 # doc 0 contaminated
    n = int(out["n_tokens"].iloc[0])
    assert int(out["prefix_tokens"].iloc[0]) == n
    assert int(out["pack_id"].iloc[0]) == 0
    assert set(out.columns) == {"doc_id", "lang_guess", "quality_bp",
                                "n_tokens", "prefix_tokens", "pack_id"}


# --- as-of join ---------------------------------------------------------------

def test_asof_join_backward():
    from ai_knowledgegraph_extractor_ray.ops.joins import asof_join_backward
    left = rd.from_pandas(pd.DataFrame({
        "eid": pd.Series([1, 2, 3, 4], dtype="int64"),
        "u": pd.Series([7, 7, 7, 9], dtype="int64"),
        "t": pd.Series([10, 20, 30, 15], dtype="int64"),
    }))
    right = rd.from_pandas(pd.DataFrame({
        "u": pd.Series([7, 7, 9], dtype="int64"),
        "t": pd.Series([5, 20, 50], dtype="int64"),
        "v": pd.Series([100, 200, 300], dtype="int64"),
    }))
    out = (asof_join_backward(left, right, on="t", by="u", value_cols=["v"])
           .to_pandas().sort_values("eid"))
    got = [None if pd.isna(x) else int(x) for x in out["v"]]
    # t=10 -> v@5; t=20 -> exact match v@20; t=30 -> v@20; u=9 t=15 -> none
    assert got == [100, 200, 200, None]


def test_image_resize_stage():
    media = multimodal.synthetic_media(n_items=9)
    out = multimodal.resize_images(media, target_w=16, target_h=12,
                                   concurrency=1).to_pandas()
    assert len(out) == 3                      # images only
    assert (out["meta_width"] == 16).all() and (out["meta_height"] == 12).all()
    assert all(len(p) == 16 * 12 * 3 for p in out["payload"])
    # deterministic across runs
    again = multimodal.resize_images(multimodal.synthetic_media(n_items=9),
                                     target_w=16, target_h=12,
                                     concurrency=1).to_pandas()
    assert list(out.sort_values("item_id")["payload"]) == \
        list(again.sort_values("item_id")["payload"])


def test_near_dedup_simhash_and_embedding():
    near = BASE.replace("customer", "client")
    ds = docs_ds([BASE, near, "utterly different words entirely here"],
                 ids=[0, 1, 2])
    kept = dedup.near_dedup_simhash(ds, max_hamming=6).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2]

    rng = np.random.RandomState(3)
    base = rng.standard_normal(32).astype(np.float32)
    rows = [base, base + 0.01 * rng.standard_normal(32).astype(np.float32),
            rng.standard_normal(32).astype(np.float32)]
    eds = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([0, 1, 2], dtype="int64"),
        "embedding": [r.tolist() for r in rows]}))
    ekept = dedup.near_dedup_embedding(eds, threshold=0.95).to_pandas()
    assert sorted(ekept["vec_id"]) == [0, 2]


# --- decontamination ---------------------------------------------------------

def test_decontaminate_planted_overlap():
    """Train docs sharing a word-3-gram with the test set are dropped;
    clean docs and sub-3-token docs survive correctly."""
    test = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([100, 101], dtype="int64"),
        "text": ["the quick brown fox jumps", "short one"],
    }))
    train = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
        "text": [
            "something about a speedy brown animal",    # no shared 3-gram
            "totally unrelated text here now",
            "prefix words then quick brown fox tail",   # shares "quick brown fox"
            "short one",                                # whole-text gram match (<3 tokens)
        ],
    }))
    out = dedup.decontaminate(train, test).to_pandas()
    kept = set(out["doc_id"])
    assert 3 not in kept          # 3-gram overlap
    assert 4 not in kept          # sub-3-token whole-text overlap
    assert 1 in kept and 2 in kept


def test_decontaminate_min_hits_threshold():
    test = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([9], dtype="int64"),
        "text": ["alpha beta gamma delta epsilon"],
    }))
    train = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([1, 2], dtype="int64"),
        "text": ["alpha beta gamma unrelated tail words",      # 1 shared gram
                 "alpha beta gamma delta epsilon extra"],      # 3 shared grams
    }))
    out = dedup.decontaminate(train, test, min_hits=2).to_pandas()
    assert set(out["doc_id"]) == {1}


def test_read_media_dir_end_to_end(tmp_path):
    """Real files on disk -> read_media_dir (header-probed metadata) ->
    decode/featurize stages with fakes disabled."""
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, size=(20, 30, 3), dtype=np.uint8)
    (tmp_path / "a.png").write_bytes(multimodal.encode_png(px))
    pcm = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    (tmp_path / "b.wav").write_bytes(multimodal.encode_wav(pcm, 8000))
    (tmp_path / "notes.txt").write_bytes(b"ignored")

    media = multimodal.read_media_dir(str(tmp_path)).to_pandas()
    assert sorted(media["media_type"]) == ["audio", "image"]
    img = media[media["media_type"] == "image"].iloc[0]
    assert (img["meta_width"], img["meta_height"]) == (30, 20)
    aud = media[media["media_type"] == "audio"].iloc[0]
    assert aud["meta_sample_rate"] == 8000

    ds = multimodal.read_media_dir(str(tmp_path))
    dec = multimodal.decode_images(ds, concurrency=1, fake_ok=False).to_pandas()
    assert dec["decoded"].sum() == 1
    feats = multimodal.featurize_audio(ds, concurrency=1,
                                       fake_ok=False).to_pandas()
    assert len(feats) == 1
    assert feats["duration_s"].iloc[0] == pytest.approx(0.5, abs=0.01)


# --- range join --------------------------------------------------------------

def test_range_join_count():
    from ai_knowledgegraph_extractor_ray.ops.joins import range_join_count
    left = rd.from_pandas(pd.DataFrame({
        "eid": pd.Series([1, 2, 3], dtype="int64"),
        "k": ["a", "a", "b"],
        "t": pd.Series([100, 200, 100], dtype="int64")}))
    right = rd.from_pandas(pd.DataFrame({
        "k": ["a", "a", "a", "b", "c"],
        "t": pd.Series([95, 111, 205, 50, 100], dtype="int64")}))
    out = range_join_count(left, right, on="t", by="k", lower=-10, upper=10,
                           out_col="n").to_pandas().sort_values("eid")
    # eid1: right a@95,a@111 not (111>110) -> wait 111 > 100+10 -> only 95
    assert out["n"].tolist() == [1, 1, 0]
    assert out["eid"].dtype == np.int64       # left dtypes preserved
    # boundary inclusivity: upper edge included
    out2 = range_join_count(left, right, on="t", by="k", lower=-11,
                            upper=11, out_col="n").to_pandas().sort_values("eid")
    assert out2["n"].tolist() == [2, 1, 0]


# --- sampling / balancing ----------------------------------------------------

def test_hash_sample_deterministic_and_partition_invariant():
    from ai_knowledgegraph_extractor_ray.ops import sampling
    texts = [f"document number {i} content" for i in range(500)]
    a = sampling.hash_sample(docs_ds(texts), rate=0.2).to_pandas()
    b = sampling.hash_sample(docs_ds(texts).repartition(7),
                             rate=0.2).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 40 <= len(a) <= 160            # ~20% of 500, loose bound
    # supersetting: higher rate strictly contains the lower-rate sample
    c = sampling.hash_sample(docs_ds(texts), rate=0.5).to_pandas()
    assert set(a["doc_id"]) <= set(c["doc_id"])


def test_cap_per_group():
    from ai_knowledgegraph_extractor_ray.ops import sampling
    df = pd.DataFrame({
        "doc_id": pd.Series(range(100), dtype="int64"),
        "grp": ["hot"] * 90 + ["cold"] * 10})
    out = sampling.cap_per_group(
        rd.from_pandas(df).repartition(8), group_col="grp",
        order_col="doc_id", k=5).to_pandas()
    by = out.groupby("grp")["doc_id"].apply(sorted).to_dict()
    assert by["hot"] == [0, 1, 2, 3, 4]       # smallest ids win
    assert by["cold"] == [90, 91, 92, 93, 94]


def test_dup_ngram_stats():
    from ai_knowledgegraph_extractor_ray.ops.dedup import dup_ngram_stats
    docs = [
        "the quick brown fox jumps over the lazy dog",   # shares 3-gram w/ 1
        "said the quick brown fox today",                # "the quick brown"+
        "totally unrelated words here now",
        "short doc",                                     # < n tokens -> 0
        "",                                              # empty -> 0
        "the quick brown",                               # exactly one gram
    ]
    out = (dup_ngram_stats(docs_ds(docs).repartition(4), n=3)
           .to_pandas().sort_values("doc_id"))
    assert out["n_gram_positions"].tolist() == [7, 4, 3, 0, 0, 1]
    # shared grams: "the quick brown", "quick brown fox" (docs 0, 1, 5)
    assert out["n_dup_positions"].tolist() == [2, 2, 0, 0, 0, 1]
    assert out["dup_bp"].tolist() == [
        (10000 * 2) // 7, 5000, 0, 0, 0, 10000]
    # within-doc repetition alone is NOT cross-doc duplication
    solo = dup_ngram_stats(
        docs_ds(["a b c a b c a b c", "x y z w"]), n=3).to_pandas()
    assert solo.sort_values("doc_id")["n_dup_positions"].tolist() == [0, 0]


def test_weighted_sample():
    import hashlib

    from ai_knowledgegraph_extractor_ray.ops.sampling import weighted_sample
    texts = [f"doc number {i} with content" for i in range(400)]
    w = [0.0, 1.0] * 200     # p=0 rows never kept, p=1 rows always kept
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(range(400), dtype="int64"),
        "text": pd.Series(texts, dtype="string"),
        "w": pd.Series(w, dtype="float64")})).repartition(4)
    out = weighted_sample(ds, weight_col="w", key_col="text").to_pandas()
    assert sorted(out["doc_id"]) == list(range(1, 400, 2))
    # fractional p keeps iff h16 < floor(p*65536), exactly
    ds2 = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(range(400), dtype="int64"),
        "text": pd.Series(texts, dtype="string"),
        "w": pd.Series([0.3] * 400, dtype="float64")}))
    got = set(weighted_sample(ds2, weight_col="w",
                              key_col="text").to_pandas()["doc_id"])
    exp = {i for i, t in enumerate(texts)
           if int.from_bytes(hashlib.sha256(t.encode()).digest()[:2],
                             "big") < int(0.3 * 65536)}
    assert got == exp and 0 < len(exp) < 400


def test_near_dedup_keep_best_score():
    from ai_knowledgegraph_extractor_ray.ops.dedup import drop_pair_clusters
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 7, 8, 9], dtype="int64"),
        "score": pd.Series([5, 9, 9, 1, 1, 1], dtype="int64")})
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": pd.Series([1, 2, 7], dtype="int64"),
        "id_b": pd.Series([2, 3, 8], dtype="int64")}))
    ds = rd.from_pandas(df).repartition(3)
    for mode in ("driver", "distributed"):
        # cluster {1,2,3}: best score 9 tie -> smallest id 2 survives;
        # cluster {7,8}: all-tie -> 7; doc 9 unpaired survives
        best = drop_pair_clusters(ds, pairs, id_col="doc_id",
                                  cluster_mode=mode,
                                  score_col="score").to_pandas()
        assert sorted(best["doc_id"]) == [2, 7, 9], mode
        # default (no score): smallest id per cluster, unchanged behavior
        lo = drop_pair_clusters(ds, pairs, id_col="doc_id",
                                cluster_mode=mode).to_pandas()
        assert sorted(lo["doc_id"]) == [1, 7, 9], mode


def test_remove_dup_spans():
    from ai_knowledgegraph_extractor_ray.ops.dedup import remove_dup_spans
    docs = [
        "aa bb cc dd ee ff",        # shares "aa bb cc" with doc 1
        "zz aa bb cc yy",           # -> tokens aa bb cc covered in both
        "solo words only here",
        "aa bb",                    # < n tokens, can't be covered
        "",
    ]
    out = (remove_dup_spans(docs_ds(docs).repartition(3), n=3)
           .to_pandas().sort_values("doc_id"))
    assert out["text_clean"].tolist() == [
        "dd ee ff", "zz yy", "solo words only here", "aa bb", ""]
    assert out["n_tokens_kept"].tolist() == [3, 2, 4, 2, 0]
    assert out["n_tokens_removed"].tolist() == [3, 3, 0, 0, 0]
    # overlapping spans merge: doc fully duplicated -> empty text
    pair = remove_dup_spans(
        docs_ds(["p q r s t", "p q r s t"]), n=3).to_pandas()
    assert pair["text_clean"].tolist() == ["", ""]
    assert pair["n_tokens_removed"].tolist() == [5, 5]


def test_temperature_mix_flattens_hot_groups():
    import hashlib

    from ai_knowledgegraph_extractor_ray.ops import sampling
    df = pd.DataFrame({
        "doc_id": pd.Series(range(1000), dtype="int64"),
        "src": ["hot"] * 900 + ["cold"] * 100})
    out = sampling.temperature_mix(
        rd.from_pandas(df).repartition(8), group_col="src",
        id_col="doc_id", k=100, alpha=0.5).to_pandas()
    by = out.groupby("src").size().to_dict()
    # w = isqrt(900)=30, isqrt(100)=10; quotas 100*30//40=75, 100*10//40=25
    # (proportional sampling would give hot 90) — alpha=0.5 flattens
    assert by == {"hot": 75, "cold": 25}
    # selection = k smallest sha256(id) per group, layout-independent
    hot_ids = sorted(out.loc[out["src"] == "hot", "doc_id"])
    expect = sorted(sorted(
        range(900),
        key=lambda i: hashlib.sha256(str(i).encode()).hexdigest())[:75])
    assert hot_ids == expect
    # alpha=1 reduces to proportional
    prop = sampling.temperature_mix(
        rd.from_pandas(df).repartition(8), group_col="src",
        id_col="doc_id", k=100, alpha=1.0).to_pandas()
    assert prop.groupby("src").size().to_dict() == {"hot": 90, "cold": 10}


def test_normalize_and_repetition():
    out = text.normalize_text(docs_ds(
        ["  Hello,   WORLD!! (ok) ", "", "a_b-c"])).to_pandas().sort_values("doc_id")
    assert out["norm_text"].tolist() == ["hello world ok", "", "a_bc"]
    rep = text.repetition_ratio(docs_ds(
        ["a a a a b", "x y z", ""])).to_pandas().sort_values("doc_id")
    assert rep["top_token_ratio"].tolist() == [0.8, 1/3, 0.0]


def test_ivf_partitioned_layout_prunes_and_matches():
    """IVFIndex.write -> centroid_id=K/ dirs; search_pruned over an opened
    layout returns exactly the in-memory search's results, and a probe
    touches only its clusters' directories (bytes scale with nprobe)."""
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.similarity import IVFIndex

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((6, 16)).astype(np.float32) * 4
    vecs = np.concatenate([
        centers[i % 6] + rng.standard_normal(16).astype(np.float32)[None]
        for i in range(600)])
    df = pd.DataFrame({"vec_id": np.arange(600, dtype=np.int64),
                       "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df).repartition(4)
    idx = IVFIndex.build(ds, n_clusters=6)
    layout = "/tmp/test_ivf_layout"
    shutil.rmtree(layout, ignore_errors=True)
    widx = idx.write(layout)
    assert sorted(d for d in os.listdir(layout) if d.startswith("centroid")) \
        == [f"centroid_id={c}" for c in range(6)]

    q = vecs[:4]
    want = idx.search(q, k=5, nprobe=2).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = IVFIndex.open(layout).search_pruned(q, k=5, nprobe=2).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(want[["query_id", "vec_id", "rank"]],
                                  got[["query_id", "vec_id", "rank"]])

    # pruning evidence: nprobe=1 for ONE query reads exactly 1 of 6 dirs
    unit = vecs[:1] / np.linalg.norm(vecs[:1], axis=1, keepdims=True)
    one = int(np.argmax(unit @ idx.centroids.T))
    single = IVFIndex.open(layout).search_pruned(vecs[:1], k=3, nprobe=1)
    rows = single.to_pandas()
    full = ds.to_pandas()
    assigned = idx.assigned.to_pandas()
    in_cluster = set(assigned.loc[assigned["centroid_id"] == one, "vec_id"])
    assert set(rows["vec_id"]) <= in_cluster
    shutil.rmtree(layout, ignore_errors=True)


def test_bmp_roundtrip_and_topdown():
    rng = np.random.RandomState(4)
    # widths that exercise row padding (w*3 % 4 != 0)
    for w, h in [(5, 3), (16, 9), (7, 11)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal.decode_bmp(multimodal.encode_bmp(px)) == px).all()
    # top-down variant (negative height) and 32-bit pixels
    px = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    bgra = np.concatenate([px[:, :, ::-1],
                           np.zeros((2, 2, 1), np.uint8)], axis=2)
    body = bgra.tobytes()
    info = (b"\x28\x00\x00\x00" + (2).to_bytes(4, "little")
            + (-2).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
            + b"\x00" * 4 + len(body).to_bytes(4, "little") + b"\x00" * 16)
    data = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + info + body)
    assert (multimodal.decode_bmp(data) == px).all()


def test_ppm_roundtrip_and_comment():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    commented = b"P6\n# a comment\n4 6\n# more\n255\n" + px.tobytes()
    assert (multimodal.decode_ppm(commented) == px).all()


def test_image_decoder_real_bmp_ppm_no_fake():
    """fake_ok=False decodes BMP and PPM payloads for real (3 stdlib image
    codecs beside the PIL gate — round-3 item 6)."""
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    dec = multimodal.ImageDecoder(fake_ok=False)
    if dec._pil is not None:
        import pytest
        pytest.skip("PIL present; stdlib path not exercised")
    for payload in (multimodal.encode_bmp(px), multimodal.encode_ppm(px)):
        assert (dec._decode(payload, 8, 8) == px).all()
    # probe reads BMP headers without decoding
    w, h, _, nf = multimodal.probe_media_meta(
        "image", multimodal.encode_bmp(px))
    assert (w, h, nf) == (8, 8, 1)


def test_image_decoder_jpeg_via_pil_when_available():
    """The JPEG path is PIL's; exercised only when the real library exists
    (gating per round-3 item 6 — a stdlib baseline-JPEG decoder is not a
    reasonable bar)."""
    import pytest
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed in this container")
    import io
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4] = 255
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="JPEG")
    dec = multimodal.ImageDecoder(fake_ok=False)
    out = dec._decode(buf.getvalue(), 8, 8)
    assert out.shape == (8, 8, 3)
    assert out[:4].mean() > 200 and out[4:].mean() < 55


# --- general inner join + grouped quantiles (round 3) ------------------------

def test_inner_join_plans_agree_and_keep_dtypes():
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        broadcast_inner_join,
        hash_inner_join,
    )

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    right = pd.DataFrame({"k": [2, 3, 3, 4], "rv": [200, 300, 301, 400]})
    want = left.merge(right, on="k").sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)

    a = broadcast_inner_join(rd.from_pandas(left).repartition(3),
                             right, on="k").to_pandas()
    b = hash_inner_join(rd.from_pandas(left).repartition(3),
                        rd.from_pandas(right).repartition(2),
                        on="k").to_pandas()
    for got in (a, b):
        got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_like=True)
        assert got["lv"].dtype == "int64" and got["rv"].dtype == "int64"


def test_grouped_quantile_disc_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_quantile_disc

    rng = np.random.RandomState(9)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), size=500),
        "v": rng.randint(0, 40, size=500).astype("int64")})
    got = grouped_quantile_disc(rd.from_pandas(df).repartition(7), ["g"], "v",
                                {"p50": 0.5, "p95": 0.95, "p01": 0.01}
                                ).to_pandas().sort_values("g").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT g, quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.95) AS p95,
               quantile_disc(v, 0.01) AS p01, CAST(count(*) AS BIGINT) AS n
        FROM df GROUP BY g ORDER BY g""").df()
    for c in ("p50", "p95", "p01", "n"):
        assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c


def test_grouped_rollup_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_rollup

    rng = np.random.RandomState(21)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=600),
        "b": rng.choice(["p", "q"], size=600),
        "v": rng.randint(0, 100, size=600).astype("int64")})
    partials = (rd.from_pandas(df).repartition(7)
                .map_batches(lambda d: d.groupby(["a", "b"], as_index=False)
                             .agg(n=("v", "size"), v=("v", "sum")),
                             batch_format="pandas"))
    got = grouped_rollup(partials, ["a", "b"], ["n", "v"]).to_pandas()
    want = duckdb.connect().execute("""
        SELECT a, b, CAST(count(*) AS BIGINT) AS n, sum(v) AS v
        FROM df GROUP BY ROLLUP(a, b)""").df()

    def canon(d):
        d = d.copy()
        for c in ("a", "b"):
            d[c] = d[c].astype(object).where(d[c].notna(), "<null>").astype(str)
        return (d.astype({"n": "int64", "v": "int64"})
                .sort_values(["a", "b"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(canon(got)[["a", "b", "n", "v"]],
                                  canon(want)[["a", "b", "n", "v"]])


def test_approx_top_k_cms_properties():
    """CMS heavy hitters: (a) with width >> vocab the top-k and counts
    equal the exact answer; (b) at an adversarially tiny width every
    estimate still upper-bounds the true count (the CMS guarantee)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import approx_top_k

    rng = np.random.RandomState(7)
    # Zipf-ish counts over a 300-item vocab
    items = [f"tok{i:03d}" for i in range(300)]
    counts = (5000 / np.arange(1, 301) ** 1.1).astype(np.int64) + 1
    df = pd.DataFrame({"item": items, "cnt": counts}).sample(
        frac=1.0, random_state=rng).reset_index(drop=True)
    # split each item's count across a few synthetic "blocks"
    parts = pd.concat([df.assign(cnt=df["cnt"] // 2),
                       df.assign(cnt=df["cnt"] - df["cnt"] // 2)],
                      ignore_index=True)
    parts = parts[parts["cnt"] > 0]
    partials = rd.from_pandas(parts).repartition(7)

    exact = (df.sort_values(["cnt", "item"], ascending=[False, True])
             .head(10).reset_index(drop=True))
    got = approx_top_k(partials, "item", "cnt", k=10, width=1 << 14)
    assert list(got["item"]) == list(exact["item"])
    assert list(got["est"].astype("int64")) == list(exact["cnt"].astype("int64"))

    tiny = approx_top_k(partials, "item", "cnt", k=300, width=64,
                        candidates_per_block=300)
    true = df.set_index("item")["cnt"]
    merged = tiny.set_index("item")["est"]
    assert (merged >= true.loc[merged.index]).all()
    assert (merged > true.loc[merged.index]).any()  # width 64 must collide


def test_pivot_count_and_sum_modes():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import pivot_count

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=400),
        "cat": rng.choice(["a", "b", "c", "zzz"], size=400),  # zzz ignored
        "v": rng.randint(1, 9, size=400).astype("int64")})
    cats = ["a", "b", "c"]

    got = (pivot_count(rd.from_pandas(df).repartition(5), ["g"], "cat", cats)
           .to_pandas().set_index("g").sort_index())
    want = (df[df["cat"].isin(cats)].pivot_table(
        index="g", columns="cat", values="v", aggfunc="size", fill_value=0)
        .sort_index())
    for c in cats:
        assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c

    got_s = (pivot_count(rd.from_pandas(df).repartition(5), ["g"], "cat",
                         cats, value_col="v")
             .to_pandas().set_index("g").sort_index())
    want_s = (df[df["cat"].isin(cats)].pivot_table(
        index="g", columns="cat", values="v", aggfunc="sum", fill_value=0)
        .sort_index())
    for c in cats:
        assert list(got_s[c].astype("int64")) == list(want_s[c].astype("int64")), c


def test_grouped_count_distinct_exact_and_hll_close():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_approx_distinct,
        grouped_count_distinct,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], size=40000),
        "v": rng.randint(0, 15000, size=40000).astype("int64")})
    want = df.groupby("g")["v"].nunique()

    exact = grouped_count_distinct(rd.from_pandas(df).repartition(9),
                                   ["g"], "v").to_pandas().set_index("g")
    assert {g: int(exact.loc[g, "n_distinct"]) for g in ("a", "b")} \
        == {g: int(want[g]) for g in ("a", "b")}

    approx = grouped_approx_distinct(rd.from_pandas(df).repartition(9),
                                     ["g"], "v").to_pandas().set_index("g")
    for g in ("a", "b"):
        rel = abs(int(approx.loc[g, "approx_distinct"]) - int(want[g])) / int(want[g])
        assert rel < 0.05, (g, rel)

    # HLL merge is layout-independent: same estimate from any blocking
    approx2 = grouped_approx_distinct(rd.from_pandas(df).repartition(2),
                                      ["g"], "v").to_pandas().set_index("g")
    assert (approx["approx_distinct"] == approx2["approx_distinct"]).all()


def test_ordered_prefix_sum_matches_pandas_scan():
    """Distributed running total == a driver-side sorted cumsum, for int
    and float values, dense and sparse/clustered order keys, any block
    layout."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import ordered_prefix_sum

    rng = np.random.RandomState(21)
    for keys in (np.arange(3000),                       # dense
                 np.sort(rng.choice(10**9, 3000, replace=False))):  # sparse
        rng.shuffle(keys)
        df = pd.DataFrame({"k": keys.astype("int64"),
                           "v": rng.randint(0, 50, 3000).astype("int64"),
                           "f": rng.standard_normal(3000)})
        want = df.sort_values("k").reset_index(drop=True)
        want["ps"] = want["v"].cumsum()

        got = (ordered_prefix_sum(rd.from_pandas(df).repartition(11),
                                  "k", "v", out_col="ps", range_buckets=16)
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert got["ps"].dtype == "int64"
        assert list(got["ps"]) == list(want["ps"])
        assert list(got["k"]) == list(want["k"])

    # float values path
    df = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                       "v": rng.standard_normal(500)})
    got = (ordered_prefix_sum(rd.from_pandas(df), "k", "v", out_col="ps")
           .to_pandas().sort_values("k"))
    assert np.allclose(got["ps"].to_numpy(), df.sort_values("k")["v"].cumsum())


def test_bloom_filter_and_bloom_decontaminate():
    import numpy as np
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.dedup import (
        BloomFilter,
        decontaminate,
    )

    rng = np.random.RandomState(31)
    members = rng.randint(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    others = rng.randint(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    others = others[~np.isin(others, members)]
    bf = BloomFilter.for_items(len(members), fp_rate=1e-4)
    bf.add(members)
    assert bf.contains(members).all()              # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 1e-3, fp                           # ~1e-4 expected

    # bloom decontamination == exact on a corpus with planted contamination
    import pandas as pd
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype="int64"),
        "text": [f"w{i}a w{i}b w{i}c w{i}d w{i}e" for i in range(300)]})
    test = pd.DataFrame({"doc_id": [0], "text": ["w7a w7b w7c extra"]})
    exact = decontaminate(rd.from_pandas(docs), rd.from_pandas(test),
                          membership="exact").to_pandas()
    bloom = decontaminate(rd.from_pandas(docs), rd.from_pandas(test),
                          membership="bloom").to_pandas()
    # bloom survivors are a subset of exact's: false positives may only
    # OVER-drop — contamination can never leak through
    assert set(bloom["doc_id"]) <= set(exact["doc_id"])
    assert 7 not in set(exact["doc_id"])           # contaminated doc dropped
    assert 7 not in set(bloom["doc_id"])
    assert len(exact) == 299                       # only doc 7 shares a gram
    assert len(bloom) >= 290                       # fp floor keeps it tight


def test_graph_degrees_and_pagerank():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import (
        degree_table,
        pagerank,
    )

    edges = pd.DataFrame({
        "canonical_src": ["a", "a", "b", "c", "c", "c"],
        "canonical_dst": ["b", "c", "c", "a", "a", "b"],
        "weight": [1, 2, 3, 1, 1, 4]})
    ds = rd.from_pandas(edges).repartition(3)

    deg = degree_table(ds).to_pandas().set_index("node")
    assert int(deg.loc["a", "out_degree"]) == 2
    assert int(deg.loc["a", "out_weight"]) == 3
    assert int(deg.loc["c", "in_weight"]) == 2 + 3
    assert int(deg.loc["c", "out_degree"]) == 3

    r = pagerank(ds, iters=10, damping=0.85)
    ranks = dict(zip(r["node"], r["rank"]))
    # driver-side reference iteration
    ref = {n: 1.0 for n in "abc"}
    ow = {"a": 3.0, "b": 3.0, "c": 6.0}
    for _ in range(10):
        inc = {n: 0.0 for n in "abc"}
        for s, d, w in zip(edges["canonical_src"], edges["canonical_dst"],
                           edges["weight"]):
            inc[d] += w / ow[s] * ref[s]
        ref = {n: 0.15 + 0.85 * inc[n] for n in ref}
    for n in "abc":
        assert abs(ranks[n] - ref[n]) < 1e-9, n


def test_pagerank_distributed_matches_driver_state_path():
    """The exchange-partitioned rank loop (rank state never driver-held)
    computes the same recurrence as the driver-state loop; the
    max_driver_nodes dispatch routes through it transparently."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import (
        pagerank,
        pagerank_distributed,
    )

    rng = np.random.RandomState(5)
    n_nodes = 80
    nodes = [f"v{i:03d}" for i in range(n_nodes)]
    edges = pd.DataFrame({
        "canonical_src": [nodes[i] for i in rng.randint(0, n_nodes, 600)],
        "canonical_dst": [nodes[i] for i in rng.randint(0, n_nodes, 600)],
        "weight": rng.randint(1, 5, 600).astype("int64")})
    ds = rd.from_pandas(edges).repartition(5)

    want = pagerank(ds, iters=4)
    got = (pagerank_distributed(ds, iters=4, num_partitions=7)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["node"]) == list(want["node"])
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=0, atol=1e-12)

    # dispatch: tiny max_driver_nodes forces the distributed path inside
    # pagerank() itself; result identical shape and values
    auto = pagerank(ds, iters=4, max_driver_nodes=10)
    np.testing.assert_allclose(auto["rank"], want["rank"], rtol=0,
                               atol=1e-12)

    # beyond 10x max_driver_nodes even the final DataFrame collect is the
    # problem: refuse with a pointer to pagerank_distributed
    import pytest
    with pytest.raises(ValueError, match="pagerank_distributed"):
        pagerank(ds, iters=1, max_driver_nodes=5)

    # dangling nodes (no out-edges) still receive rank
    e2 = pd.DataFrame({"canonical_src": ["a", "b"],
                       "canonical_dst": ["sink", "sink"],
                       "weight": [1, 1]})
    r2 = (pagerank_distributed(rd.from_pandas(e2), iters=2,
                               num_partitions=3).to_pandas())
    assert set(r2["node"]) == {"a", "b", "sink"}
    sink = float(r2.loc[r2["node"] == "sink", "rank"].iloc[0])
    assert sink > float(r2.loc[r2["node"] == "a", "rank"].iloc[0])

    # empty edge set -> empty typed (node, rank) dataset, not a crash
    empty = pd.DataFrame({"canonical_src": pd.Series(dtype=object),
                          "canonical_dst": pd.Series(dtype=object),
                          "weight": pd.Series(dtype="int64")})
    r3 = pagerank_distributed(rd.from_pandas(empty), iters=2)
    assert r3.count() == 0
    assert set(r3.schema().names) == {"node", "rank"}


def test_review_regressions_round3():
    """Pins for the round-3 code-review findings."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_quantile_disc,
        ordered_prefix_sum,
    )
    from ai_knowledgegraph_extractor_ray.ops.graph import (
        degree_table,
        pagerank,
    )
    from ai_knowledgegraph_extractor_ray.ops.joins import hash_inner_join

    # empty input: no TypeError from None min/max
    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64"),
                                         "v": pd.Series(dtype="int64")}))
    assert ordered_prefix_sum(empty, "k", "v").count() == 0

    # q=0.07 over 100 rows: float64 ceil overshoot (7.000000000000001 -> 8)
    df = pd.DataFrame({"g": ["a"] * 100, "v": np.arange(1, 101)})
    got = grouped_quantile_disc(rd.from_pandas(df), ["g"], "v",
                                {"p7": 0.07}).to_pandas()
    assert int(got["p7"].iloc[0]) == 7          # percentile_disc rank 7

    # float edge weights survive (no int64 truncation), zero-out-weight safe
    e = rd.from_pandas(pd.DataFrame({
        "canonical_src": ["a", "b"], "canonical_dst": ["b", "a"],
        "weight": [0.5, 0.25]}))
    deg = degree_table(e).to_pandas().set_index("node")
    assert float(deg.loc["a", "out_weight"]) == 0.5
    r = pagerank(e, iters=2)
    assert np.isfinite(r["rank"]).all()

    # overlapping non-key columns raise instead of silently suffixing
    l = rd.from_pandas(pd.DataFrame({"k": [1], "text": ["x"]}))
    rr = rd.from_pandas(pd.DataFrame({"k": [1], "text": ["y"]}))
    with pytest.raises(ValueError, match="both sides"):
        hash_inner_join(l, rr, on="k")


def test_llm_provider_misconfig_message():
    import pytest

    from ai_knowledgegraph_extractor_ray.config import KGConfig
    from ai_knowledgegraph_extractor_ray.stages.extract import LLMBackend

    # default provider 'ollama' with only the openai URL set: clear error,
    # not "unknown llm_provider 'ollama'"
    cfg = KGConfig(backend="llm", llm_openai_base_url="http://127.0.0.1:9")
    with pytest.raises(ValueError, match="matched no"):
        LLMBackend(cfg)


# --- TF-IDF distinctive terms ------------------------------------------------

def test_tfidf_top_terms():
    """'common' appears everywhere (idf=0, never distinctive); each doc's
    unique token ranks first; k and tie-breaks honored."""
    import math

    from ai_knowledgegraph_extractor_ray.ops.text import tfidf_top_terms

    ds = docs_ds(["common alpha alpha beta",
                  "common gamma",
                  "common beta delta"])
    out = tfidf_top_terms(ds, k=2).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    # doc 0: alpha tf=2 df=1 -> 2*ln(3); beta tf=1 df=2 -> ln(1.5)
    assert by_doc[0]["term"].tolist() == ["alpha", "beta"]
    assert by_doc[0]["score_bp"].tolist() == [
        int(round(2 * math.log(3) * 10000)),
        int(round(math.log(3 / 2) * 10000))]
    # doc 1: gamma, then common (score 0) — k=2 includes the zero
    assert by_doc[1]["term"].tolist() == ["gamma", "common"]
    assert by_doc[1]["score_bp"].tolist()[1] == 0
    assert by_doc[2]["term"].tolist() == ["delta", "beta"]
    assert out["rank"].tolist() == [0, 1, 0, 1, 0, 1]


def test_tfidf_min_df_prunes_and_empty_raises():
    import pytest as _pytest

    from ai_knowledgegraph_extractor_ray.ops.text import tfidf_top_terms

    ds = docs_ds(["a b", "b c"])
    out = tfidf_top_terms(ds, k=3, min_df=2).to_pandas()
    assert set(out["term"]) == {"b"}          # df-1 terms pruned
    with _pytest.raises(ValueError, match="max_vocab"):
        tfidf_top_terms(ds, max_vocab=1).to_pandas()


# --- partitioned parquet sink ------------------------------------------------

def test_partitioned_sink_roundtrip(tmp_path):
    """One file per value directory (not blocks x values); round-trip
    preserves rows; pruned read touches only requested partitions."""
    import os

    from ai_knowledgegraph_extractor_ray.ops.sinks import (
        read_partitioned_parquet, write_partitioned_parquet)

    df = pd.DataFrame({
        "doc_id": pd.Series(range(60), dtype="int64"),
        "lang": pd.Series([["en", "de", "fr"][i % 3] for i in range(60)]),
        "payload": pd.Series(range(60), dtype="int64") * 2,
    })
    ds = rd.from_pandas(df).repartition(8)   # 8 blocks x 3 values
    out = str(tmp_path / "part")
    write_partitioned_parquet(ds, out, partition_col="lang")

    for lang in ("en", "de", "fr"):
        d = os.path.join(out, f"lang={lang}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        # naive write_parquet(partition_cols) would emit up to 8 here
        assert len(files) <= 2, (lang, files)

    back = read_partitioned_parquet(out, partition_col="lang").to_pandas()
    assert len(back) == 60
    assert sorted(back["payload"]) == sorted(df["payload"])

    de = read_partitioned_parquet(out, partition_col="lang",
                                  values=["de"]).to_pandas()
    assert set(de["lang"]) == {"de"} and len(de) == 20
    just_pay = read_partitioned_parquet(
        out, partition_col="lang", values=["en", "fr"],
        columns=["payload"]).to_pandas()
    assert len(just_pay) == 40 and list(just_pay.columns) == ["payload"]

    with pytest.raises(FileNotFoundError):
        read_partitioned_parquet(out, partition_col="lang", values=["zz"])


# --- round-3 late additions: outer join, cont quantiles, cube, chunks --------

def test_full_outer_join_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import hash_inner_join

    rng = np.random.RandomState(4)
    left = pd.DataFrame({"k": rng.randint(0, 30, 80).astype("int64"),
                         "lv": np.arange(80, dtype="int64")})
    right = pd.DataFrame({"k": rng.randint(15, 45, 60).astype("int64"),
                          "rv": np.arange(60, dtype="int64") * 10})
    got = hash_inner_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right).repartition(2),
                          "k", how="outer").to_pandas()
    con = duckdb.connect()
    con.register("ldf", left)
    con.register("rdf", right)
    want = con.execute("""
        SELECT COALESCE(l.k, r.k) AS k,
               CAST(lv AS DOUBLE) AS lv, CAST(rv AS DOUBLE) AS rv
        FROM ldf l FULL OUTER JOIN rdf r ON l.k = r.k
    """).df()
    key = ["k", "lv", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    assert got["k"].dtype == "int64"
    assert got["lv"].dtype == "float64" and got["rv"].dtype == "float64"
    pd.testing.assert_frame_equal(got, want)


def test_grouped_quantile_cont_bitexact_vs_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_quantile_cont

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), size=700),
        "v": rng.randint(0, 97, size=700).astype("int64")})
    got = grouped_quantile_cont(
        rd.from_pandas(df).repartition(7), ["g"], "v",
        {"p50": 0.5, "p90": 0.9, "p07": 0.07}
    ).to_pandas().sort_values("g").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT g, quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90,
               quantile_cont(v, 0.07) AS p07, CAST(count(*) AS BIGINT) AS n
        FROM df GROUP BY g ORDER BY g""").df()
    for c in ("p50", "p90", "p07"):
        # the driver hashes float BITS — require exact equality, not allclose
        assert list(got[c]) == list(want[c]), c
    assert list(got["n"]) == list(want["n"])


def test_grouped_cube_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_cube

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.choice(list("xy"), 400),
        "b": rng.choice(list("mnp"), 400),
        "v": rng.randint(0, 9, 400).astype("int64")})

    def partial(p):
        return (p.groupby(["a", "b"], sort=False)["v"].sum()
                .rename("sum_v").reset_index())

    got = grouped_cube(
        rd.from_pandas(df).repartition(5).map_batches(
            partial, batch_format="pandas"),
        ["a", "b"], ["sum_v"]).to_pandas()
    want = duckdb.connect().execute("""
        SELECT a, b, SUM(v) AS sum_v FROM df GROUP BY CUBE(a, b)
    """).df()
    want["sum_v"] = want["sum_v"].astype("int64")
    for d in (got, want):
        d["a"] = d["a"].fillna("~"); d["b"] = d["b"].fillna("~")
    got = got.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b", "sum_v"]]
    want = want.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b", "sum_v"]]
    pd.testing.assert_frame_equal(got, want)


def test_chunk_documents_matches_duckdb_and_reassembles():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.text import chunk_documents

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["a" * 10, "", "xyz", "b" * 100 + "c" * 57, "d" * 64]})
    chunk, overlap = 64, 16
    got = chunk_documents(rd.from_pandas(docs).repartition(2),
                          chunk_chars=chunk, overlap=overlap
                          ).to_pandas()
    want = duckdb.connect().execute(f"""
        WITH n AS (SELECT doc_id, text,
                   greatest(1, CAST(ceil(greatest(length(text) - {overlap}, 1)
                        / CAST({chunk - overlap} AS DOUBLE)) AS BIGINT)) AS nc
                   FROM docs)
        SELECT doc_id, i AS chunk_idx,
               substr(text, CAST(i * {chunk - overlap} + 1 AS INT), {chunk})
                 AS chunk_text,
               length(substr(text, CAST(i * {chunk - overlap} + 1 AS INT),
                             {chunk})) AS n_chars
        FROM n, UNNEST(range(nc)) AS t(i)""").df()
    cols = ["doc_id", "chunk_idx", "chunk_text", "n_chars"]
    got = got[cols].sort_values(cols[:2]).reset_index(drop=True)
    want = want[cols].sort_values(cols[:2]).reset_index(drop=True)
    want["chunk_idx"] = want["chunk_idx"].astype("int64")
    want["n_chars"] = want["n_chars"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # overlap-aware reassembly recovers every document exactly
    for did, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        text = g.iloc[0]["chunk_text"] + "".join(
            t[overlap:] for t in g["chunk_text"].iloc[1:])
        assert text == docs.set_index("doc_id")["text"][did]


def test_skew_aware_join_matches_plain_and_splits():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        hash_inner_join,
        skew_aware_inner_join,
    )

    rng = np.random.RandomState(8)
    # key 7 is hot: 70% of left rows
    keys = np.where(rng.rand(2000) < 0.7, 7,
                    rng.randint(0, 50, 2000)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(2000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(0, 50, dtype="int64"),
                          "rv": np.arange(0, 500, 10, dtype="int64")})
    got = skew_aware_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2), "k",
        hot_threshold=200).to_pandas()
    want = hash_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2), "k").to_pandas()
    key = ["k", "lv", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # no hot keys -> same result via the degenerate path
    got2 = skew_aware_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2), "k",
        hot_threshold=10**9).to_pandas()
    got2 = got2[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want)


def test_skew_aware_join_broadcast_byte_guard():
    """Wide (>=1 KB) dimension rows trip the byte bound even when the row
    count is tiny; narrow rows under both bounds still broadcast
    (round-4 VERDICT #4: the guard must be byte-based, measured in the
    object store before driver materialization)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        hash_inner_join,
        skew_aware_inner_join,
    )

    rng = np.random.RandomState(11)
    keys = np.where(rng.rand(1000) < 0.8, 3,
                    rng.randint(0, 20, 1000)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(1000, dtype="int64")})
    wide = pd.DataFrame({"k": np.arange(0, 20, dtype="int64"),
                         "payload": ["x" * 65536] * 20})
    with pytest.raises(ValueError, match="bytes"):
        skew_aware_inner_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(wide).repartition(2), "k",
            hot_threshold=100,
            broadcast_limit_bytes=8 * 1024).to_pandas()
    # narrow rows under both bounds: plan succeeds and matches plain join
    narrow = pd.DataFrame({"k": np.arange(0, 20, dtype="int64"),
                           "rv": np.arange(0, 20, dtype="int64")})
    got = skew_aware_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(narrow).repartition(2), "k",
        hot_threshold=100,
        broadcast_limit_bytes=8 * 1024).to_pandas()
    want = hash_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(narrow).repartition(2), "k").to_pandas()
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))


def test_window_rank_dense_ntile_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import WindowSpec, keyed_window

    rng = np.random.RandomState(6)
    df = pd.DataFrame({
        "k": rng.randint(0, 7, 300).astype("int64"),
        "id": np.arange(300, dtype="int64"),
        "v": rng.randint(0, 12, 300).astype("int64")})   # ties guaranteed
    got = keyed_window(
        rd.from_pandas(df).repartition(5), by="k", order=["v", "id"],
        specs=[WindowSpec("rnk", "rank", src="v"),
               WindowSpec("drnk", "dense_rank", src="v"),
               WindowSpec("tile", "ntile", param=4)]).to_pandas()
    want = duckdb.connect().execute("""
        SELECT k, id, v,
               CAST(rank() OVER wv AS BIGINT) AS rnk,
               CAST(dense_rank() OVER wv AS BIGINT) AS drnk,
               CAST(ntile(4) OVER wt AS BIGINT) AS tile
        FROM df WINDOW wv AS (PARTITION BY k ORDER BY v),
                    wt AS (PARTITION BY k ORDER BY v, id)""").df()
    cols = ["k", "id", "v", "rnk", "drnk", "tile"]
    got = got[cols].sort_values(["k", "id"]).reset_index(drop=True)
    want = want[cols].sort_values(["k", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_review_regressions_round3_late(tmp_path):
    """Pins the fixes for the second round-3 review pass: int64 partition
    columns, partition-only column projection, missing-partition errors,
    and negative window params."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sinks import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )
    from ai_knowledgegraph_extractor_ray.ops.window import WindowSpec, keyed_window

    df = pd.DataFrame({"shard": pd.Series([0, 1, 0, 2, 1], dtype="int64"),
                       "payload": list("abcde")})
    root = str(tmp_path / "intpart")
    # int64 partition column: the exchange must stamp a string key
    write_partitioned_parquet(rd.from_pandas(df).repartition(2), root,
                              partition_col="shard")
    back = read_partitioned_parquet(root, partition_col="shard",
                                    values=[0, 1]).to_pandas()
    assert sorted(back["payload"]) == ["a", "b", "c", "e"]   # shards 0+1
    # columns=[partition_col] returns ONLY that column
    only = read_partitioned_parquet(root, partition_col="shard",
                                    values=[0], columns=["shard"]).to_pandas()
    assert list(only.columns) == ["shard"] and len(only) == 2
    # a requested-but-missing partition value raises instead of silently
    # returning partial coverage
    with pytest.raises(FileNotFoundError, match="99"):
        read_partitioned_parquet(root, partition_col="shard", values=[0, 99])
    with pytest.raises(ValueError, match=r"values=\[\]"):
        read_partitioned_parquet(root, partition_col="shard", values=[])
    # negative / non-int window params are rejected, not silently inverted
    ds = rd.from_pandas(pd.DataFrame({"k": [1], "ts": [1], "v": [1]}))
    for bad in (-1, 0, None, 2.5):
        with pytest.raises(ValueError, match="positive integer param"):
            keyed_window(ds, by="k", order=["ts"],
                         specs=[WindowSpec("x", "lag", "v", bad)])


def test_grouping_ladder_empty_input():
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_cube, grouped_rollup

    empty = rd.from_pandas(pd.DataFrame({
        "a": pd.Series([], dtype="string"),
        "b": pd.Series([], dtype="string"),
        "v": pd.Series([], dtype="int64")})).repartition(2)
    for fn in (grouped_rollup, grouped_cube):
        out = fn(empty, ["a", "b"], ["v"])
        assert out.count() == 0


def test_grouped_approx_quantile_rank_error_bounded():
    """Sketch accuracy pin: on 40k lognormal + uniform values across 3
    groups and 7 partitions, every estimated quantile's RANK in the exact
    sorted data is within 1.5% of the requested q, and group counts are
    exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_approx_quantile

    rng = np.random.RandomState(5)
    parts = []
    for g, vals in (("logn", rng.lognormal(0, 1, 40000)),
                    ("unif", rng.uniform(-3, 9, 40000)),
                    ("tiny", np.array([4.25])),
                    ("const", np.full(500, 7.5))):
        parts.append(pd.DataFrame({"g": g, "v": vals}))
    df = pd.concat(parts, ignore_index=True)
    qs = {"p10": 0.1, "p50": 0.5, "p95": 0.95, "p99": 0.99}
    got = grouped_approx_quantile(
        rd.from_pandas(df).repartition(7), ["g"], "v", qs
    ).to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        assert int(got.loc[g, "n"]) == len(v)
        for name, q in qs.items():
            est = got.loc[g, name]
            rank = np.searchsorted(v, est) / max(len(v) - 1, 1)
            assert abs(rank - q) <= 0.015 or len(v) <= 1 or v[0] == v[-1], (
                g, name, est, rank)
    assert got.loc["const", "p50"] == 7.5 and got.loc["tiny", "p99"] == 4.25


def test_grouped_argmax_and_unpivot_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_argmax, unpivot

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 300),
        "id": np.arange(300, dtype="int64"),
        "v": rng.randint(0, 50, 300).astype("int64")})  # ties within groups
    got = grouped_argmax(rd.from_pandas(df).repartition(5), ["g"], "v",
                         tiebreak="id").to_pandas()
    want = duckdb.connect().execute("""
        SELECT g, id, v FROM df
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC, id) = 1
        ORDER BY g""").df()
    got = got[["g", "id", "v"]].sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    wide = pd.DataFrame({"k": [1, 2], "a": [1.5, 2.5], "b": [3.5, 4.5]})
    long = unpivot(rd.from_pandas(wide), id_cols=["k"],
                   value_cols=["a", "b"]).to_pandas()
    long = long.sort_values(["k", "name"]).reset_index(drop=True)
    assert long["value"].tolist() == [1.5, 3.5, 2.5, 4.5]
    assert long["name"].tolist() == ["a", "b", "a", "b"]


def test_bloom_filtered_join_matches_plain_and_prunes():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        bloom_filtered_inner_join,
        hash_inner_join,
    )

    rng = np.random.RandomState(12)
    left = pd.DataFrame({"k": rng.randint(0, 100_000, 5000).astype("int64"),
                         "lv": np.arange(5000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(0, 500, dtype="int64"),  # selective
                          "rv": np.arange(500, dtype="int64")})
    got = bloom_filtered_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2), "k").to_pandas()
    want = hash_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2), "k").to_pandas()
    cols = ["k", "lv", "rv"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_incremental_dedup_against_index(tmp_path):
    """Build an LSH index over an 'old' corpus, then find near-dups of a
    'new' batch against it — matches brute-force cross jaccard exactly on
    the verified values, without re-banding the old corpus."""
    from ai_knowledgegraph_extractor_ray.ops.dedup import (
        build_minhash_index,
        dedup_against_index,
        jaccard_of,
        word_ngrams,
    )

    old_texts = [BASE, " ".join(reversed(BASE.split())),
                 "utterly different content about volcanoes and tides today"]
    new_texts = [BASE.replace("customer", "client"),      # near-dup of old 0
                 "completely fresh text with novel words and phrases here",
                 old_texts[2]]                            # exact dup of old 2
    old = docs_ds(old_texts, ids=[0, 2, 4])
    new = docs_ds(new_texts, ids=[1, 3, 5])
    idx = str(tmp_path / "lsh_index")
    build_minhash_index(old, idx)
    got = dedup_against_index(new, idx, old, threshold=0.5).to_pandas()
    got = got.sort_values(["old_id", "new_id"]).reset_index(drop=True)
    want = []
    for oid, ot in zip([0, 2, 4], old_texts):
        for nid, nt in zip([1, 3, 5], new_texts):
            j = jaccard_of(word_ngrams(ot, 3), word_ngrams(nt, 3))
            if j >= 0.5:
                want.append((oid, nid, j))
    assert list(zip(got["old_id"], got["new_id"], got["jaccard"])) == want
    assert (0, 1) in {(a, b) for a, b, _ in want}      # near-dup found
    assert (4, 5) in {(a, b) for a, b, _ in want}      # exact dup found


def test_incremental_dedup_cap_is_layout_independent(tmp_path):
    """The per-bucket old-side cap must pick the same (smallest) old ids
    whatever the index's block layout: 40 identical old docs against one
    identical new doc, capped at 10, indexed at two different partition
    counts — identical pair sets both times."""
    from ai_knowledgegraph_extractor_ray.ops.dedup import (
        build_minhash_index,
        dedup_against_index,
    )

    old = docs_ds([BASE] * 40, ids=list(range(40)))
    new = docs_ds([BASE], ids=[100])
    results = []
    for parts in (1, 7):
        idx = str(tmp_path / f"idx_{parts}")
        build_minhash_index(old.repartition(parts), idx)
        got = dedup_against_index(new, idx, old, threshold=0.9,
                                  max_bucket=10).to_pandas()
        results.append(sorted(zip(got["old_id"], got["new_id"])))
    assert results[0] == results[1]
    assert results[0] == [(i, 100) for i in range(10)]  # smallest ids win


# --- round-4 regressions (round-3 ADVICE + VERDICT #6) -----------------------

def test_null_keys_survive_set_ops_and_grouped_reduces():
    """SQL keeps NULL keys: UNION emits one NULL row, GROUP BY keeps a NULL
    group. Round-3 ADVICE: the reduce-side pandas groupby's default
    dropna=True silently dropped them after the exchange."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import agg, setops

    a = pd.DataFrame({"k": ["a", None, "b"]})
    b = pd.DataFrame({"k": ["b", "c", None]})
    u = setops.union_distinct(rd.from_pandas(a), rd.from_pandas(b),
                              ["k"]).to_pandas()
    want = duckdb.sql(
        "SELECT k FROM a UNION SELECT k FROM b").df()
    assert (sorted(u["k"].fillna("<NULL>")) == sorted(want["k"].fillna("<NULL>")))
    i = setops.intersect_distinct(rd.from_pandas(a), rd.from_pandas(b),
                                  ["k"]).to_pandas()
    assert sorted(i["k"].fillna("<NULL>")) == ["<NULL>", "b"]
    e = setops.except_distinct(rd.from_pandas(a), rd.from_pandas(b),
                               ["k"]).to_pandas()
    assert e["k"].tolist() == ["a"]

    # grouped sum / count-distinct / discrete quantile / pivot
    df = pd.DataFrame({"k": ["x", None, "x", None], "v": [1, 2, 3, 4]})
    s = agg.bucketed_groupby(rd.from_pandas(df), ["k"],
                             agg.sum_merge(["k"], ["v"])).to_pandas()
    assert ({(r["k"], r["v"]) for _, r in s.iterrows()}
            == {("x", 4), (None, 6)})
    ncd = agg.grouped_count_distinct(
        rd.from_pandas(pd.DataFrame({"k": ["x", None, None],
                                     "v": [1, 2, 3]})), ["k"], "v").to_pandas()
    assert len(ncd) == 2
    assert int(ncd.loc[ncd["k"].isna(), "n_distinct"].iloc[0]) == 2
    qd = agg.grouped_quantile_disc(
        rd.from_pandas(pd.DataFrame({"k": [None, None, "y"],
                                     "v": [10, 20, 5]})),
        ["k"], "v", {"p50": 0.5}).to_pandas()
    assert len(qd) == 2
    assert int(qd.loc[qd["k"].isna(), "p50"].iloc[0]) == 10
    pv = agg.pivot_count(
        rd.from_pandas(pd.DataFrame({"k": ["u", None, None],
                                     "p": ["a", "a", "b"]})),
        ["k"], "p", ["a", "b"]).to_pandas()
    assert len(pv) == 2
    nullrow = pv.loc[pv["k"].isna()]
    assert nullrow["a"].iloc[0] == 1 and nullrow["b"].iloc[0] == 1


def test_window_rank_null_source_matches_duckdb():
    """rank/dense_rank with NULL in the source column: NULLS LAST (DuckDB
    default), int64 output — round-3 ADVICE fixed the NaN-rank crash."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    df = pd.DataFrame({"k": ["g"] * 4 + ["h"] * 2,
                       "o": [1, 2, 3, 4, 1, 2],
                       "v": [5.0, np.nan, 5.0, 1.0, np.nan, 2.0]})
    got = keyed_window(
        rd.from_pandas(df), by="k", order=["o"],
        specs=[WindowSpec("rnk", "rank", src="v"),
               WindowSpec("drnk", "dense_rank", src="v")],
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, o,
               CAST(rank() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY k ORDER BY v) AS BIGINT)
                 AS drnk
        FROM df ORDER BY k, o""").df()
    assert got["rnk"].tolist() == want["rnk"].tolist()
    assert got["drnk"].tolist() == want["drnk"].tolist()
    assert str(got["rnk"].dtype) == "int64"


def test_left_outer_join_blocks_share_one_schema():
    """Round-3 ADVICE: a bucket where one side is empty used to emit
    all-None object columns that Arrow infers as null type, giving blocks
    with conflicting schemas. Every non-empty output block must now carry
    the declared types (string stays string, bool stays bool, nullable
    int -> float64)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import hash_inner_join

    left = rd.from_pandas(pd.DataFrame({
        "k": list(range(40)),
        "lv": [f"L{i}" for i in range(40)],
        "lb": [True] * 40}))
    right = rd.from_pandas(pd.DataFrame({
        "k": [0, 1], "rv": ["ra", "rb"], "ri": [10, 11],
        "rb": [False, True]}))
    for how in ("left", "outer"):
        out = hash_inner_join(left, right, "k", how=how, buckets=16)
        tabs = [ray.get(r) for r in out.to_arrow_refs()]
        schemas = {str(t.schema.remove_metadata())
                   for t in tabs if t.num_rows}
        assert len(schemas) == 1, schemas
        only = schemas.pop()
        assert "rv: string" in only and "rb: bool" in only \
            and "ri: double" in only
        df = pd.concat([t.to_pandas() for t in tabs])
        assert len(df) == 40
        assert df["rv"].notna().sum() == 2


def test_skew_aware_join_right_side_hot_key():
    """VERDICT #6: hot-key detection is now symmetric — a key hot only on
    the RIGHT side takes the mirrored broadcast plan and still matches the
    plain hash join, with the canonical left-major column order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        hash_inner_join,
        skew_aware_inner_join,
    )

    left = pd.DataFrame({"k": np.arange(100, dtype="int64"),
                         "lv": np.arange(100, dtype="int64")})
    right = pd.DataFrame({
        "k": np.concatenate([np.full(5000, 7), np.arange(10)]).astype("int64"),
        "rv": np.arange(5010, dtype="int64")})
    got = skew_aware_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(4), "k",
        hot_threshold=100).to_pandas()
    want = hash_inner_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(4), "k").to_pandas()
    assert list(got.columns) == ["k", "lv", "rv"]
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True))


def test_fast_content_hash_and_crc32c():
    """fast_content_hash_column: layout-independent, scheme lengths
    disjoint (24-hex dual-CRC for short rows, 32-hex sha256 for long),
    long rows byte-identical to sha256; crc32c matches the scalar
    table-driven reference."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import dedup
    from ai_knowledgegraph_extractor_ray.ops.hashing import (
        _CRC32C_TABLE,
        crc32c_column,
    )

    big = "Z" * 5000
    texts = ["aa", "bb", "aa", big, big, "cc", "", None, "d" * 64, "d" * 65]
    df = pd.DataFrame({"doc_id": range(len(texts)),
                       "text": pd.Series(texts, dtype=object)})
    h1 = (dedup.fast_content_hash_column(rd.from_pandas(df).repartition(1))
          .to_pandas().sort_values("doc_id")["content_hash"].tolist())
    h4 = (dedup.fast_content_hash_column(rd.from_pandas(df).repartition(4))
          .to_pandas().sort_values("doc_id")["content_hash"].tolist())
    assert h1 == h4
    assert h1[0] == h1[2] and h1[3] == h1[4]
    assert len(h1[0]) == 24 and len(h1[8]) == 24     # <=64B: dual-CRC
    assert len(h1[3]) == 32 and len(h1[9]) == 32     # >64B: sha256
    assert h1[3] == hashlib.sha256(big.encode()).hexdigest()[:32]
    assert h1[6] == h1[7]                            # None ≡ ""
    assert len(set(h1)) == 7

    # crc32c vs the byte-at-a-time scalar reference
    def scalar(b: bytes) -> int:
        c = 0xFFFFFFFF
        for byte in b:
            c = int(_CRC32C_TABLE[(c ^ byte) & 0xFF]) ^ (c >> 8)
        return c ^ 0xFFFFFFFF

    import pyarrow as pa
    vals = [b"", b"a", b"123456789", b"hello world", bytes(range(256))]
    got = crc32c_column(pa.array(vals, pa.binary())).tolist()
    assert got == [scalar(v) for v in vals]
    # known vector: crc32c("123456789") = 0xE3069283
    assert got[2] == 0xE3069283


def test_drop_pair_clusters_auto_selects_distributed():
    """VERDICT r3 #5: cluster_mode='auto' takes the distributed CC path
    when pairs exceed the budget, with survivors identical to the driver
    union-find on a planted multi-cluster corpus."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import dedup

    # 3 planted clusters x 30 members + 60 singletons
    texts, ids = [], []
    for c in range(3):
        base = f"cluster {c} " + " ".join(f"w{c}{i}" for i in range(30))
        for m in range(30):
            ids.append(c * 100 + m)
            texts.append(base + f" tail{m}")
    for s in range(60):
        ids.append(1000 + s)
        texts.append(f"singleton {s} " + " ".join(
            f"u{s}{i}" for i in range(20)))
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "text": pd.Series(texts, dtype="string")})).repartition(4)

    def survivors(**kw):
        out = dedup.near_dedup_minhash(ds, threshold=0.5, **kw).to_pandas()
        return sorted(out["doc_id"].tolist())

    drv = survivors(cluster_mode="driver")
    dist = survivors(cluster_mode="distributed")
    assert drv == dist
    # auto with a zero budget must take the distributed path (pairs > 0)
    pairs = dedup.minhash_candidate_pairs(ds, threshold=0.5)
    auto_forced = dedup.drop_pair_clusters(
        ds, pairs, cluster_mode="auto", driver_pairs_max=0).to_pandas()
    assert sorted(auto_forced["doc_id"].tolist()) == drv
    # plain auto (default budget) matches too
    assert survivors() == drv


def test_composite_key_join_and_semi_match_duckdb():
    """Round-4: multi-column equi-join keys in hash_inner_join and
    hash_semi_join (composite bucket key, tuple merge)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import (
        hash_inner_join,
        hash_semi_join,
    )

    rng = np.random.RandomState(4)
    left = pd.DataFrame({
        "a": rng.randint(0, 10, 200).astype("int64"),
        "b": rng.choice(["x", "y", "z"], 200),
        "lv": np.arange(200, dtype="int64")})
    right = pd.DataFrame({
        "a": rng.randint(0, 12, 60).astype("int64"),
        "b": rng.choice(["x", "y", "w"], 60),
        "rv": np.arange(60, dtype="int64")})
    right = right.drop_duplicates(["a", "b"]).reset_index(drop=True)

    ldf, rdf = left, right
    got = hash_inner_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right).repartition(2),
                          on=["a", "b"], buckets=8).to_pandas()
    want = duckdb.sql("SELECT l.a, l.b, l.lv, r.rv FROM ldf l "
                      "JOIN rdf r USING (a, b)").df()
    key = ["a", "b", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)

    semi = hash_semi_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right).repartition(2),
                          on=["a", "b"], buckets=8).to_pandas()
    want_s = duckdb.sql("SELECT * FROM ldf l WHERE EXISTS (SELECT 1 "
                        "FROM rdf r WHERE r.a = l.a AND r.b = l.b)").df()
    assert sorted(semi["lv"]) == sorted(want_s["lv"])
    anti = hash_semi_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right).repartition(2),
                          on=["a", "b"], anti=True, buckets=8).to_pandas()
    assert sorted(anti["lv"]) + sorted(semi["lv"]) and \
        len(anti) + len(semi) == len(left)


def test_window_percent_rank_cume_dist_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    rng = np.random.RandomState(9)
    df = pd.DataFrame({
        "k": rng.choice(["g", "h", "i"], 120),
        "o": np.arange(120, dtype="int64"),
        "v": rng.randint(0, 7, 120).astype("int64")})
    got = keyed_window(
        rd.from_pandas(df).repartition(3), by="k", order=["o"],
        specs=[WindowSpec("pr", "percent_rank", src="v"),
               WindowSpec("cd", "cume_dist", src="v")],
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, o, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        FROM df WINDOW w AS (PARTITION BY k ORDER BY v)
        ORDER BY k, o""").df()
    assert np.allclose(got["pr"], want["pr"])
    assert np.allclose(got["cd"], want["cd"])


def test_grouped_grouping_sets_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_grouping_sets

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), 500),
        "b": rng.choice(list("pq"), 500),
        "v": rng.randint(0, 50, 500).astype("int64")})
    partials = (rd.from_pandas(df).repartition(6)
                .map_batches(lambda d: d.groupby(["a", "b"], as_index=False)
                             .agg(n=("v", "size"), v=("v", "sum")),
                             batch_format="pandas"))
    # sets deliberately exclude the fine level (a,b) and include []
    got = grouped_grouping_sets(partials, ["a", "b"], ["n", "v"],
                                sets=[["a"], ["b"], []]).to_pandas()
    want = duckdb.connect().execute("""
        SELECT a, b, CAST(count(*) AS BIGINT) AS n, sum(v) AS v
        FROM df GROUP BY GROUPING SETS ((a), (b), ())""").df()

    def canon(d):
        d = d.copy()
        for c in ("a", "b"):
            d[c] = d[c].astype(object).where(d[c].notna(), "~").astype(str)
        return (d.astype({"n": "int64", "v": "int64"})
                .sort_values(["a", "b"]).reset_index(drop=True)
                [["a", "b", "n", "v"]])

    pd.testing.assert_frame_equal(canon(got), canon(want))

    # fine level requested explicitly must also come back
    got2 = grouped_grouping_sets(partials, ["a", "b"], ["n", "v"],
                                 sets=[["a", "b"], []]).to_pandas()
    want2 = duckdb.connect().execute("""
        SELECT a, b, CAST(count(*) AS BIGINT) AS n, sum(v) AS v
        FROM df GROUP BY GROUPING SETS ((a, b), ())""").df()
    pd.testing.assert_frame_equal(canon(got2), canon(want2))

    import pytest
    with pytest.raises(ValueError):
        grouped_grouping_sets(partials, ["a", "b"], ["n"], sets=[["zz"]])


def test_grouped_moments_exact_vs_duckdb_closed_formula():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_moments

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), 800),
        "c": rng.randint(-500, 500, 800).astype("int64")})
    got = (grouped_moments(rd.from_pandas(df).repartition(7), ["g"], "c")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH f AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(c) AS BIGINT) AS s,
                          CAST(sum(c * c) AS BIGINT) AS s2
                   FROM df GROUP BY g)
        SELECT g, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_pop
        FROM f ORDER BY g""").df()
    # bit-exact: same closed formula in the same float64 operation order
    assert list(got["n"]) == list(want["n"])
    assert list(got["mean"]) == list(want["mean"])
    assert list(got["var_pop"]) == list(want["var_pop"])
    assert np.array_equal(got["std_pop"].to_numpy(),
                          np.sqrt(want["var_pop"].to_numpy()))

    import pytest
    floats = rd.from_pandas(pd.DataFrame({"g": ["a"], "c": [1.5]}))
    with pytest.raises(Exception):
        grouped_moments(floats, ["g"], "c").to_pandas()


def test_funnel_stages_cascading_semantics():
    """A click BEFORE the user's first view must not advance the funnel;
    equal timestamps do. Cross-checked against the cascading-CTE SQL."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.events import funnel_stages

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # u1: full funnel in order -> stage 3
        (1, t0, "view"), (1, t0 + pd.Timedelta("1h"), "click"),
        (1, t0 + pd.Timedelta("2h"), "purchase"),
        # u2: click before first view -> stage 1 (purchase needs click)
        (2, t0, "click"), (2, t0 + pd.Timedelta("1h"), "view"),
        (2, t0 + pd.Timedelta("2h"), "purchase"),
        # u3: view+click same instant (>= counts) then nothing -> stage 2
        (3, t0, "view"), (3, t0, "click"),
        # u4: purchase only -> not in output (never reached stage 1)
        (4, t0, "purchase"),
        # u5: view, then a too-early purchase, then a valid click -> 2
        (5, t0, "purchase"), (5, t0 + pd.Timedelta("1h"), "view"),
        (5, t0 + pd.Timedelta("2h"), "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    got = (funnel_stages(rd.from_pandas(df).repartition(3),
                         user_col="user_id", ts_col="ts",
                         type_col="event_type",
                         stages=["view", "click", "purchase"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert list(got["user_id"]) == [1, 2, 3, 5]
    assert list(got["funnel_stage"]) == [3, 1, 2, 2]

    want = duckdb.connect().execute("""
        WITH v AS (SELECT user_id, min(ts) AS t1 FROM df
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t2
              FROM df e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.t1
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t3
              FROM df e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.t2
              GROUP BY e.user_id)
        SELECT v.user_id,
               CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         ELSE 1 END AS BIGINT) AS funnel_stage
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
        ORDER BY v.user_id""").df()
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["funnel_stage"]) == list(want["funnel_stage"])


def test_cohort_retention_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.events import cohort_retention

    rng = np.random.RandomState(13)
    n = 900
    df = pd.DataFrame({
        "user_id": rng.randint(0, 60, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.randint(0, 30 * 24 * 3600, n), unit="s")})
    got = (cohort_retention(rd.from_pandas(df).repartition(5),
                            user_col="user_id", ts_col="ts")
           .to_pandas().sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
                   FROM df GROUP BY user_id)
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE))
                    AS BIGINT) AS day_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM df e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(
        got[["cohort_day", "day_offset", "n_users"]].astype(
            {"day_offset": "int64", "n_users": "int64"}),
        want)


def test_components_table_string_graph():
    """Two multi-node components + an isolated self-referencing pair;
    component id must be the lexicographically smallest node id."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import components_table

    edges = pd.DataFrame({
        "canonical_src": ["e_b", "e_c", "e_x", "e_m", "e_q"],
        "canonical_dst": ["e_a", "e_b", "e_y", "e_a", "e_q"]})
    got = (components_table(rd.from_pandas(edges).repartition(2))
           .to_pandas().sort_values("node").reset_index(drop=True))
    comp = dict(zip(got["node"], got["component"]))
    # {a,b,c,m} connected; {x,y}; {q} self-loop
    assert comp == {"e_a": "e_a", "e_b": "e_a", "e_c": "e_a",
                    "e_m": "e_a", "e_q": "e_q",
                    "e_x": "e_x", "e_y": "e_x"}


def _write_tpch_mini(tmp_path):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(17)
    n_cust, n_ord, n_li = 40, 200, 900
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype="int64"),
        "c_mktsegment": rng.choice(
            ["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust),
        "c_name": [f"cust{i}" for i in range(n_cust)],
        "c_nationkey": rng.randint(0, 5, n_cust).astype("int64"),
        "c_acctbal": rng.uniform(0, 9999, n_cust).round(2)})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype="int64"),
        "o_custkey": rng.randint(0, n_cust, n_ord).astype("int64"),
        "o_orderdate": pd.Timestamp("1996-01-01")
        + pd.to_timedelta(rng.randint(0, 900, n_ord), unit="D"),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n_ord),
        "o_orderstatus": rng.choice(["F", "O"], n_ord),
        "o_totalprice": rng.uniform(100, 9999, n_ord).round(2)})
    li = pd.DataFrame({
        "l_orderkey": rng.randint(0, n_ord, n_li).astype("int64"),
        "l_quantity": rng.randint(1, 50, n_li).astype("float64"),
        "l_extendedprice": rng.uniform(100, 99999, n_li).round(2),
        "l_discount": (rng.randint(0, 11, n_li) / 100.0),
        "l_tax": (rng.randint(0, 9, n_li) / 100.0),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": pd.Timestamp("1996-01-01")
        + pd.to_timedelta(rng.randint(0, 1100, n_li), unit="D"),
        "l_suppkey": rng.randint(0, 12, n_li).astype("int64")})
    region = pd.DataFrame({
        "r_regionkey": np.arange(2, dtype="int64"),
        "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(5, dtype="int64"),
        "n_name": [f"NATION_{i}" for i in range(5)],
        "n_regionkey": np.array([0, 0, 0, 1, 1], dtype="int64")})
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(12, dtype="int64"),
        "s_name": [f"supp{i}" for i in range(12)],
        "s_nationkey": rng.randint(0, 5, 12).astype("int32"),
        "s_acctbal": rng.uniform(0, 9999, 12).round(2)})
    # additive extras for the Q9/Q11/Q12/Q21 adaptations — drawn from a
    # FRESH RandomState so the draw sequence above (and every test built
    # on it) is byte-identical to before these columns existed
    rng2 = np.random.RandomState(171)
    li["l_partkey"] = rng2.randint(0, 60, n_li).astype("int64")
    part = pd.DataFrame({
        "p_partkey": np.arange(60, dtype="int64"),
        "p_name": [("red widget %d" % i) if i % 3 == 0
                   else ("blue bolt %d" % i) for i in range(60)],
        "p_brand": [f"Brand#{1 + i % 3}" for i in range(60)],
        "p_size": rng2.randint(1, 50, 60).astype("int64"),
        "p_retailprice": rng2.uniform(100, 2000, 60).round(2)})
    for name, df in (("customer", cust), ("orders", orders),
                     ("lineitem", li), ("region", region),
                     ("nation", nation), ("supplier", supplier),
                     ("part", part)):
        df.to_parquet(tmp_path / f"{name}.parquet")
    return cust, orders, li


def test_tpch_q1_q3_match_duckdb(tmp_path):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        q_tpch_q1,
        q_tpch_q3,
    )

    cust, orders, li = _write_tpch_mini(tmp_path)
    con = duckdb.connect()
    con.register("customer", cust)
    con.register("orders", orders)
    con.register("lineitem", li)
    sql = entry.oracle_sql()

    got1 = (q_tpch_q1(str(tmp_path)).to_pandas()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    want1 = (con.execute(sql["tpch_q1"]).df()
             .sort_values(["l_returnflag", "l_linestatus"])
             .reset_index(drop=True))
    for c in ("sum_qty", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
              "count_order", "avg_qty", "avg_price_cents", "avg_disc_pct"):
        assert list(got1[c]) == list(want1[c]), c

    got3 = q_tpch_q3(str(tmp_path)).reset_index(drop=True)
    want3 = con.execute(sql["tpch_q3"]).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got3[["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_e4"]],
        want3.astype({"l_orderkey": "int64", "revenue_e4": "int64"}))


def test_grouped_corr_exact_vs_duckdb_closed_formula():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_corr

    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 700),
        "x": rng.randint(-100, 100, 700).astype("int64"),
        "y": rng.randint(0, 24, 700).astype("int64")})
    # a constant-y group: corr must be NaN (zero variance), cov 0
    df = pd.concat([df, pd.DataFrame({"g": ["z"] * 5,
                                      "x": np.arange(5, dtype="int64"),
                                      "y": np.int64(7)})], ignore_index=True)
    got = (grouped_corr(rd.from_pandas(df).repartition(6), ["g"], "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH f AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy,
                          CAST(sum(x*y) AS BIGINT) AS sxy,
                          CAST(sum(x*x) AS BIGINT) AS sx2,
                          CAST(sum(y*y) AS BIGINT) AS sy2
                   FROM df GROUP BY g)
        SELECT g, n,
               (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS cov_pop,
               (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE)
                         - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr
        FROM f ORDER BY g""").df()
    assert list(got["n"]) == list(want["n"])
    assert list(got["cov_pop"]) == list(want["cov_pop"])  # bit-exact
    gz = got.set_index("g"); wz = want.set_index("g")
    for g_ in "abc":
        assert gz.loc[g_, "corr"] == wz.loc[g_, "corr"]
    assert np.isnan(gz.loc["z", "corr"]) and np.isnan(wz.loc["z", "corr"])
    assert gz.loc["z", "cov_pop"] == 0.0

    import pytest
    floats = rd.from_pandas(pd.DataFrame(
        {"g": ["a"], "x": [1.5], "y": [1]}))
    with pytest.raises(Exception):
        grouped_corr(floats, ["g"], "x", "y").to_pandas()


def test_grouped_string_agg_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_string_agg

    rng = np.random.RandomState(29)
    n = 400
    df = pd.DataFrame({
        "u": rng.randint(0, 25, n).astype("int64"),
        "seq": np.arange(n, dtype="int64"),
        "ev": rng.choice(["a", "b", "c", "d"], n)})
    # shuffle row order so the engine's sort does the work
    df = df.sample(frac=1.0, random_state=rng).reset_index(drop=True)
    got = (grouped_string_agg(rd.from_pandas(df).repartition(5), ["u"],
                              "ev", ["seq"], sep=">")
           .to_pandas().sort_values("u").reset_index(drop=True))
    want = duckdb.connect().execute("""
        SELECT u, string_agg(ev, '>' ORDER BY seq) AS path
        FROM df GROUP BY u ORDER BY u""").df()
    assert list(got["u"]) == list(want["u"])
    assert list(got["path"]) == list(want["path"])


def test_grouped_mode_tiebreak_and_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_mode

    # planted tie: group 't' has values 3 and 5 both x4 -> winner 3
    rng = np.random.RandomState(31)
    base = pd.DataFrame({
        "g": rng.choice(list("ab"), 300),
        "v": rng.randint(0, 9, 300).astype("int64")})
    tie = pd.DataFrame({"g": ["t"] * 8,
                        "v": np.array([3, 5] * 4, dtype="int64")})
    df = pd.concat([base, tie], ignore_index=True)
    got = (grouped_mode(rd.from_pandas(df).repartition(5), ["g"], "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
                   FROM df GROUP BY 1, 2)
        SELECT g, v, n FROM (
            SELECT *, row_number() OVER (PARTITION BY g
                                         ORDER BY n DESC, v ASC) AS rn
            FROM c) WHERE rn = 1 ORDER BY g""").df()
    assert list(got["g"]) == list(want["g"])
    assert list(got["v"]) == list(want["v"].astype("int64"))
    assert list(got["n"]) == list(want["n"])
    assert got.set_index("g").loc["t", "v"] == 3


def test_first_last_value_window_kinds():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    rng = np.random.RandomState(37)
    df = pd.DataFrame({
        "k": rng.choice(["g", "h", "i"], 150),
        "o": rng.permutation(150).astype("int64"),
        "v": rng.randint(0, 99, 150).astype("int64")})
    got = keyed_window(
        rd.from_pandas(df).repartition(4), by="k", order=["o"],
        specs=[WindowSpec("fv", "first_value", src="v"),
               WindowSpec("lv", "last_value", src="v")],
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, o,
               first_value(v) OVER w AS fv,
               last_value(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS lv
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o)
        ORDER BY k, o""").df()
    assert list(got["fv"]) == list(want["fv"].astype("int64"))
    assert list(got["lv"]) == list(want["lv"].astype("int64"))


def test_vocab_encode_lexicographic_and_nulls():
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sampling import vocab_encode

    df = pd.DataFrame({"k": list(range(7)),
                       "c": ["m", "a", None, "z", "a", "m", "b"]})
    got = (vocab_encode(rd.from_pandas(df).repartition(3), "c")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # lexicographic ids from 1: a=1, b=2, m=3, z=4; NULL stays NULL
    want = [3, 1, None, 4, 1, 3, 2]
    assert [None if pd.isna(v) else int(v) for v in got["c_id"]] == want


def test_auto_inner_join_dispatches_both_plans():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.joins import auto_inner_join

    rng = np.random.RandomState(41)
    left = pd.DataFrame({"k": rng.randint(0, 50, 500).astype("int64"),
                         "x": np.arange(500, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(50, dtype="int64"),
                          "y": rng.randint(0, 9, 50).astype("int64")})
    want = (left.merge(right, on="k").sort_values(["x"])
            .reset_index(drop=True))

    got_b = auto_inner_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(2), "k")
    assert auto_inner_join.last_plan == "broadcast"
    got_b = (got_b.to_pandas().sort_values(["x"]).reset_index(drop=True)
             [["k", "x", "y"]].astype("int64"))
    pd.testing.assert_frame_equal(got_b, want[["k", "x", "y"]])

    got_s = auto_inner_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(2), "k",
                            broadcast_max_bytes=1)
    assert auto_inner_join.last_plan == "shuffle"
    got_s = (got_s.to_pandas().sort_values(["x"]).reset_index(drop=True)
             [["k", "x", "y"]].astype("int64"))
    pd.testing.assert_frame_equal(got_s, want[["k", "x", "y"]])


def test_round4_ops_empty_input():
    """Every round-4 grouped op must return an empty, well-typed result
    on an empty input instead of crashing mid-merge."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_corr,
        grouped_mode,
        grouped_moments,
        grouped_string_agg,
    )
    from ai_knowledgegraph_extractor_ray.ops.events import (
        cohort_retention,
        funnel_stages,
    )

    empty = pd.DataFrame({
        "u": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "et": pd.Series(dtype="string"),
        "v": pd.Series(dtype="int64")})
    ds = rd.from_pandas(empty)

    assert funnel_stages(ds, user_col="u", ts_col="ts", type_col="et",
                         stages=["a", "b"]).count() == 0
    assert cohort_retention(ds, user_col="u", ts_col="ts").count() == 0
    assert grouped_moments(ds, ["et"], "v").count() == 0
    assert grouped_corr(ds, ["et"], "u", "v").count() == 0
    assert grouped_mode(ds, ["et"], "v").count() == 0
    assert grouped_string_agg(ds, ["u"], "et", ["ts"]).count() == 0


def test_grouped_string_agg_distinct_cross_block():
    """collect-set: duplicates of (key, value) arriving in DIFFERENT
    blocks must still collapse (merge-side dedup, not just per-block)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_string_agg

    df = pd.DataFrame({"u": [1, 1, 1, 2, 2, 1],
                       "v": ["b", "a", "b", "c", "c", "a"]})
    # repartition(6) puts ~1 row per block -> every duplicate pair is
    # cross-block
    got = (grouped_string_agg(rd.from_pandas(df).repartition(6), ["u"],
                              "v", ["v"], sep=",", distinct=True)
           .to_pandas().sort_values("u").reset_index(drop=True))
    want = duckdb.connect().execute("""
        SELECT u, string_agg(DISTINCT v, ',' ORDER BY v) AS path
        FROM df GROUP BY u ORDER BY u""").df()
    assert list(got["u"]) == list(want["u"])
    assert list(got["path"]) == list(want["path"])


def test_tpch_q5_q6_match_duckdb(tmp_path):
    """Q5 (auto-planned 6-table star join) and Q6 (pruned-scan combiner)
    must bit-match DuckDB running the registered oracle SQL on the same
    synthetic tables — including the c_nationkey = s_nationkey locality
    predicate applied after the orderkey exchange."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        q_tpch_q5,
        q_tpch_q6,
    )

    _write_tpch_mini(tmp_path)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        con.execute(
            f"CREATE VIEW {t} AS FROM '{tmp_path}/{t}.parquet'")
    sql = entry.oracle_sql()

    got5 = q_tpch_q5(str(tmp_path)).reset_index(drop=True)
    want5 = con.execute(sql["tpch_q5"]).df().reset_index(drop=True)
    assert len(want5) > 0, "fixture must produce ASIA revenue rows"
    pd.testing.assert_frame_equal(
        got5.sort_values(["revenue_e4", "n_name"],
                         ascending=[False, True]).reset_index(drop=True),
        want5.sort_values(["revenue_e4", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
        .astype({"revenue_e4": "int64"}))

    got6 = q_tpch_q6(str(tmp_path))
    want6 = con.execute(sql["tpch_q6"]).df()
    assert int(want6["revenue_e4"][0]) > 0
    assert int(got6["revenue_e4"][0]) == int(want6["revenue_e4"][0])


def test_grouped_top_n_cross_block_and_ties():
    """Candidates for one key arriving in DIFFERENT blocks must be
    re-ranked globally in the merge; ties on value break by tie_cols
    ascending, and rn is a dense 1..n per key."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_top_n

    a = pd.DataFrame({"k": ["u1", "u1", "u2"], "v": [5, 9, 7],
                      "id": ["a", "b", "c"]})
    b = pd.DataFrame({"k": ["u1", "u1", "u2"], "v": [9, 8, 1],
                      "id": ["a0", "d", "e"]})
    ds = rd.from_pandas([a, b])  # two blocks
    out = (grouped_top_n(ds, ["k"], "v", n=2, tie_cols=["id"], buckets=2)
           .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True))
    # u1 top2 across blocks: v=9 id=a0 (tie a0<b), then v=9 id=b
    assert list(out[out["k"] == "u1"]["id"]) == ["a0", "b"]
    assert list(out[out["k"] == "u1"]["rn"]) == [1, 2]
    assert list(out[out["k"] == "u2"]["id"]) == ["c", "e"]
    # ascending=True flips to bottom-n
    low = (grouped_top_n(ds, ["k"], "v", n=1, tie_cols=["id"],
                         ascending=True, buckets=2).to_pandas())
    assert list(low[low["k"] == "u1"]["v"]) == [5]


def test_grouped_regression_matches_polyfit():
    """Exact-sums regression must agree with numpy lstsq per group and
    produce NaN slope for a zero-x-variance group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import grouped_regression

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 200),
        "x": rng.randint(0, 24, 400).astype("int64"),
        "y": rng.randint(-50, 500, 400).astype("int64")})
    flat = pd.DataFrame({"g": ["c"] * 5, "x": np.int64(3),
                         "y": np.arange(5, dtype="int64")})
    ds = rd.from_pandas([df.iloc[:150], df.iloc[150:], flat])
    out = (grouped_regression(ds, ["g"], "x", "y", buckets=2)
           .to_pandas().set_index("g"))
    for g in ("a", "b"):
        sub = df[df["g"] == g]
        slope, intercept = np.polyfit(sub["x"], sub["y"], 1)
        assert abs(out.loc[g, "slope"] - slope) < 1e-9
        assert abs(out.loc[g, "intercept"] - intercept) < 1e-9
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(out.loc[g, "r2"] - r * r) < 1e-9
    assert np.isnan(out.loc["c", "slope"])
    assert out.loc["c", "n"] == 5


def test_range_sort_global_order_and_ranks():
    """Sample-sort: output blocks must concatenate into the exact global
    order; rn must be the dense 1..N total-order rank for ascending,
    descending, and string-primary inputs; empty input yields an empty
    dataset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sort import (
        global_row_number,
        range_sort,
    )

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "v": rng.randint(0, 40, 500).astype("int64"),   # heavy ties
        "id": [f"r{i:04d}" for i in rng.permutation(500)]})
    ds = rd.from_pandas([df.iloc[:200], df.iloc[200:350], df.iloc[350:]])

    out = (global_row_number(ds, ["v", "id"], num_partitions=5)
           .to_pandas())
    want = (df.sort_values(["v", "id"], kind="mergesort")
            .reset_index(drop=True))
    got_in_block_order = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_in_block_order[["v", "id"]], want)          # global block order
    assert list(out["rn"]) == list(range(1, 501))        # dense ranks

    desc = (global_row_number(ds, ["v", "id"], ascending=[False, True],
                              num_partitions=4).to_pandas())
    want_d = (df.sort_values(["v", "id"], ascending=[False, True],
                             kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        desc[["v", "id"]].reset_index(drop=True), want_d)
    assert list(desc["rn"]) == list(range(1, 501))

    s = range_sort(rd.from_pandas([df.iloc[:100]]), ["id"],
                   num_partitions=3).to_pandas()
    assert list(s["id"]) == sorted(df.iloc[:100]["id"])  # string primary

    empty = rd.from_pandas([df.iloc[:0]])
    assert global_row_number(empty, ["v"]).count() == 0


def test_triangle_count_known_graph():
    """Planted graph: K4 (4 triangles... K4 has 4 triangles), one extra
    triangle sharing a vertex, duplicate/reversed/self-loop edges that
    must not change the count, split across blocks."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import triangle_count

    # K4 on a,b,c,d -> C(4,3)=4 triangles; plus triangle d,e,f -> 1
    e1 = pd.DataFrame({"canonical_src": ["a", "a", "a", "b", "b", "c"],
                       "canonical_dst": ["b", "c", "d", "c", "d", "d"]})
    e2 = pd.DataFrame({"canonical_src": ["d", "e", "f", "b", "c", "x"],
                       "canonical_dst": ["e", "f", "d", "a", "b", "x"]})
    # e2 carries: the d-e-f triangle, a REVERSED duplicate (b->a), an
    # exact duplicate (c->b), and a self-loop (x->x)
    out = triangle_count(rd.from_pandas([e1, e2]), buckets=3)
    assert int(out["triangles"][0]) == 5

    none = triangle_count(rd.from_pandas([pd.DataFrame(
        {"canonical_src": ["p", "q"], "canonical_dst": ["q", "r"]})]),
        buckets=2)
    assert int(none["triangles"][0]) == 0


def test_local_clustering_known_graph():
    """K4 + pendant: inside K4 every node has coeff 1.0; a pendant node
    (degree 1) reports 0 triangles and coeff 0; a bridge vertex gets the
    mixed coefficient."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import local_clustering

    e = pd.DataFrame({
        "canonical_src": ["a", "a", "a", "b", "b", "c", "d"],
        "canonical_dst": ["b", "c", "d", "c", "d", "d", "p"]})
    out = (local_clustering(rd.from_pandas([e.iloc[:4], e.iloc[4:]]),
                            buckets=3)
           .to_pandas().set_index("node"))
    for n in ("a", "b", "c"):
        assert out.loc[n, "degree"] == 3
        assert out.loc[n, "triangles"] == 3
        assert abs(out.loc[n, "coeff"] - 1.0) < 1e-12
    # d: degree 4 (K4 + pendant), still 3 triangles -> 2*3/(4*3) = 0.5
    assert out.loc["d", "degree"] == 4
    assert out.loc["d", "triangles"] == 3
    assert abs(out.loc["d", "coeff"] - 0.5) < 1e-12
    assert out.loc["p", "degree"] == 1
    assert out.loc["p", "triangles"] == 0
    assert out.loc["p", "coeff"] == 0.0


def test_weighted_reservoir_topk_properties():
    """A-Res reservoir: deterministic across block layouts, k rows
    exactly, zero/negative-weight rows never selected, and heavier rows
    are selected far more often (statistical sanity at 20x weight)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sampling import (
        weighted_reservoir_topk,
    )

    n = 2000
    df = pd.DataFrame({
        "id": [f"d{i:05d}" for i in range(n)],
        "w": np.where(np.arange(n) % 10 == 0, 20.0, 1.0),
        "junk": np.arange(n)})
    df.loc[5, "w"] = 0.0
    df.loc[6, "w"] = -3.0

    one = weighted_reservoir_topk(rd.from_pandas([df]), id_col="id",
                                  weight_col="w", k=100)
    many = weighted_reservoir_topk(
        rd.from_pandas([df.iloc[:700], df.iloc[700:900], df.iloc[900:]]),
        id_col="id", weight_col="w", k=100)
    assert list(one["id"]) == list(many["id"])     # layout-independent
    assert len(one) == 100
    assert "d00005" not in set(one["id"])          # w = 0
    assert "d00006" not in set(one["id"])          # w < 0
    heavy = sum(1 for i in one["id"] if int(i[1:]) % 10 == 0)
    # 10% of rows carry 20x weight ~ 69% of total mass; expect them to
    # dominate the sample (loose bound, deterministic given the hash)
    assert heavy > 40

    small = weighted_reservoir_topk(rd.from_pandas([df.iloc[:3]]),
                                    id_col="id", weight_col="w", k=100)
    assert len(small) == 3                          # k > population


def test_keyed_share_cross_block_and_zero_total():
    """Partition totals must aggregate across blocks; shares sum to 1
    per key; a zero-total key yields share 0.0 rather than inf/NaN."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import keyed_share

    a = pd.DataFrame({"k": ["u1", "u2", "u3"], "v": [3, 5, 0]})
    b = pd.DataFrame({"k": ["u1", "u2", "u3"], "v": [1, 5, 0]})
    out = (keyed_share(rd.from_pandas([a, b]), by="k", value_col="v",
                       buckets=2).to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    assert list(out[out["k"] == "u1"]["total"]) == [4, 4]
    assert list(out[out["k"] == "u1"]["share"]) == [0.25, 0.75]
    assert list(out[out["k"] == "u2"]["share"]) == [0.5, 0.5]
    assert list(out[out["k"] == "u3"]["share"]) == [0.0, 0.0]
    assert np.isfinite(out["share"]).all()


def test_ewma_window_matches_pandas_and_validates_alpha():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"k": np.repeat(["a", "b"], 50),
                       "o": np.tile(np.arange(50), 2),
                       "x": rng.randint(0, 100, 100).astype("int64")})
    out = (keyed_window(rd.from_pandas([df.iloc[:60], df.iloc[60:]]),
                        by="k", order=["o"],
                        specs=[WindowSpec("s", "ewma", src="x", alpha=0.3)],
                        buckets=2)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = (df.sort_values(["k", "o"]).groupby("k")["x"]
            .transform(lambda x: x.ewm(alpha=0.3, adjust=False).mean())
            .reset_index(drop=True))
    assert np.allclose(out["s"].to_numpy(), want.to_numpy())

    with pytest.raises(ValueError, match="alpha"):
        keyed_window(rd.from_pandas([df]), by="k", order=["o"],
                     specs=[WindowSpec("s", "ewma", src="x")])


def test_tpch_q10_q18_match_duckdb(tmp_path):
    """Q10 (returned-item revenue, 4-table join + top-20) and Q18
    (HAVING sum(qty) join-back) against DuckDB on the mini fixture.
    The fixture's quantities are small, so Q18's threshold is lowered
    via monkeypatched SQL comparison — instead we assert directly on a
    DuckDB run with the same 250 threshold (both may be empty-safe)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        q_tpch_q10,
        q_tpch_q18,
    )

    _write_tpch_mini(tmp_path)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS FROM '{tmp_path}/{t}.parquet'")
    sql = entry.oracle_sql()

    got10 = q_tpch_q10(str(tmp_path)).reset_index(drop=True)
    want10 = con.execute(sql["tpch_q10"]).df().reset_index(drop=True)
    assert len(want10) > 0
    pd.testing.assert_frame_equal(
        got10[list(want10.columns)],
        want10.astype({"c_custkey": "int64", "acctbal_cents": "int64",
                       "revenue_e4": "int64"}))

    got18 = q_tpch_q18(str(tmp_path)).reset_index(drop=True)
    want18 = con.execute(sql["tpch_q18"]).df().reset_index(drop=True)
    assert len(got18) == len(want18)
    if len(want18):
        pd.testing.assert_frame_equal(
            got18[list(want18.columns)],
            want18.astype({"c_custkey": "int64", "o_orderkey": "int64",
                           "totalprice_cents": "int64",
                           "sum_qty": "int64"}))


def test_range_sort_property_fuzz():
    """Hypothesis-style fuzz (fixed seeds, no flaky draws): random int
    keys with random tie density, random block splits and partition
    counts must always reproduce the pandas total order with dense
    ranks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sort import global_row_number

    for seed in (1, 7, 23):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(50, 2000))
        vals = rng.randint(0, max(2, n // int(rng.randint(1, 20))), n)
        df = pd.DataFrame({"v": vals.astype("int64"),
                           "id": rng.permutation(n).astype("int64")})
        cuts = np.sort(rng.choice(np.arange(1, n), size=min(3, n - 1),
                                  replace=False))
        frames = [x for x in np.split(df, cuts) if len(x)]
        asc = bool(rng.randint(0, 2))
        out = global_row_number(
            rd.from_pandas(frames), ["v", "id"], ascending=asc,
            num_partitions=int(rng.randint(1, 9))).to_pandas()
        want = (df.sort_values(["v", "id"], ascending=asc,
                               kind="mergesort").reset_index(drop=True))
        pd.testing.assert_frame_equal(out[["v", "id"]], want)
        assert list(out["rn"]) == list(range(1, n + 1))


def test_rolling_window_kinds_match_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame({"k": np.repeat(["a", "b", "c"], 40),
                       "o": np.tile(np.arange(40), 3),
                       "x": rng.randint(-50, 50, 120).astype("int64")})
    out = (keyed_window(rd.from_pandas([df.iloc[:70], df.iloc[70:]]),
                        by="k", order=["o"],
                        specs=[WindowSpec("mn", "rolling_min", src="x",
                                          param=3),
                               WindowSpec("mx", "rolling_max", src="x",
                                          param=3),
                               WindowSpec("me", "rolling_mean", src="x",
                                          param=3)],
                        buckets=2)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    base = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = base.groupby("k")["x"]
    assert list(out["mn"]) == list(
        g.rolling(3, min_periods=1).min().reset_index(drop=True)
        .astype("int64"))
    assert list(out["mx"]) == list(
        g.rolling(3, min_periods=1).max().reset_index(drop=True)
        .astype("int64"))
    assert np.allclose(out["me"], g.rolling(3, min_periods=1).mean()
                       .reset_index(drop=True))
    assert out["mn"].dtype == np.int64 and out["mx"].dtype == np.int64


def test_round4_session_ops_empty_inputs():
    """Every op added this session must return a typed empty (or
    zero-count) result on empty input instead of crashing."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_regression,
        grouped_top_n,
    )
    from ai_knowledgegraph_extractor_ray.ops.graph import (
        local_clustering,
        triangle_count,
    )
    from ai_knowledgegraph_extractor_ray.ops.sampling import (
        weighted_reservoir_topk,
    )
    from ai_knowledgegraph_extractor_ray.ops.window import keyed_share

    empty_e = rd.from_pandas([pd.DataFrame(
        {"canonical_src": pd.Series([], dtype=str),
         "canonical_dst": pd.Series([], dtype=str)})])
    assert int(triangle_count(empty_e, buckets=2)["triangles"][0]) == 0
    assert local_clustering(empty_e, buckets=2).count() == 0

    empty_kv = rd.from_pandas([pd.DataFrame(
        {"k": pd.Series([], dtype=str),
         "v": pd.Series([], dtype="int64")})])
    assert keyed_share(empty_kv, by="k", value_col="v",
                       buckets=2).count() == 0
    assert grouped_top_n(empty_kv, ["k"], "v", n=3, buckets=2).count() == 0

    empty_xy = rd.from_pandas([pd.DataFrame(
        {"k": pd.Series([], dtype=str),
         "x": pd.Series([], dtype="int64"),
         "y": pd.Series([], dtype="int64")})])
    assert grouped_regression(empty_xy, ["k"], "x", "y",
                              buckets=2).count() == 0

    empty_w = rd.from_pandas([pd.DataFrame(
        {"id": pd.Series([], dtype=str),
         "w": pd.Series([], dtype="float64")})])
    assert len(weighted_reservoir_topk(empty_w, id_col="id",
                                       weight_col="w", k=5)) == 0


def test_review_fixes_window_nulls_nan_sort_alpha():
    """Round-4 review regressions: (1) a NULL partition key forms a
    window group (SQL parity) instead of NaN outputs; (2) range_sort
    rejects NaN primary keys loudly; (3) ewma accepts alpha=1 (int)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.sort import range_sort
    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    df = pd.DataFrame({"k": ["a", "a", None, None],
                       "o": [1, 2, 1, 2],
                       "x": np.array([10, 20, 5, 7], dtype="int64")})
    out = (keyed_window(rd.from_pandas([df]), by="k", order=["o"],
                        specs=[WindowSpec("rn", "row_number"),
                               WindowSpec("cs", "cum_sum", src="x"),
                               WindowSpec("rs", "rolling_sum", src="x",
                                          param=2)],
                        buckets=2).to_pandas())
    nulls = out[out["k"].isna()].sort_values("o")
    assert list(nulls["rn"]) == [1, 2]          # its own window
    assert list(nulls["cs"]) == [5, 12]
    assert list(nulls["rs"]) == [5, 12]

    bad = rd.from_pandas([pd.DataFrame(
        {"v": [1.0, float("nan"), 3.0], "id": [1, 2, 3]})])
    # (Arrow may surface the NaN as a null depending on conversion —
    # either way the sort must refuse, not misorder)
    with pytest.raises(Exception, match="NaN|null"):
        range_sort(bad, ["v", "id"], num_partitions=2).materialize()

    ok = keyed_window(rd.from_pandas([df.dropna()]), by="k", order=["o"],
                      specs=[WindowSpec("e", "ewma", src="x", alpha=1)],
                      buckets=1).to_pandas()
    assert list(ok["e"]) == [10.0, 20.0]        # alpha=1: y_t = x_t


def test_profile_numeric_nulls_and_merge():
    """Column profile: null counting, cross-block min/max/mean, all-null
    column reports NaN stats."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import profile_numeric

    a = pd.DataFrame({"x": [1.0, None, 5.0], "y": [None, None, None],
                      "z": [2, 4, 6]})
    b = pd.DataFrame({"x": [9.0, 3.0, None], "y": [None] * 3,
                      "z": [8, 10, 0]})
    out = (profile_numeric(rd.from_pandas([a, b]), ["x", "y", "z"])
           .set_index("col"))
    assert out.loc["x", "n"] == 6 and out.loc["x", "nulls"] == 2
    assert out.loc["x", "min_v"] == 1.0 and out.loc["x", "max_v"] == 9.0
    assert abs(out.loc["x", "avg_v"] - 4.5) < 1e-12
    assert out.loc["y", "nulls"] == 6 and np.isnan(out.loc["y", "avg_v"])
    assert out.loc["z", "nulls"] == 0 and out.loc["z", "max_v"] == 10.0


def test_phash_near_dups_planted_and_invariance():
    """pHash: a one-pixel perturbation stays within Hamming 3 (found by
    the banded pairs op); distinct random images stay far apart; the
    hash is invariant to a lossless re-encode of identical pixels."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops import multimodal as mm
    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        q_image_near_dups,
    )

    pairs = q_image_near_dups("unused").to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    media = (mm.synthetic_media(n_items=24, real_payloads=True)
             .to_pandas().sort_values("item_id").reset_index(drop=True))
    imgs = media[media["media_type"] == "image"].reset_index(drop=True)
    planted = {(int(imgs.iloc[i]["item_id"]),
                int(imgs.iloc[i]["item_id"]) + 1000)
               for i in range(4)
               if bytes(imgs.iloc[i]["payload"]).startswith(mm.PNG_MAGIC)}
    assert planted and planted <= got          # full planted recall
    assert (pairs["hamming"] <= 3).all()

    px = mm.decode_png(bytes(imgs.iloc[0]["payload"]))
    assert mm.phash64(px) == mm.phash64(
        mm.decode_png(mm.encode_png(px)))      # re-encode invariance


def test_grouped_zscore_outliers_planted():
    """A planted far-out value is flagged with the right z; zero-variance
    groups emit nothing; in-band values don't leak through."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_zscore_outliers,
    )

    base = pd.DataFrame({"k": ["a"] * 100, "id": range(100),
                         "v": np.int64(10)})
    base.loc[0, "v"] = 1000                     # far outlier
    base.loc[1, "v"] = 12                       # in-band wiggle
    flat = pd.DataFrame({"k": ["c"] * 5, "id": range(100, 105),
                         "v": np.int64(7)})     # zero variance
    ds = rd.from_pandas([base.iloc[:50], base.iloc[50:], flat])
    out = (grouped_zscore_outliers(ds, ["k"], "v", threshold=3.0,
                                   buckets=2).to_pandas())
    assert set(out["id"]) == {0}
    assert out["z"].iloc[0] > 9                 # ~9.9 sigma
    assert not (out["k"] == "c").any()


def test_audio_fingerprint_near_dups_planted():
    """Spectral fingerprint: planted low-noise copies collide at
    Hamming <= 3 (all four recovered); the fingerprint distinguishes
    tones an octave apart; noise-only clips hash to a stable value."""
    import numpy as np

    from ai_knowledgegraph_extractor_ray.ops import multimodal as mm
    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        q_audio_near_dups,
    )

    pairs = q_audio_near_dups("unused").to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    planted = {(i, i + 1000) for i in range(4)}
    assert planted <= got
    assert (pairs["hamming"] <= 3).all()

    sr = 16000
    t = np.arange(sr) / sr
    low = mm.afp64(np.sin(2 * np.pi * 220 * t).astype(np.float32), sr)
    high = mm.afp64(np.sin(2 * np.pi * 880 * t).astype(np.float32), sr)
    d = bin(low ^ high).count("1")
    assert d > 3                                # octaves apart differ


def test_k_hop_neighbors_bfs_semantics():
    """BFS: shortest hop wins (a node reachable at 1 and 2 reports 1);
    direction is ignored; k bounds the expansion; seed reports hop 0."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.graph import k_hop_neighbors

    # s-a, a-b, b-c (chain), s-b reverse edge (shortcut), d isolated
    e = pd.DataFrame({
        "canonical_src": ["s", "a", "b", "b", "d"],
        "canonical_dst": ["a", "b", "c", "s", "d"]})
    out = k_hop_neighbors(rd.from_pandas([e.iloc[:3], e.iloc[3:]]),
                          seed="s", k=2).set_index("node")["hop"]
    assert out["s"] == 0
    assert out["a"] == 1
    assert out["b"] == 1           # via the reverse edge, not 2
    assert out["c"] == 2
    assert "d" not in out.index
    one = k_hop_neighbors(rd.from_pandas([e]), seed="s", k=1)
    assert set(one["node"]) == {"s", "a", "b"}


def test_bag_set_ops_multiplicity():
    """INTERSECT ALL keeps min multiplicity, EXCEPT ALL the positive
    difference; cross-block counts combine; distinct variants unchanged."""
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.setops import (
        except_all,
        intersect_all,
    )

    l1 = pd.DataFrame({"k": ["a", "a", "a", "b", "c"]})
    l2 = pd.DataFrame({"k": ["a", "b"]})          # a x4, b x2, c x1 total
    r = pd.DataFrame({"k": ["a", "a", "b", "d"]})  # a x2, b x1, d x1
    L = rd.from_pandas([l1, l2])
    R = rd.from_pandas([r])

    ia = (intersect_all(L, R, ["k"], buckets=2).to_pandas()["k"]
          .value_counts().to_dict())
    assert ia == {"a": 2, "b": 1}                  # min multiplicities
    ea = (except_all(L, R, ["k"], buckets=2).to_pandas()["k"]
          .value_counts().to_dict())
    assert ea == {"a": 2, "b": 1, "c": 1}          # (cl - cr)+


def test_pmi_pairs_known_counts():
    """PMI from known co-occurrence counts: always-together items get
    positive PMI = ln(N/1...), independent-ish items lower; duplicate
    (group, item) rows and cross-block groups must not inflate counts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.agg import pmi_pairs

    rows = []
    for g in range(8):
        rows.append({"g": g, "i": "x"})
        rows.append({"g": g, "i": "x"})        # duplicate must collapse
        rows.append({"g": g, "i": "y"})        # x,y always together
        if g < 2:
            rows.append({"g": g, "i": "z"})    # z rare
    df = pd.DataFrame(rows)
    out = (pmi_pairs(rd.from_pandas([df.iloc[:9], df.iloc[9:]]),
                     "g", "i", min_pair=2, buckets=2)
           .to_pandas().set_index(["la", "lb"]))
    # c_x = c_y = 8, c_xy = 8, N = 8 -> pmi = ln(8*8/(8*8)) = 0
    assert abs(out.loc[("x", "y"), "pmi"] - 0.0) < 1e-12
    assert out.loc[("x", "y"), "cab"] == 8
    # c_z = 2, c_xz = 2 -> pmi = ln(8*2/(8*2)) = 0... use y,z same; check
    # a filtered pair: min_pair=2 keeps (x,z) with cab=2
    assert out.loc[("x", "z"), "cab"] == 2
    assert abs(out.loc[("x", "z"), "pmi"]) < 1e-12


def test_json_extract_columns_semantics():
    """Missing path / JSON null / failed cast / malformed doc / row null
    all yield NULL; nested paths and every dtype work; clashing output
    names and bad paths are rejected."""
    from ai_knowledgegraph_extractor_ray.ops.jsonops import (
        json_extract_columns)

    docs = ['{"k": 69, "f": 1.5, "b": true, "s": "hi", "a": {"b": 7}}',
            '{"k": null}', '{"k": "notanint"}', 'not json', None,
            '{"other": 1}']
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)),
                                      "props": docs}))
    out = json_extract_columns(ds, "props", {
        "k": ("$.k", "int64"), "f": ("$.f", "float64"),
        "b": ("$.b", "bool"), "s": ("$.s", "string"),
        "ab": ("$.a.b", "int64"), "miss": ("$.zzz", "string"),
    }).to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert out["k"].tolist()[0] == 69
    assert out["k"].isna().tolist() == [False, True, True, True, True, True]
    assert out["f"].iloc[0] == 1.5 and np.isnan(out["f"].iloc[1])
    assert bool(out["b"].iloc[0]) is True
    assert out["s"].iloc[0] == "hi" and pd.isna(out["s"].iloc[1])
    assert out["ab"].tolist()[0] == 7 and out["ab"].isna().iloc[1]
    assert out["miss"].isna().all()

    # int64 exactness above 2^53 must survive a null in the same block
    big = 9007199254740993
    ds2 = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "props": ['{"k": %d}' % big, '{"x": 1}',
                  '{"k": 1.5}', '{"b": "maybe"}']}))
    o2 = json_extract_columns(ds2, "props", {
        "k": ("$.k", "int64"), "b": ("$.b", "bool"),
    }).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert o2["k"].iloc[0] == big            # no float64 round-trip
    assert o2["k"].isna().tolist() == [False, True, True, True]  # '1.5' strict
    assert o2["b"].isna().all()              # non-true/false -> NULL

    with pytest.raises(ValueError, match="dtype"):
        json_extract_columns(ds, "props", {"x": ("$.k", "int32")})
    with pytest.raises(ValueError, match="path"):
        json_extract_columns(ds, "props", {"x": ("k", "int64")})
    with pytest.raises(ValueError, match="already exist"):
        json_extract_columns(ds, "props", {"doc_id": ("$.k", "int64")})


def test_json_extract_stdlib_fallback_matches():
    """The no-polars fallback path returns the same values as the
    vectorized path on the same tricky block."""
    from ai_knowledgegraph_extractor_ray.ops import jsonops

    docs = ['{"k": 69, "b": true, "s": "hi", "a": {"b": 7}}',
            '{"k": null}', '{"k": "x"}', 'not json', None,
            '{"k": 9007199254740993, "b": "maybe"}', '{"k": 1.5}']
    df = pd.DataFrame({"props": docs})
    fields = {"k": ("$.k", "int64"), "b": ("$.b", "bool"),
              "s": ("$.s", "string"), "ab": ("$.a.b", "int64")}
    fast = jsonops._extract_block(df.copy(), "props", dict(fields))
    slow = jsonops._extract_block_stdlib(df.copy(), "props", dict(fields))
    for c in fields:
        assert [None if pd.isna(v) else v for v in fast[c]] \
            == [None if pd.isna(v) else v for v in slow[c]], c


def test_join_empty_side_keeps_schema():
    """A join whose qualifying rows are ALL filtered out still returns a
    dataset with the joined schema (round-4: the exchange's all-empty
    path runs the merge on a typed empty partition table instead of
    returning a schemaless from_items([]))."""
    from ai_knowledgegraph_extractor_ray.ops.joins import hash_inner_join

    left = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64"),
                                        "a": pd.Series(dtype="int64")}))
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "b": [10, 20]}))
    out = hash_inner_join(left, right, "k")
    sch = out.schema()
    assert sch is not None and set(sch.names) == {"k", "a", "b"}
    assert out.count() == 0


def test_unigram_logprob_score_known_corpus():
    """Hand-checked unigram LM: corpus tokens {a:3, b:1} -> T=4,
    lp(a)=ln(3/4), lp(b)=ln(1/4); doc means follow; tokenless docs are
    absent from the output."""
    import math

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a a", "a b", "", "   "]}))
    out = (text.unigram_logprob_score(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_tokens"].tolist() == [2, 2]
    lp_a, lp_b = math.log(3 / 4), math.log(1 / 4)
    assert out["logprob_bp"].tolist() == [
        round(lp_a * 10000), round((lp_a + lp_b) / 2 * 10000)]


def test_range_sum_window_peers_and_boundary():
    """RANGE frame: equal-order peers are ALL in each other's frame
    (even later-positioned ones), and the value exactly param below the
    current order value is included (inclusive boundary)."""
    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec, keyed_window)

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"],
        "o": [0, 10, 10, 15, 30, 5],
        "v": [1, 2, 4, 8, 16, 100],
        "rid": [0, 1, 2, 3, 4, 5],
    })
    out = (keyed_window(rd.from_pandas(df), by="k", order=["o", "rid"],
                        specs=[WindowSpec(out="s", kind="range_sum",
                                          src="v", param=10)])
           .to_pandas().sort_values("rid"))
    # o=0: [0-10,0] -> {1}; o=10 (both peers): [0,10] -> 1+2+4=7;
    # o=15: [5,15] -> 2+4+8=14; o=30: [20,30] -> 16; b/o=5 -> 100
    assert out["s"].tolist() == [1, 7, 7, 14, 16, 100]
    assert out["s"].dtype == np.int64


def test_bigram_collocations_known_counts():
    """Hand-checked PMI on a 3-doc corpus; bigrams never span documents;
    min_count filters the tail."""
    import math

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["x y x y", "x y", "y x"]}))
    out = text.bigram_collocations(ds, min_count=3).to_pandas()
    # bigrams: doc0: (x,y),(y,x),(x,y); doc1: (x,y); doc2: (y,x)
    # counts: (x,y)=4? no: doc0 has x y x y -> (x,y),(y,x),(x,y) = 2+1
    # total (x,y) = 3, (y,x) = 2; B = 5; unigrams x=4, y=4, T = 8
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["w1"], r["w2"], r["n"]) == ("x", "y", 3)
    pmi = math.log((3 * 8.0 * 8.0) / (5.0 * 4 * 4))
    assert r["pmi_bp"] == round(pmi * 10000)


def test_grouped_weighted_quantile_disc_expansion_equivalence():
    """Weighted quantiles == plain quantile_disc over the weight-expanded
    multiset; zero-weight rows and zero-total groups vanish."""
    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_weighted_quantile_disc)

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": [10, 20, 30, 5, 7, 9],
        "w": [1, 3, 1, 0, 2, 0]})
    out = (grouped_weighted_quantile_disc(
        rd.from_pandas(df), ["k"], "v", "w",
        {"p50": 0.5, "p100": 1.0}).to_pandas()
        .sort_values("k").reset_index(drop=True))
    # a expands to [10,20,20,20,30]: p50=20 (rank ceil(2.5)=3), p100=30
    # b expands to [7,7]: p50=7; c has zero total weight -> absent
    assert out["k"].tolist() == ["a", "b"]
    assert out["p50"].tolist() == [20, 7]
    assert out["p100"].tolist() == [30, 7]
    assert out["n"].tolist() == [5, 2]


def test_skyline_2d_domination_and_ties():
    """Skyline semantics: equal pairs never dominate each other (both
    kept, multiplicity summed); strict domination on either axis kills;
    local-prune + merge equals the brute-force answer."""
    from ai_knowledgegraph_extractor_ray.ops.agg import skyline_2d

    rows = [(1, 10), (1, 10), (2, 10),   # (2,10) dominated by (1,10)
            (1, 5),                      # dominated by (1,10)
            (0, 3), (3, 12), (3, 12), (4, 12)]  # (4,12) dom by (3,12)
    df = pd.DataFrame(rows, columns=["x", "y"])
    out = (skyline_2d(rd.from_pandas(df.sample(frac=1, random_state=0)
                                     .reset_index(drop=True)), "x", "y")
           .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
    got = list(out.itertuples(index=False, name=None))
    # brute force over distinct pairs
    import itertools
    d = df.groupby(["x", "y"]).size().reset_index(name="n")
    keep = []
    for _, r in d.iterrows():
        dom = ((d["x"] <= r["x"]) & (d["y"] >= r["y"])
               & ((d["x"] < r["x"]) | (d["y"] > r["y"]))).any()
        if not dom:
            keep.append((r["x"], r["y"], r["n"]))
    assert got == sorted(keep)


def test_grouped_weighted_quantile_cont_expansion_equivalence():
    """Interpolated weighted quantiles equal quantile_cont over the
    expanded multiset (hand-checked: [10,20,20,20,30] p50=20, p90=26)."""
    from ai_knowledgegraph_extractor_ray.ops.agg import (
        grouped_weighted_quantile_cont)

    df = pd.DataFrame({"k": ["a"] * 3, "v": [10, 20, 30],
                       "w": [1, 3, 1]})
    out = grouped_weighted_quantile_cont(
        rd.from_pandas(df), ["k"], "v", "w",
        {"p50": 0.5, "p90": 0.9}).to_pandas()
    assert out["p50"].iloc[0] == 20.0
    assert out["p90"].iloc[0] == 26.0
    assert out["n"].iloc[0] == 5


def test_link_prediction_scores_known_graph():
    """Hand-checked wedge graph: star a-(b,c,d) plus edge b-c.
    Neighbors: a={b,c,d}, b={a,c}, c={a,b}, d={a}.
    Shared-neighbor pairs with >= 2 common: (b,c) share {a}: common=1
    (filtered); a-b share c? a nb b? pairs sharing 2+: b,c share a only.
    Use min_common=1 to check all scores."""
    import math

    from ai_knowledgegraph_extractor_ray.ops.graph import (
        link_prediction_scores)

    edges = pd.DataFrame({
        "canonical_src": ["a", "a", "a", "b"],
        "canonical_dst": ["b", "c", "d", "c"]})
    out = (link_prediction_scores(rd.from_pandas(edges), min_common=1)
           .to_pandas().sort_values(["node_a", "node_b"])
           .reset_index(drop=True))
    got = {(r.node_a, r.node_b): (r.common, r.jac_bp, r.aa_bp)
           for r in out.itertuples()}
    # (b,c): share {a}; deg b=2, c=2, a=3 -> jac 1/(2+2-1)=1/3,
    # aa = 1/ln(3)
    assert got[("b", "c")][0] == 1
    assert got[("b", "c")][1] == round(1 / 3 * 10000)
    assert got[("b", "c")][2] == math.floor(1 / math.log(3) * 10000 + 0.5)
    # (b,d): share {a}; jac = 1/(2+1-1) = 0.5
    assert got[("b", "d")] == (1, 5000,
                               math.floor(1 / math.log(3) * 10000 + 0.5))
    # (a,b) share c (deg 2): jac = 1/(3+2-1) = 0.25, aa = 1/ln(2)
    assert got[("a", "b")] == (1, 2500,
                               math.floor(1 / math.log(2) * 10000 + 0.5))
    # no pair with zero shared neighbors appears
    assert ("a", "d") not in got


def _canon_cmp(got, want, float_cols=()):
    import numpy as np
    import pandas as pd

    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values(
        sorted(got.columns), kind="mergesort").reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        sorted(want.columns), kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w)
    for c in g.columns:
        if c in float_cols:
            assert np.allclose(g[c].to_numpy(float), w[c].to_numpy(float),
                               atol=1e-9), c
        else:
            assert list(g[c].astype(str)) == list(w[c].astype(str)), c


def test_tpch_q9_q11_q12_q21_match_duckdb(tmp_path, monkeypatch):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    _write_tpch_mini(tmp_path)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation", "supplier",
              "part"):
        con.register(t, pd.read_parquet(tmp_path / f"{t}.parquet"))
    sql = entry.oracle_sql()

    # the mini fixture only has NATION_0..4 — run Q21 against one of them
    monkeypatch.setattr(q, "Q21_NATION", "NATION_2")
    q21_sql = sql["tpch_q21"].replace("NATION_9", "NATION_2")
    got21 = q.q_tpch_q21(str(tmp_path))
    want21 = con.execute(q21_sql).df()
    assert len(got21) > 0          # the predicate actually selects rows
    _canon_cmp(got21, want21)

    _canon_cmp(q.q_tpch_q12(str(tmp_path)),
               con.execute(sql["tpch_q12"]).df())

    got9 = q.q_tpch_q9(str(tmp_path))
    want9 = con.execute(sql["tpch_q9"]).df()
    assert len(got9) > 0
    _canon_cmp(got9, want9)

    got11 = q.q_tpch_q11(str(tmp_path))
    want11 = con.execute(sql["tpch_q11"]).df()
    assert 0 < len(got11) < 60     # non-degenerate threshold
    _canon_cmp(got11, want11)


def _write_events_mini(tmp_path):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(29)
    n = 400
    base = pd.Timestamp("2024-03-01").value // 1000
    ts_us = base + np.sort(rng.randint(0, 3 * 86400 * 10**6, n))
    # force same-hour duplicates and one exact-tie timestamp pair
    ts_us[10] = ts_us[11]
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "user_id": rng.randint(0, 10, n).astype("int64"),
        "event_type": rng.choice(["click", "view", "buy"], n),
        "value": rng.uniform(0, 500, n).round(2)})
    # a single-event user: grid must be exactly one row for it
    ev.loc[n - 1, "user_id"] = 99
    ev.to_parquet(tmp_path / "events.parquet")
    return ev


def test_events_twa_gapfill_mad_lift_match_duckdb(tmp_path):
    import duckdb

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    con = duckdb.connect()
    con.register("events", ev)
    sql = entry.oracle_sql()

    _canon_cmp(q.q_events_twa(str(tmp_path)),
               con.execute(sql["events_twa"]).df(), float_cols=("twa",))

    got_gf = q.q_events_gapfill(str(tmp_path)).to_pandas()
    want_gf = con.execute(sql["events_gapfill"]).df()
    _canon_cmp(got_gf, want_gf)
    # the single-event user densifies to exactly one carried-forward row
    assert (got_gf["user_id"] == 99).sum() == 1

    _canon_cmp(q.q_events_mad(str(tmp_path)),
               con.execute(sql["events_mad"]).df())

    _canon_cmp(q.q_events_lift(str(tmp_path)),
               con.execute(sql["events_lift"]).df(),
               float_cols=("expected", "lift"))


def test_events_rollmed_newusers_concurrency_vocab_match_duckdb(tmp_path):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a b c a", "a a a", "", "unique words only here",
                 "b c", "a b c a"]})
    docs.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.register("events", ev)
    con.register("documents", docs)
    sql = entry.oracle_sql()

    _canon_cmp(q.q_events_rollmed(str(tmp_path)),
               con.execute(sql["events_rollmed"]).df(),
               float_cols=("med10",))

    got_nu = q.q_events_newusers(str(tmp_path))
    _canon_cmp(got_nu, con.execute(sql["events_newusers"]).df())
    # cumulative distinct users ends at the true user count
    assert got_nu["cum_users"].iloc[-1] == ev["user_id"].nunique()

    got_sc = q.q_session_concurrency(str(tmp_path)).to_pandas()
    _canon_cmp(got_sc, con.execute(sql["session_concurrency"]).df())
    assert (got_sc["concurrency"] >= 1).all()   # a session sees itself

    got_v = q.q_vocab_stats(str(tmp_path))
    _canon_cmp(got_v, con.execute(sql["vocab_stats"]).df())
    # hand-check on the tiny corpus: tokens = 4+3+0+4+2+4 = 17
    assert int(got_v["n_tokens"][0]) == 17


def test_rolling_median_window_kind_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_knowledgegraph_extractor_ray.ops.window import (
        WindowSpec,
        keyed_window,
    )

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.choice(list("ab"), 300),
        "o": np.arange(300, dtype="int64"),
        "v": rng.randint(0, 50, 300).astype("int64")})
    out = (keyed_window(
        rd.from_pandas([df.iloc[:150], df.iloc[150:]]),
        by="k", order=["o"],
        specs=[WindowSpec(out="m", kind="rolling_median", src="v",
                          param=4)],
        buckets=2).to_pandas()
        .sort_values(["k", "o"]).reset_index(drop=True))
    ordered = df.sort_values(["k", "o"])
    want = (ordered.groupby("k")["v"]
            .rolling(4, min_periods=1).median()
            .reset_index(drop=True))
    assert np.allclose(out["m"].to_numpy(), want.to_numpy())


def test_tpch_q2_q16_q20_match_duckdb(tmp_path):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    _write_tpch_mini(tmp_path)
    con = duckdb.connect()
    for t in ("orders", "lineitem", "nation", "supplier", "part",
              "region"):
        con.register(t, pd.read_parquet(tmp_path / f"{t}.parquet"))
    sql = entry.oracle_sql()

    got2 = q.q_tpch_q2(str(tmp_path))
    want2 = con.execute(sql["tpch_q2"]).df()
    assert len(got2) > 0
    _canon_cmp(got2, want2)

    got16 = q.q_tpch_q16(str(tmp_path))
    want16 = con.execute(sql["tpch_q16"]).df()
    assert want16["supplier_cnt"].max() < 12   # blocklist actually bites
    _canon_cmp(got16, want16)

    got20 = q.q_tpch_q20(str(tmp_path))
    want20 = con.execute(sql["tpch_q20"]).df()
    assert len(got20) > 0
    _canon_cmp(got20, want20)


def test_equidepth_centroids_rfm_match_duckdb(tmp_path):
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    _write_tpch_mini(tmp_path)
    rng = np.random.RandomState(41)
    emb = pd.DataFrame({
        "vec_id": np.arange(80, dtype="int64"),
        "embedding": [rng.randn(8).astype("float32") for _ in range(80)],
        "label": rng.randint(0, 4, 80).astype("int32")})
    emb.to_parquet(tmp_path / "embeddings.parquet")

    con = duckdb.connect()
    con.register("events", ev)
    con.register("orders", pd.read_parquet(tmp_path / "orders.parquet"))
    con.register("embeddings",
                 pd.read_parquet(tmp_path / "embeddings.parquet"))
    sql = entry.oracle_sql()

    got_eq = q.q_events_equidepth(str(tmp_path)).to_pandas()
    _canon_cmp(got_eq, con.execute(sql["events_equidepth"]).df())
    # equi-depth: bucket sizes differ by at most one
    sizes = got_eq.groupby("bucket").size()
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 16

    _canon_cmp(q.q_embed_centroids(str(tmp_path)),
               con.execute(sql["embed_centroids"]).df(),
               float_cols=("mean_q",))

    got_rfm = q.q_orders_rfm(str(tmp_path))
    _canon_cmp(got_rfm, con.execute(sql["orders_rfm"]).df())
    for c in ("r_score", "f_score", "m_score"):
        assert set(got_rfm[c]) == set(range(1, 6))


def test_impute_and_basket_rules_match_duckdb(tmp_path):
    import duckdb
    import numpy as np

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    con = duckdb.connect()
    con.register("events", ev)
    sql = entry.oracle_sql()

    got_im = q.q_events_impute(str(tmp_path)).to_pandas()
    _canon_cmp(got_im, con.execute(sql["events_impute"]).df())
    assert got_im["is_imputed"].any()          # sentinel actually fires
    assert (got_im["cents_filled"] >= 200).all()

    got_br = q.q_basket_rules(str(tmp_path))
    want_br = con.execute(sql["basket_rules"]).df()
    assert len(got_br) > 0
    _canon_cmp(got_br, want_br)
    # confidence cannot exceed 100% and support <= confidence
    assert (got_br["conf_bp"] <= 10000).all()
    assert (got_br["support_bp"].to_numpy()
            <= got_br["conf_bp"].to_numpy()).all()


def test_fk_audit_and_drift_match_duckdb(tmp_path):
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    _write_tpch_mini(tmp_path)
    # plant orphans: lineitem rows whose orderkey has no parent order
    li = pd.read_parquet(tmp_path / "lineitem.parquet")
    li.loc[li.index[:7], "l_orderkey"] = 999_999
    li.to_parquet(tmp_path / "lineitem.parquet")

    con = duckdb.connect()
    con.register("events", ev)
    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        con.register(t, pd.read_parquet(tmp_path / f"{t}.parquet"))
    sql = entry.oracle_sql()

    got_fk = q.q_fk_audit(str(tmp_path))
    _canon_cmp(got_fk, con.execute(sql["fk_audit"]).df())
    row = got_fk[got_fk["relationship"]
                 == "lineitem.l_orderkey->orders"].iloc[0]
    assert int(row["n_orphans"]) == 7          # planted orphans found

    # force the co-bucketed anti-join plan (big-parent path) and check
    # both physical plans agree
    import ai_knowledgegraph_extractor_ray.pipelines.queries as qmod
    orig = qmod.FK_BROADCAST_MAX_PARENT
    try:
        qmod.FK_BROADCAST_MAX_PARENT = 0
        got_fk2 = q.q_fk_audit(str(tmp_path))
    finally:
        qmod.FK_BROADCAST_MAX_PARENT = orig
    _canon_cmp(got_fk2, got_fk)

    got_dr = q.q_events_drift(str(tmp_path))
    _canon_cmp(got_dr, con.execute(sql["events_drift"]).df())
    assert (np.abs(got_dr["share_first_bp"].sum() - 10000) <= 10)


def test_review_fixes_impute_sentinel_basket_empty_type_equidepth_schema(
        tmp_path):
    """Round-4b review fixes: (1) an event_type with ZERO observed
    values imputes 0 (not INT64_MIN); (2) an event_type equal to the
    empty string is an ordinary basket item, not the in-band tag;
    (3) equi-depth binning on empty input keeps its 3-column schema."""
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    n = 60
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Timestamp("2024-05-01")
        + pd.to_timedelta(np.arange(n) * 4885, unit="s"),
        "user_id": (np.arange(n, dtype="int64") % 4),
        # "" is a legal type; "dead" never reaches the sentinel
        "event_type": ["", "live", "dead"] * (n // 3),
        "value": [5.0, 9.0, 0.5] * (n // 3)})
    ev.to_parquet(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.register("events", ev)
    sql = entry.oracle_sql()

    got_im = q.q_events_impute(str(tmp_path)).to_pandas()
    _canon_cmp(got_im, con.execute(sql["events_impute"]).df())
    dead = got_im[got_im["event_type"] == "dead"]
    assert (dead["cents_filled"] == 0).all()       # oracle's 0, not MIN

    got_br = q.q_basket_rules(str(tmp_path))
    want_br = con.execute(sql["basket_rules"]).df()
    assert ("" in set(got_br["antecedent"]))       # "" participates
    _canon_cmp(got_br, want_br)

    empty = tmp_path / "empty"
    empty.mkdir()
    ev.iloc[:0].to_parquet(empty / "events.parquet")
    got_eq = q.q_events_equidepth(str(empty))
    if hasattr(got_eq, "to_pandas"):
        got_eq = got_eq.to_pandas()
    assert list(got_eq.columns) == ["event_id", "cents", "bucket"]
    assert len(got_eq) == 0


def test_user_mobility_matches_duckdb(tmp_path):
    import duckdb

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ev = _write_events_mini(tmp_path)
    con = duckdb.connect()
    con.register("events", ev)
    sql = entry.oracle_sql()

    got = q.q_user_mobility(str(tmp_path))
    want = con.execute(sql["user_mobility"]).df()
    assert len(got) > 0
    _canon_cmp(got, want)
    # transition matrix covers every both-halves user exactly once
    assert int(got["n_users"].sum()) == int(want["n_users"].sum())


def test_compact_parquet_dir_roundtrip(tmp_path):
    import os

    import numpy as np
    import pandas as pd

    from ai_knowledgegraph_extractor_ray.ops.sinks import (
        compact_parquet_dir,
    )

    d = tmp_path / "frag"
    d.mkdir()
    frames = []
    for i in range(25):
        df = pd.DataFrame({
            "k": np.arange(i * 10, i * 10 + 10, dtype="int64"),
            "v": np.arange(10, dtype="int64") * i})
        df.to_parquet(d / f"part-{i:04d}.parquet")
        frames.append(df)
    before = pd.concat(frames).sort_values(["k", "v"]).reset_index(
        drop=True)

    stats = compact_parquet_dir(str(d), target_mb=128)
    assert stats["files_before"] == 25
    assert stats["files_after"] < 25
    assert stats["rows"] == 250
    after = (pd.read_parquet(d).sort_values(["k", "v"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)
    assert not os.path.exists(str(d) + ".compact-tmp")


def test_compact_parquet_dir_sidecars_and_subdir_refusal(tmp_path):
    """Round-5 ADVICE pins: non-parquet sidecar files (manifests) survive
    the in-place swap; nested partition directories are refused."""
    import numpy as np
    import pandas as pd
    import pytest

    from ai_knowledgegraph_extractor_ray.ops.sinks import (
        compact_parquet_dir,
    )

    d = tmp_path / "frag"
    d.mkdir()
    for i in range(4):
        pd.DataFrame({"k": np.arange(5, dtype="int64")}).to_parquet(
            d / f"part-{i:04d}.parquet")
    (d / "_manifest.json").write_text('{"rows": 20}')
    stats = compact_parquet_dir(str(d), target_mb=128)
    assert stats["rows"] == 20
    assert (d / "_manifest.json").read_text() == '{"rows": 20}'

    nested = tmp_path / "hive"
    (nested / "lang=en").mkdir(parents=True)
    pd.DataFrame({"k": [1]}).to_parquet(nested / "top.parquet")
    with pytest.raises(ValueError, match="subdirectories"):
        compact_parquet_dir(str(nested), target_mb=128)


def test_gapfill_packed_key_guard(tmp_path):
    """Round-5 ADVICE pin: packed-key precondition violations (negative
    user_id here — epoch-hour >= 2**20 cannot even pass the cents prep)
    fail loudly instead of silently corrupting the forward fill."""
    import pandas as pd
    import pytest

    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    ts0 = pd.Timestamp("2024-03-01")
    df = pd.DataFrame({
        "event_id": [1, 2], "user_id": [-5, -5],
        "ts": [ts0, ts0 + pd.Timedelta(hours=3)],
        "value": [1.0, 2.0]})
    df.to_parquet(tmp_path / "events.parquet")
    with pytest.raises(Exception, match="packed key out of range"):
        res = q.q_events_gapfill(str(tmp_path))
        res.to_pandas() if hasattr(res, "to_pandas") else res


def test_events_timeband_matches_duckdb(tmp_path):
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    rng = np.random.RandomState(57)
    n = 500
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Timestamp("2024-02-01")
        + pd.to_timedelta(rng.randint(0, 5 * 86400, n), unit="s"),
        # user ids above 1024 exercise the overflow-safe key packing
        "user_id": rng.choice([3, 7, 2048, 1_000_000], n).astype("int64"),
        "event_type": rng.choice(["error", "click", "view"], n),
        "value": rng.uniform(0, 10, n).round(2)})
    ev.to_parquet(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.register("events", ev)
    sql = entry.oracle_sql()

    got = q.q_events_timeband(str(tmp_path)).to_pandas()
    want = con.execute(sql["events_timeband"]).df()
    assert len(got) > 0
    _canon_cmp(got, want)
    assert (got["dt_us"] >= 0).all()
    assert (got["dt_us"] <= 86_400_000_000).all()


def test_ntile_from_rank_matches_duckdb_property():
    """The shared closed NTILE formula must equal SQL NTILE for every
    (n, k) shape — including n < k, n % k != 0, and k = 1."""
    import duckdb
    import numpy as np
    import pandas as pd

    from ai_knowledgegraph_extractor_ray.pipelines.queries import (
        _ntile_from_rank,
    )

    con = duckdb.connect()
    rng = np.random.RandomState(3)
    for n, k in [(1, 5), (4, 5), (5, 5), (6, 5), (37, 10), (100, 7),
                 (13, 1), (2, 16), (250, 16)]:
        vals = rng.randint(0, 50, n).astype("int64")
        ids = np.arange(n, dtype="int64")
        df = pd.DataFrame({"v": vals, "id": ids})
        con.register("t", df)
        want = con.execute(
            f"SELECT id, ntile({k}) OVER (ORDER BY v, id) AS nt "
            "FROM t ORDER BY id").df()["nt"].to_numpy()
        order = np.lexsort((ids, vals))
        r0 = np.empty(n, dtype=np.int64)
        r0[order] = np.arange(n, dtype=np.int64)
        got = _ntile_from_rank(r0, n, k)
        assert (got == want).all(), (n, k)


def test_events_timeband_random_fuzz_vs_duckdb(tmp_path):
    """Randomized shapes for the band-join pair expansion: duplicate
    timestamps, same-instant error+click, empty sides per user, and
    window-boundary hits — engine vs DuckDB on 5 seeds."""
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    sql = entry.oracle_sql()["events_timeband"]
    for seed in range(5):
        rng = np.random.RandomState(100 + seed)
        n = 120
        base = pd.Timestamp("2024-06-01").value // 1000
        # coarse grid forces exact-boundary and equal-ts collisions
        t = base + rng.randint(0, 3, n) * 86_400_000_000 \
            + rng.randint(0, 4, n) * 21_600_000_000
        d = tmp_path / f"s{seed}"
        d.mkdir()
        ev = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(t, unit="us"),
            "user_id": rng.randint(0, 3, n).astype("int64"),
            "event_type": rng.choice(["error", "click"], n),
            "value": np.ones(n)})
        ev.to_parquet(d / "events.parquet")
        con = duckdb.connect()
        con.register("events", ev)
        got = q.q_events_timeband(str(d)).to_pandas()
        want = con.execute(sql).df()
        _canon_cmp(got, want)


def test_gapfill_and_concurrency_random_fuzz_vs_duckdb(tmp_path):
    """Randomized boundary shapes for the two sweep operators: equal
    timestamps within and across users, session gaps exactly at the
    30-minute rule, single-event users, hour-boundary events."""
    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from ai_knowledgegraph_extractor_ray.pipelines import queries as q

    sqls = entry.oracle_sql()
    for seed in range(4):
        rng = np.random.RandomState(900 + seed)
        n = 150
        base = pd.Timestamp("2024-07-01").value // 1000
        # half-hour / hour grid multiples force boundary collisions
        t = base + rng.randint(0, 48, n) * 1_800_000_000
        d = tmp_path / f"g{seed}"
        d.mkdir()
        ev = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(t, unit="us"),
            "user_id": rng.randint(0, 5, n).astype("int64"),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.uniform(0, 9, n).round(2)})
        ev.loc[n - 1, "user_id"] = 42        # single-event user
        ev.to_parquet(d / "events.parquet")
        con = duckdb.connect()
        con.register("events", ev)

        got_gf = q.q_events_gapfill(str(d)).to_pandas()
        _canon_cmp(got_gf, con.execute(sqls["events_gapfill"]).df())

        got_sc = q.q_session_concurrency(str(d)).to_pandas()
        _canon_cmp(got_sc, con.execute(
            sqls["session_concurrency"]).df())


def test_driver_contract_window_and_oracle_consistency():
    """The driver's CORRECTNESS gate checks only the FIRST 50 queries()
    entries: every one of those slots must carry an exact DuckDB oracle
    (a rows-only entry there would waste a gate slot), every oracle key
    must name a query, and the catalog must stay import-clean."""
    import __ray_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
    first50 = list(qs)[:50]
    unoracled = [n for n in first50 if n not in osql]
    assert not unoracled, f"gate-window slots without oracles: {unoracled}"
    assert len(qs) >= 150 and len(osql) >= 140   # contract floor
