"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar metadata
(media_type, width/height or sample_rate/duration). Decode and feature
extraction run as actor-pool ``map_batches`` stages with SMALL batch sizes
(payload bytes x batch_size x concurrency must fit a worker heap).

Codec reality, by format:

* PNG, BMP and PPM images and WAV audio decode FOR REAL with pure-stdlib
  codecs (``decode_png``: chunk parse + zlib inflate + all five scanline
  filters; ``decode_bmp``: uncompressed 24/32-bit BITMAPINFOHEADER;
  ``decode_ppm``: netpbm P6; ``decode_wav``: the ``wave`` module, 8/16-bit
  PCM, channel mean-mix) — no PIL/soundfile needed, round-trip tested
  against the matching encoders.
* Other formats (JPEG, MP4, ...) need libraries absent from this container
  (PIL, ffmpeg, torchaudio); each stage try-imports the real library and
  otherwise uses deterministic fake decoding (seeded from the payload
  bytes) or raises NotImplementedError, per ``fake_ok``. The plumbing —
  schema, actor signature, batch sizing, output layout — is identical
  either way.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("media_type", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),           # images/video
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()),     # audio
    ("meta_n_frames", pa.int32()),        # video
])


def synthetic_media(n_items: int = 64, seed: int = 7,
                    payload_bytes: int = 4096,
                    real_payloads: bool = False) -> rd.Dataset:
    """Deterministic media corpus for plumbing tests: payload = seeded byte
    stream (or, with ``real_payloads``, actual encoded PNG / WAV bytes for
    image/audio items — video payloads stay opaque), metadata consistent
    with media_type."""
    def gen(batch: dict) -> pa.Table:
        ids = batch["id"].to_pylist()
        media, payloads, w, h, sr, nf = [], [], [], [], [], []
        for i in ids:
            kind = ("image", "audio", "video")[i % 3]
            rng = np.random.RandomState((seed * 1_000_003 + i) % (2**31))
            if real_payloads and kind == "image":
                px = rng.randint(0, 256, size=(48 + (i % 5) * 16,
                                               64 + (i % 8) * 16, 3),
                                 dtype=np.uint8)
                payloads.append(encode_png(px))
            elif real_payloads and kind == "audio":
                payloads.append(encode_wav(
                    rng.standard_normal(16000).astype(np.float32) * 0.3,
                    16000))
            else:
                payloads.append(rng.bytes(payload_bytes))
            media.append(kind)
            w.append(64 + (i % 8) * 16 if kind != "audio" else 0)
            h.append(48 + (i % 5) * 16 if kind != "audio" else 0)
            sr.append(16000 if kind == "audio" else 0)
            nf.append(1 + i % 30 if kind == "video" else (1 if kind == "image" else 0))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(media, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(w, pa.int32()),
            "meta_height": pa.array(h, pa.int32()),
            "meta_sample_rate": pa.array(sr, pa.int32()),
            "meta_n_frames": pa.array(nf, pa.int32()),
        })

    return rd.range(n_items).map_batches(gen, batch_format="pyarrow")


_MEDIA_EXT = {".png": "image", ".jpg": "image", ".jpeg": "image",
              ".bmp": "image", ".ppm": "image", ".wav": "audio", ".mp3": "audio",
              ".flac": "audio", ".mp4": "video", ".avi": "video",
              ".mkv": "video", ".webm": "video"}


def probe_media_meta(media_type: str, payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, sample_rate, n_frames) from container HEADERS only —
    no payload decode. PNG: IHDR dims; WAV: fmt-chunk sample rate. Unknown
    formats return zeros (decode stages still handle or fake them)."""
    w = h = sr = nf = 0
    if media_type == "image" and payload.startswith(PNG_MAGIC) \
            and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        nf = 1
    elif media_type == "image" and payload.startswith(BMP_MAGIC) \
            and len(payload) >= 26:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        nf = 1
    elif media_type == "audio" and payload.startswith(b"RIFF"):
        i = payload.find(b"fmt ")
        if i != -1 and len(payload) >= i + 16:
            sr = int.from_bytes(payload[i + 12:i + 16], "little")
    return w, h, sr, nf


def read_media_dir(path: str) -> rd.Dataset:
    """Directory of media files -> MEDIA_SCHEMA Dataset: payloads stay
    opaque binary columns; media_type from the extension; metadata probed
    from headers inside ``map_batches``. item_id = crc32 of the file path
    (stable across runs and cluster layouts)."""
    import os

    ds = rd.read_binary_files(path, include_paths=True)

    def fn(t: pa.Table) -> pa.Table:
        ids, kinds, payloads, ws, hs, srs, nfs = [], [], [], [], [], [], []
        for p, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            kind = _MEDIA_EXT.get(os.path.splitext(p)[1].lower())
            if kind is None:
                continue
            w, h, sr, nf = probe_media_meta(kind, data)
            ids.append(zlib.crc32(p.encode()))
            kinds.append(kind)
            payloads.append(data)
            ws.append(w)
            hs.append(h)
            srs.append(sr)
            nfs.append(nf)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(ws, pa.int32()),
            "meta_height": pa.array(hs, pa.int32()),
            "meta_sample_rate": pa.array(srs, pa.int32()),
            "meta_n_frames": pa.array(nfs, pa.int32()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes -> (h, w, 3) uint8."""
    rng = np.random.RandomState(zlib.crc32(payload) % (2**31))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# --- real stdlib codecs (PNG via zlib, WAV via the wave module) -------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode -> (h, w, 3) uint8. Supports 8-bit
    grayscale/RGB/RGBA, non-interlaced, all five scanline filters — the
    format PNG encoders emit by default. No PIL required."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a png")
    pos, idat = 8, []
    w = h = color = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w = int.from_bytes(chunk[0:4], "big")
            h = int.from_bytes(chunk[4:8], "big")
            bit, color, interlace = chunk[8], chunk[9], chunk[12]
            if bit != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError("unsupported png variant")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated png")
    raw = zlib.decompress(b"".join(idat))
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos2 = 0
    for y in range(h):
        f = raw[pos2]
        line = np.frombuffer(raw, np.uint8, count=stride,
                             offset=pos2 + 1).copy()
        pos2 += 1 + stride
        if f == 2:                       # Up — vectorized
            line += prev
        elif f in (1, 3, 4):             # Sub/Average/Paeth — sequential in x
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad png filter {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def encode_png(px: np.ndarray) -> bytes:
    """Pure-stdlib PNG encode of (h, w, 3) uint8 (filter 0 scanlines)."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (len(payload).to_bytes(4, "big") + typ + payload
                + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


BMP_MAGIC = b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Pure-stdlib BMP decode -> (h, w, 3) uint8. Supports the common
    uncompressed 24/32-bit BITMAPINFOHEADER form (bottom-up or top-down
    rows, 4-byte row padding). The second real stdlib image codec beside
    PNG (round-3 item 6)."""
    if not data.startswith(BMP_MAGIC) or len(data) < 54:
        raise ValueError("not a bmp")
    off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported bmp header")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp not in (24, 32) or compression != 0:
        raise ValueError("unsupported bmp variant")
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    px = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
    px = px.reshape(h, stride)[:, :w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()          # BGR(A) -> RGB


def encode_bmp(px: np.ndarray) -> bytes:
    """Pure-stdlib 24-bit bottom-up BMP encode of (h, w, 3) uint8."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = px[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + pad
    info = (b"\x28\x00\x00\x00"
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + b"\x00" * 4 + len(body).to_bytes(4, "little") + b"\x00" * 16)
    header = (BMP_MAGIC + (54 + len(body)).to_bytes(4, "little")
              + b"\x00" * 4 + (54).to_bytes(4, "little"))
    return header + info + bytes(body)


PPM_MAGIC = b"P6"


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) decode -> (h, w, 3) uint8 — the third real image
    codec; trivially simple by design (netpbm)."""
    if not data.startswith(PPM_MAGIC):
        raise ValueError("not a ppm")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":           # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1                                     # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("unsupported ppm maxval")
    return np.frombuffer(data, np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decode -> (mono float32 pcm in [-1, 1], sample_rate)
    via the ``wave`` module (8/16-bit PCM; channels mean-mixed)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        sr, nch, sw = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sw == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        pcm = (np.frombuffer(frames, dtype=np.uint8)
               .astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, sr


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Pure-stdlib mono 16-bit WAV encode."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(
            (np.clip(pcm, -1.0, 1.0) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


class ImageDecoder:
    """Actor-pool decode stage. Real path: PIL.Image.open over payload bytes.
    Sandbox path: deterministic fake pixels (or NotImplementedError when
    fake_ok=False). Emits a fixed-size thumbnail feature layout either way."""

    def __init__(self, *, thumb: int = 8, fake_ok: bool = True):
        self.thumb = thumb
        self.fake_ok = fake_ok
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self._pil is not None:
            import io
            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img)
        if payload.startswith(PNG_MAGIC):
            return decode_png(payload)        # real stdlib paths, no PIL
        if payload.startswith(BMP_MAGIC):
            return decode_bmp(payload)
        if payload.startswith(PPM_MAGIC):
            return decode_ppm(payload)
        if not self.fake_ok:
            raise NotImplementedError(
                "image codec not available for this format; "
                "install pillow or pass fake_ok=True")
        return _fake_pixels(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        t = self.thumb
        for payload, w, h, kind in zip(batch["payload"].to_pylist(),
                                       batch["meta_width"].to_pylist(),
                                       batch["meta_height"].to_pylist(),
                                       batch["media_type"].to_pylist()):
            if kind != "image":
                feats.append([])    # empty, not null: keeps Arrow list type
                ok.append(False)    # stable under pandas/tensor conversion
                continue
            px = self._decode(payload, w, h)
            # mean-pool to a t x t x 3 thumbnail feature, flattened
            ys = np.linspace(0, px.shape[0], t + 1, dtype=int)
            xs = np.linspace(0, px.shape[1], t + 1, dtype=int)
            pooled = np.array([
                px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
                for i in range(t) for j in range(t)
            ], dtype=np.float32).ravel()
            feats.append(pooled.tolist())
            ok.append(True)
        return pa.table({
            "item_id": batch["item_id"],
            "decoded": pa.array(ok, pa.bool_()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class ImageResizer:
    """Actor-pool resize stage: decode -> nearest-neighbor resample to
    (target_w, target_h) -> re-emit raw RGB bytes + updated metadata. Real
    path would use PIL's resampling kernels; the decode seam is shared with
    ImageDecoder, the resample itself is real numpy."""

    def __init__(self, target_w: int = 32, target_h: int = 24,
                 fake_ok: bool = True):
        self.tw, self.th = target_w, target_h
        self.decoder = ImageDecoder(fake_ok=fake_ok)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, ws, hs = [], [], [], []
        for item, kind, payload, w, h in zip(batch["item_id"].to_pylist(),
                                             batch["media_type"].to_pylist(),
                                             batch["payload"].to_pylist(),
                                             batch["meta_width"].to_pylist(),
                                             batch["meta_height"].to_pylist()):
            if kind != "image":
                continue
            px = self.decoder._decode(payload, w, h)
            ys = (np.arange(self.th) * px.shape[0] // self.th)
            xs = (np.arange(self.tw) * px.shape[1] // self.tw)
            resized = px[ys][:, xs]
            ids.append(item)
            payloads.append(resized.tobytes())
            ws.append(self.tw)
            hs.append(self.th)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(ws, pa.int32()),
            "meta_height": pa.array(hs, pa.int32()),
        })


def resize_images(ds: rd.Dataset, *, target_w: int = 32, target_h: int = 24,
                  concurrency: int = 2, batch_size: int = 16,
                  fake_ok: bool = True) -> rd.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "fake_ok": fake_ok},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class FrameSampler:
    """Video frame-sampling stage: emits one row per sampled frame index
    (every ``stride``-th frame) with the frame's fake feature. Real path
    would seek the container; the seam is ``_frame_of``."""

    def __init__(self, stride: int = 10, fake_ok: bool = True):
        self.stride = stride
        self.fake_ok = fake_ok

    def _frame_of(self, payload: bytes, idx: int) -> np.ndarray:
        if not self.fake_ok:
            raise NotImplementedError("video codec not available")
        return _fake_pixels(hashlib.sha256(payload + idx.to_bytes(4, "big")).digest(),
                            8, 8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for item, kind, payload, nf in zip(batch["item_id"].to_pylist(),
                                           batch["media_type"].to_pylist(),
                                           batch["payload"].to_pylist(),
                                           batch["meta_n_frames"].to_pylist()):
            if kind != "video":
                continue
            for f in range(0, max(nf, 1), self.stride):
                ids.append(item)
                frames.append(f)
                feats.append(self._frame_of(payload, f).mean(axis=(0, 1)).tolist())
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "frame_feature": pa.array(feats, pa.list_(pa.float32())),
        })


class AudioFeaturizer:
    """Audio feature-extraction stage: payload -> frame-energy vector.
    Real path would decode PCM (torchaudio/soundfile — absent here); the
    seam is ``_pcm_of``. Emits fixed-size energy features per audio item."""

    def __init__(self, n_frames: int = 16, fake_ok: bool = True):
        self.n_frames = n_frames
        self.fake_ok = fake_ok

    def _pcm_of(self, payload: bytes, sample_rate: int) -> tuple[np.ndarray, int]:
        if payload.startswith(b"RIFF"):
            return decode_wav(payload)        # real stdlib path
        if not self.fake_ok:
            raise NotImplementedError("audio codec not available")
        rng = np.random.RandomState(zlib.crc32(payload) % (2**31))
        return rng.standard_normal(sample_rate).astype(np.float32), sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, durs = [], [], []
        for item, kind, payload, sr in zip(batch["item_id"].to_pylist(),
                                           batch["media_type"].to_pylist(),
                                           batch["payload"].to_pylist(),
                                           batch["meta_sample_rate"].to_pylist()):
            if kind != "audio" or not sr:
                continue
            pcm, sr = self._pcm_of(payload, sr)
            frames = np.array_split(pcm, self.n_frames)
            ids.append(item)
            feats.append([float(np.sqrt((f ** 2).mean())) for f in frames])
            durs.append(len(pcm) / sr)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "energy": pa.array(feats, pa.list_(pa.float32())),
            "duration_s": pa.array(durs, pa.float64()),
        })


def featurize_audio(ds: rd.Dataset, *, concurrency: int = 2,
                    batch_size: int = 8, fake_ok: bool = True) -> rd.Dataset:
    return ds.map_batches(AudioFeaturizer,
                          fn_constructor_kwargs={"fake_ok": fake_ok},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def decode_images(ds: rd.Dataset, *, concurrency: int = 2,
                  batch_size: int = 16, fake_ok: bool = True) -> rd.Dataset:
    """Small batch_size: payload x batch x concurrency bounds actor heap."""
    return ds.map_batches(ImageDecoder, fn_constructor_kwargs={"fake_ok": fake_ok},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def sample_frames(ds: rd.Dataset, *, stride: int = 10, concurrency: int = 2,
                  batch_size: int = 8, fake_ok: bool = True) -> rd.Dataset:
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"stride": stride, "fake_ok": fake_ok},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the scipy.fft.dct(norm='ortho')
    kernel, built from first principles — scipy is not in this image)."""
    k = np.arange(n, dtype=np.float64)
    d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


_PHASH_DCT32 = _dct_matrix(32)


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash (the classic pHash recipe): grayscale,
    area-pool to 32x32, 2-D DCT-II, keep the 8x8 low-frequency block,
    threshold against its median (DC term excluded). Robust to
    re-encoding and small pixel noise; Hamming distance approximates
    visual difference."""
    g = px.astype(np.float64).mean(axis=2)
    # sub-32px images would create zero-width pooling bins (0/0 = NaN
    # coefficients, hash 0 for every tiny image); nearest-upsample first
    if g.shape[0] < 32:
        g = np.repeat(g, -(-32 // g.shape[0]), axis=0)
    if g.shape[1] < 32:
        g = np.repeat(g, -(-32 // g.shape[1]), axis=1)
    ys = np.linspace(0, g.shape[0], 33, dtype=int)
    xs = np.linspace(0, g.shape[1], 33, dtype=int)
    # area pooling via prefix sums (exact box means, vectorized)
    cs = np.zeros((g.shape[0] + 1, g.shape[1] + 1))
    cs[1:, 1:] = g.cumsum(0).cumsum(1)
    y0, y1 = ys[:-1][:, None], ys[1:][:, None]
    x0, x1 = xs[:-1][None, :], xs[1:][None, :]
    area = ((y1 - y0) * (x1 - x0)).astype(np.float64)
    small = (cs[y1, x1] - cs[y0, x1] - cs[y1, x0] + cs[y0, x0]) / area
    coef = (_PHASH_DCT32 @ small @ _PHASH_DCT32.T)[:8, :8].ravel()
    med = np.median(coef[1:])
    bits = coef > med
    return int(np.packbits(bits).view(">u8")[0])


class ImagePHasher:
    """Actor-pool perceptual-hash stage: decode (same codec seam as
    ImageDecoder) -> phash64 per image. Emits (item_id, phash:uint64,
    hashed:bool); non-image rows pass through hashed=False."""

    def __init__(self, *, fake_ok: bool = True):
        self._decoder = ImageDecoder(fake_ok=fake_ok)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for payload, w, h, kind in zip(batch["payload"].to_pylist(),
                                       batch["meta_width"].to_pylist(),
                                       batch["meta_height"].to_pylist(),
                                       batch["media_type"].to_pylist()):
            if kind != "image":
                hashes.append(0)
                ok.append(False)
                continue
            px = self._decoder._decode(payload, w, h)
            hashes.append(phash64(px))
            ok.append(True)
        return pa.table({
            "item_id": batch["item_id"],
            "phash": pa.array(hashes, pa.uint64()),
            "hashed": pa.array(ok, pa.bool_()),
        })


def phash_images(ds: rd.Dataset, *, concurrency: int = 2,
                 batch_size: int = 16, fake_ok: bool = True) -> rd.Dataset:
    return ds.map_batches(ImagePHasher, batch_format="pyarrow",
                          fn_constructor_kwargs={"fake_ok": fake_ok},
                          concurrency=concurrency, batch_size=batch_size)


def phash_near_pairs(hashes: rd.Dataset, *, max_hamming: int = 3,
                     buckets: int | None = None) -> rd.Dataset:
    """Image near-duplicate pairs by pHash Hamming distance <=
    ``max_hamming`` — the pigeonhole banding of ``ops/dedup``'s SimHash
    path applied to 64-bit pHashes: 4 x 16-bit bands guarantee any pair
    within Hamming 3 collides on at least one band; candidates verify
    exactly inside their band bucket. Returns (id_a, id_b, hamming),
    id_a < id_b, deduplicated across bands."""
    from .agg import bucketed_groupby

    if max_hamming >= 4:
        raise ValueError("4x16-bit banding guarantees recall only for "
                         "max_hamming <= 3")

    def band(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["hashed"]] if "hashed" in df.columns else df
        h = df["phash"].to_numpy(np.uint64)
        out = []
        for b in range(4):
            key = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            out.append(pd.DataFrame({
                "band": np.int64(b),
                "bkey": key.astype(np.int64),
                "item_id": df["item_id"].to_numpy(),
                "phash": h.astype("uint64")}))
        return pd.concat(out, ignore_index=True)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, ham = [], [], []
        for _, g in df.groupby(["band", "bkey"], sort=False):
            if len(g) < 2:
                continue
            ids = g["item_id"].to_numpy()
            hs = g["phash"].to_numpy(np.uint64)
            i, j = np.triu_indices(len(g), k=1)
            d = np.bitwise_xor(hs[i], hs[j])
            # popcount via unpackbits on the byte view
            bits = np.unpackbits(d.view(np.uint8).reshape(len(d), 8),
                                 axis=1).sum(axis=1)
            keep = bits <= max_hamming
            a, b = ids[i][keep], ids[j][keep]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            rows_a.append(lo)
            rows_b.append(hi)
            ham.append(bits[keep])
        if not rows_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "hamming": pd.Series([], dtype="int64")})
        return (pd.DataFrame({"id_a": np.concatenate(rows_a),
                              "id_b": np.concatenate(rows_b),
                              "hamming": np.concatenate(ham).astype("int64")})
                .drop_duplicates(["id_a", "id_b"]))

    banded = hashes.map_batches(band, batch_format="pandas")
    cand = bucketed_groupby(banded, ["band", "bkey"], verify,
                            buckets=buckets)
    # a pair can collide on several bands in DIFFERENT buckets: final
    # cross-band dedup on the pair key
    return bucketed_groupby(
        cand, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]), buckets=buckets)


def afp64(pcm: np.ndarray, sample_rate: int) -> int | None:
    """64-bit spectral audio fingerprint (the pHash recipe in the
    time-frequency plane): 4 equal time segments x 16 log-spaced
    frequency bands of FFT energy, log-compressed, thresholded against
    the median — frequency-fine because a stationary tone makes every
    time segment identical. Robust to small additive noise and
    re-encoding; Hamming distance tracks audible difference. Returns
    None for degenerate clips (< 128 samples) — no meaningful spectrum
    exists, and a sentinel hash would pair every short clip with every
    other."""
    x = pcm.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n_seg, n_band = 4, 16
    seg = len(x) // n_seg
    if seg < 2 * n_band:
        return None
    frames = x[:n_seg * seg].reshape(n_seg, seg)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    nyq = spec.shape[1]
    # 16 log-spaced bands over [nyq/256, nyq): frequency resolution is
    # what separates clips (a stationary tone makes every time segment
    # identical, so the split must be fine in FREQUENCY, not time)
    edges = np.unique(np.geomspace(max(2, nyq // 256), nyq,
                                   n_band + 1).astype(int))
    while len(edges) < n_band + 1:             # degenerate tiny input
        edges = np.append(edges, edges[-1] + 1)
    bands = np.stack([spec[:, edges[i]:edges[i + 1]].sum(axis=1)
                      for i in range(n_band)], axis=1)  # 4 x 16
    feat = np.log1p(bands).ravel()                      # 64 values
    bits = feat > np.median(feat)
    return int(np.packbits(bits).view(">u8")[0])


class AudioFPHasher:
    """Actor-pool audio-fingerprint stage: stdlib WAV decode -> afp64.
    Emits the same (item_id, phash:uint64, hashed:bool) layout as
    ImagePHasher so ``phash_near_pairs`` works unchanged on audio."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for payload, kind in zip(batch["payload"].to_pylist(),
                                 batch["media_type"].to_pylist()):
            if kind != "audio" or not bytes(payload).startswith(b"RIFF"):
                hashes.append(0)
                ok.append(False)
                continue
            pcm, sr = decode_wav(bytes(payload))
            fp = afp64(pcm, sr)
            hashes.append(0 if fp is None else fp)
            ok.append(fp is not None)
        return pa.table({
            "item_id": batch["item_id"],
            "phash": pa.array(hashes, pa.uint64()),
            "hashed": pa.array(ok, pa.bool_()),
        })


def fingerprint_audio(ds: rd.Dataset, *, concurrency: int = 2,
                      batch_size: int = 16) -> rd.Dataset:
    return ds.map_batches(AudioFPHasher, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size)
