"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media payloads with typed metadata.

The JPEG/PNG/audio codecs aren't available in this container (task brief), so
that codec boundary is STUBBED: ``FakeCodec`` produces deterministic pixel
arrays derived from the payload bytes, and ``RealCodec`` raises
``NotImplementedError`` until a codec library is installed. ``PpmCodec`` is a
REAL decode path (binary PPM parses with numpy alone) proving the seam with
actual pixels end-to-end. Everything on the Ray side — schemas, actor-pool
signatures, batch sizing for large binary rows, output layout — is real and
tested.

Scale notes: media rows are WIDE (binary payloads), so these stages use small
``batch_size`` (payload × batch × concurrency must fit the worker heap) and
``batch_format="pyarrow"`` so payloads stay zero-copy until the codec call.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("out_width", pa.int32()),
        ("out_height", pa.int32()),
        ("frames_sampled", pa.int32()),
    ]
)


class FakeCodec:
    """Deterministic stand-in codec: 'decodes' payload bytes into a pixel
    array seeded by the payload digest. Replace with a real codec off-sandbox."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class RealCodec:
    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "no image/audio codec available in this environment; "
            "install one and swap FakeCodec for RealCodec"
        )


class PpmCodec:
    """A REAL decoder — binary PPM (P6) needs no codec library, so the decode
    boundary is exercised end-to-end with actual pixels: header
    ``P6 <ws> width <ws> height <ws> 255 <single ws>`` then raw RGB24 raster
    (comments `#…` allowed in the header per the netpbm spec). The width/
    height arguments are advisory; the payload header is authoritative.
    JPEG/PNG/audio still go through the RealCodec seam when a library
    exists — same ``.decode`` signature."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not payload.startswith(b"P6"):
            raise ValueError("PpmCodec: payload is not binary PPM (P6)")
        idx, vals = 2, []
        while len(vals) < 3:
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":
                while idx < len(payload) and payload[idx] != 0x0A:
                    idx += 1
                continue
            start = idx
            while idx < len(payload) and not payload[idx : idx + 1].isspace():
                idx += 1
            vals.append(int(payload[start:idx]))
        idx += 1  # exactly one whitespace byte separates maxval from the raster
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError(f"PpmCodec: only maxval=255 supported, got {maxval}")
        if len(payload) < idx + w * h * 3:
            raise ValueError("PpmCodec: truncated raster")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
        return raster.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of PpmCodec.decode — test/synthesis helper."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


class MediaFeaturizer:
    """Actor-pool stage: decode → resize → (video) frame-sample → feature.

    Codec state is built ONCE per actor in ``__init__``; each batch is
    processed row-wise at the codec boundary (codecs are per-item) but all
    array math is numpy. Feature = 16-bin channel histogram of the resized
    image (a deterministic stand-in for a real embedding model).
    """

    def __init__(self, out_size: int = 32, frame_stride: int = 4, codec: Optional[object] = None):
        self.codec = codec or FakeCodec()
        self.out_size = out_size
        self.frame_stride = frame_stride

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(self.out_size) * h // self.out_size).clip(0, h - 1)
        xs = (np.arange(self.out_size) * w // self.out_size).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        frames = batch.column("n_frames").to_pylist()

        feats, sampled = [], []
        for ref, mtype, payload, w, h, nf in zip(refs, types, payloads, widths, heights, frames):
            if mtype == "video":
                frame_ids = list(range(0, max(nf, 1), self.frame_stride))
            else:
                frame_ids = [0]
            acc = np.zeros(48, dtype=np.float64)
            for fi in frame_ids:
                img = self.codec.decode(payload + fi.to_bytes(4, "big"), w, h)
                small = self._resize(img)
                for c in range(3):
                    hist, _ = np.histogram(small[..., c], bins=16, range=(0, 256))
                    acc[c * 16:(c + 1) * 16] += hist
            acc /= max(len(frame_ids), 1)
            feats.append((acc / max(acc.sum(), 1e-9)).astype(np.float32).tolist())
            sampled.append(len(frame_ids))

        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(types, pa.string()),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array([self.out_size] * len(refs), pa.int32()),
                pa.array([self.out_size] * len(refs), pa.int32()),
                pa.array(sampled, pa.int32()),
            ],
            schema=FEATURE_SCHEMA,
        )


def featurize_media(
    ds: ray.data.Dataset,
    out_size: int = 32,
    frame_stride: int = 4,
    batch_size: int = 16,      # small: binary payloads are wide rows
    concurrency: Optional[int] = None,
    codec: Optional[object] = None,
) -> ray.data.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(MediaFeaturizer(out_size, frame_stride, codec=codec), **kwargs)


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic synthetic media table for tests/bench."""
    rng = np.random.RandomState(seed)
    refs, types, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        mtype = ["image", "video", "audio"][i % 3]
        refs.append(f"media://synth/{i}")
        types.append(mtype)
        payloads.append(rng.bytes(256))
        ws.append(int(rng.randint(16, 128)))
        hs.append(int(rng.randint(16, 128)))
        fs.append(int(rng.randint(1, 32)) if mtype == "video" else 1)
    return pa.Table.from_arrays(
        [
            pa.array(refs), pa.array(types), pa.array(payloads, pa.binary()),
            pa.array(ws, pa.int32()), pa.array(hs, pa.int32()), pa.array(fs, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Ref → blob hydration (the synthetic stand-in for an object-store fetch)
# ---------------------------------------------------------------------------

def hydrate_ref_scalar(ref: str) -> dict:
    """Deterministic media record for a ``media://…`` ref — the single-ref
    definition of the synthetic blob store (pure function of the ref, same
    contract as corpus.py's doc generator). Shared by the pipeline stage and
    the scalar golden: it DEFINES the data; the featurizer math is what the
    golden re-derives independently."""
    d = hashlib.blake2b(ref.encode(), digest_size=32).digest()
    h = int.from_bytes(d[:8], "big")
    mtype = ["image", "video", "audio"][h % 3]
    return {
        "media_ref": ref,
        "media_type": mtype,
        "payload": d * 8,  # 256 bytes
        "width": 16 + (h >> 8) % 112,
        "height": 16 + (h >> 16) % 112,
        "n_frames": 1 + (h >> 24) % 31 if mtype == "video" else 1,
    }


def hydrate_media_refs(
    ds: ray.data.Dataset,
    ref_col: str = "media_ref",
    keep_cols: tuple = (),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Hydrate media refs into payload rows (MEDIA_SCHEMA [+ keep_cols]).

    In production this is the I/O stage that GETs each blob from object
    storage — an actor-pool map_batches with small batches so payload ×
    batch × concurrency fits the worker heap; here the fetch is the
    deterministic synthesis above. Output columns are explicitly typed so
    empty blocks keep a joinable schema."""
    def hyd(t: pa.Table) -> pa.Table:
        rows = [hydrate_ref_scalar(r) for r in t.column(ref_col).to_pylist()]
        cols = {c: t.column(c) for c in keep_cols}
        cols["media_ref"] = pa.array([r["media_ref"] for r in rows], pa.string())
        cols["media_type"] = pa.array([r["media_type"] for r in rows], pa.string())
        cols["payload"] = pa.array([r["payload"] for r in rows], pa.binary())
        cols["width"] = pa.array([r["width"] for r in rows], pa.int32())
        cols["height"] = pa.array([r["height"] for r in rows], pa.int32())
        cols["n_frames"] = pa.array([r["n_frames"] for r in rows], pa.int32())
        return pa.table(cols)

    return ds.map_batches(hyd, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# Real-pixel resize stage (PPM end-to-end — no codec library needed)
# ---------------------------------------------------------------------------

def synth_ppm_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic REAL images: gradient+noise RGB rasters of varied
    sizes, binary-PPM encoded — every byte a pure function of (seed, i)."""
    rng = np.random.RandomState(seed)
    refs, types, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            rng.randint(0, 256, (h, w)),
        ], axis=-1).astype(np.uint8)
        refs.append(f"media://ppm/{i}")
        types.append("image")
        payloads.append(encode_ppm(img))
        ws.append(w)
        hs.append(h)
        fs.append(1)
    return pa.Table.from_arrays(
        [
            pa.array(refs), pa.array(types), pa.array(payloads, pa.binary()),
            pa.array(ws, pa.int32()), pa.array(hs, pa.int32()), pa.array(fs, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class PpmResizer:
    """Actor-pool stage: decode PPM → nearest-neighbor resize to a fixed
    (out_w, out_h) → re-encode. Codec built ONCE per actor; the resize is
    the standard index-map gather (``src = dst·src_dim // dst_dim``) —
    integer arithmetic only, so engine and scalar golden agree per pixel.
    Output rows carry the resized payload plus a pixel checksum and a
    sha256 (string) for cheap value comparison."""

    def __init__(self, out_w: int = 16, out_h: int = 12):
        self.codec = PpmCodec()
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_p, sums, shas = [], [], []
        for payload in payloads:
            img = self.codec.decode(payload, 0, 0)
            h, w = img.shape[:2]
            ys = np.arange(self.out_h) * h // self.out_h
            xs = np.arange(self.out_w) * w // self.out_w
            resized = img[np.ix_(ys, xs)]
            enc = encode_ppm(resized)
            out_p.append(enc)
            sums.append(int(resized.sum()))
            shas.append(hashlib.sha256(enc).hexdigest())
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "out_width": pa.array([self.out_w] * len(refs), pa.int32()),
            "out_height": pa.array([self.out_h] * len(refs), pa.int32()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "payload_sha": pa.array(shas, pa.string()),
            "payload": pa.array(out_p, pa.binary()),
        })


def resize_media(
    ds: ray.data.Dataset,
    out_w: int = 16,
    out_h: int = 12,
    batch_size: int = 16,
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(PpmResizer(out_w, out_h), **kwargs)


# ---------------------------------------------------------------------------
# Real-audio stage (WAV/PCM16 end-to-end — stdlib struct only, no codec lib)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM 16-bit mono little-endian."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


class WavCodec:
    """A REAL audio decoder — PCM 16-bit mono WAV needs only stdlib struct,
    so the audio decode boundary is exercised end-to-end with actual
    samples (the JPEG/OGG/MP3 analog stays behind the RealCodec seam).
    Returns (samples int16 array, sample_rate)."""

    def decode_wav(self, payload: bytes):
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("WavCodec: payload is not RIFF/WAVE")
        pos = 12
        rate, data = None, None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"fmt ":
                fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
                if fmt != 1 or ch != 1 or bits != 16:
                    raise ValueError("WavCodec: only PCM 16-bit mono supported")
            elif tag == b"data":
                data = np.frombuffer(body, dtype="<i2")
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or data is None:
            raise ValueError("WavCodec: missing fmt/data chunk")
        return data, rate


def synth_wav_table(n: int, seed: int = 13) -> pa.Table:
    """Deterministic REAL audio: sine bursts + integer noise, PCM16-encoded
    — every byte a pure function of (seed, i)."""
    rng = np.random.RandomState(seed)
    refs, types, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        n_samp = int(rng.randint(400, 2000))
        t = np.arange(n_samp)
        freq = float(rng.uniform(50, 800))
        wave = 8000.0 * np.sin(2 * np.pi * freq * t / 8000.0)
        noise = rng.randint(-500, 500, n_samp)
        samples = np.clip(wave + noise, -32768, 32767).astype(np.int16)
        refs.append(f"media://wav/{i}")
        types.append("audio")
        payloads.append(encode_wav(samples))
        ws.append(0)
        hs.append(0)
        fs.append(1)
    return pa.Table.from_arrays(
        [
            pa.array(refs), pa.array(types), pa.array(payloads, pa.binary()),
            pa.array(ws, pa.int32()), pa.array(hs, pa.int32()), pa.array(fs, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class WavFeaturizer:
    """Actor-pool stage: decode WAV → framed RMS energy (window/hop), the
    VAD/loudness feature a speech-data pipeline computes first. Exact
    determinism: frame energy sums are INTEGER (Σ x², x int16 — exact in
    int64), the mean is one int/int division and sqrt is IEEE
    correctly-rounded, so engine and scalar golden produce the same double
    (the exact_corr contract); rounded half-away to 6. One exploded row
    per frame: (media_ref, frame_idx, rms)."""

    def __init__(self, window: int = 256, hop: int = 128):
        self.codec = WavCodec()
        self.window = window
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        from pdftext_ray.ops import round_half_away

        refs_out: list = []
        idx_out: list = []
        rms_out: list = []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            samples, _rate = self.codec.decode_wav(payload)
            x = samples.astype(np.int64)
            for fi, start in enumerate(range(0, max(len(x) - self.window + 1, 1), self.hop)):
                frame = x[start : start + self.window]
                if len(frame) == 0:
                    continue
                e = int((frame * frame).sum())  # exact integer energy
                # math.sqrt is IEEE correctly-rounded (** 0.5 is pow, which
                # is not guaranteed to be) — shared with the scalar golden
                rms = float(round_half_away(math.sqrt(e / len(frame)), 6))
                refs_out.append(ref)
                idx_out.append(fi)
                rms_out.append(rms)
        return pa.table({
            "media_ref": pa.array(refs_out, pa.string()),
            "frame_idx": pa.array(idx_out, pa.int64()),
            "rms": pa.array(rms_out, pa.float64()),
        })


def audio_features(
    ds: ray.data.Dataset,
    window: int = 256,
    hop: int = 128,
    batch_size: int = 16,
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(WavFeaturizer(window, hop), **kwargs)


# ---------------------------------------------------------------------------
# Real-video stage (PPMV: concatenated PPM frames — frame-sample real pixels)
# ---------------------------------------------------------------------------

def encode_ppmv(frames) -> bytes:
    """Minimal video container: b'PPMV' + frame count + length-prefixed
    binary-PPM frames. Enough structure to exercise REAL frame seeking."""
    import struct

    blobs = [encode_ppm(f) for f in frames]
    out = [b"PPMV", struct.pack("<I", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


class PpmvCodec:
    """A REAL video decoder: walks the PPMV index and decodes ONLY the
    requested frames (the seek-then-decode shape a real container decoder
    has — sampling must not pay for skipped frames)."""

    def __init__(self):
        self._img = PpmCodec()

    def sample_frames(self, payload: bytes, stride: int):
        import struct

        if payload[:4] != b"PPMV":
            raise ValueError("PpmvCodec: payload is not PPMV")
        n = struct.unpack("<I", payload[4:8])[0]
        pos = 8
        offsets = []
        for _ in range(n):
            size = struct.unpack("<I", payload[pos : pos + 4])[0]
            offsets.append((pos + 4, size))
            pos += 4 + size
        out = []
        for fi in range(0, n, stride):
            off, size = offsets[fi]
            out.append((fi, self._img.decode(payload[off : off + size], 0, 0)))
        return out


def synth_ppmv_table(n: int, seed: int = 17) -> pa.Table:
    """Deterministic REAL videos: 3–9 gradient+noise frames each."""
    rng = np.random.RandomState(seed)
    refs, types, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.randint(8, 24))
        h = int(rng.randint(8, 24))
        nf = int(rng.randint(3, 10))
        frames = []
        for k in range(nf):
            yy, xx = np.mgrid[0:h, 0:w]
            frames.append(np.stack([
                (xx * 255 // max(w - 1, 1)),
                np.full((h, w), (k * 37) % 256),
                rng.randint(0, 256, (h, w)),
            ], axis=-1).astype(np.uint8))
        refs.append(f"media://ppmv/{i}")
        types.append("video")
        payloads.append(encode_ppmv(frames))
        ws.append(w)
        hs.append(h)
        fs.append(nf)
    return pa.Table.from_arrays(
        [
            pa.array(refs), pa.array(types), pa.array(payloads, pa.binary()),
            pa.array(ws, pa.int32()), pa.array(hs, pa.int32()), pa.array(fs, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class PpmvFrameStats:
    """Actor-pool stage: seek-sample every ``stride``-th frame, emit exact
    per-channel pixel means — integer sums / count, one division each,
    round half-away 6 (the WavFeaturizer exactness contract). One row per
    sampled frame: (media_ref, frame_idx, mean_r, mean_g, mean_b)."""

    def __init__(self, stride: int = 2):
        self.codec = PpmvCodec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pdftext_ray.ops import round_half_away

        refs_out: list = []
        idx_out: list = []
        means = ([], [], [])
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            for fi, img in self.codec.sample_frames(payload, self.stride):
                npix = img.shape[0] * img.shape[1]
                refs_out.append(ref)
                idx_out.append(fi)
                for c in range(3):
                    s = int(img[:, :, c].astype(np.int64).sum())
                    means[c].append(float(round_half_away(s / npix, 6)))
        return pa.table({
            "media_ref": pa.array(refs_out, pa.string()),
            "frame_idx": pa.array(idx_out, pa.int64()),
            "mean_r": pa.array(means[0], pa.float64()),
            "mean_g": pa.array(means[1], pa.float64()),
            "mean_b": pa.array(means[2], pa.float64()),
        })


def video_frame_stats(
    ds: ray.data.Dataset,
    stride: int = 2,
    batch_size: int = 16,
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(PpmvFrameStats(stride), **kwargs)
