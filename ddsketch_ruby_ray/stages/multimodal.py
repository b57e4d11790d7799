"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing is real and tested: schemas, actor lifecycle (decoder
"model" built once per actor in ``__init__``), batch sizing for large binary
payloads, and the output layout.  The actual codec calls are STUBBED - this
container ships no PIL/libsndfile/ffmpeg - behind ``_import_decoder``:
each stage tries the real library first and otherwise uses a deterministic
fake decoder driven by the payload header + sha256, raising
``NotImplementedError`` only when ``strict=True``.

Scale notes: binary payloads are big, so these stages want SMALL batch
sizes (``batch_size=32-256``) and actor pools (``concurrency=(n, m)``) so
decode state is built once per actor; outputs drop the payload column so the
downstream pipeline never re-ships bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "IMAGE_META_TYPE",
    "ImageDecodeStage",
    "AudioFeatureStage",
    "FrameSampleStage",
    "synthesize_media_batch",
]

IMAGE_META_TYPE = pa.struct(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("channels", pa.int32()),
        pa.field("format", pa.string()),
    ]
)


def synthesize_media_batch(batch: dict) -> pa.Table:
    """Deterministic fake media rows: 16-byte header (magic, w, h, c) + noise.

    Stands in for real image bytes so the stage plumbing is testable without
    codecs; the "decoder" below parses exactly this header.
    """
    idx = np.asarray(batch["id"], dtype=np.int64)
    payloads, fmts = [], []
    for i in idx:
        w = 32 + int(i) % 7 * 16
        h = 32 + int(i) % 5 * 16
        c = 3 if i % 4 else 1
        body = hashlib.sha256(str(int(i)).encode()).digest() * 4
        payloads.append(struct.pack("<4sIII", b"FAKE", w, h, c) + body)
        fmts.append("png" if i % 2 else "jpeg")
    return pa.table(
        {
            "media_id": pa.array(idx, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
        }
    )


def _import_decoder(strict: bool):
    """Try the real imaging stack; fall back to the deterministic stub."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        if strict:
            raise NotImplementedError(
                "image decoding requires PIL; install it or run with strict=False "
                "to use the deterministic stub decoder"
            )
        return "stub"


class ImageDecodeStage:
    """Actor-pool stage: (media_id, payload, format) -> (media_id, meta, embedding).

    Use as ``ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=64)``.  The decoder handle is built ONCE per
    actor here in ``__init__`` (the input_hint actor-pool contract).
    """

    def __init__(self, *, embedding_dim: int = 16, strict: bool = False):
        self.backend = _import_decoder(strict)
        self.embedding_dim = int(embedding_dim)

    def _decode_meta(self, payload: bytes, fmt: str):
        if self.backend == "pil":  # pragma: no cover
            raise NotImplementedError("real PIL decode path not exercised here")
        if len(payload) >= 16 and payload[:4] == b"FAKE":
            _, w, h, c = struct.unpack("<4sIII", payload[:16])
        else:  # unknown blob: metadata only from size
            w = h = 0
            c = 0
        return {"width": w, "height": h, "channels": c, "format": fmt}

    def _embed(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-embedding from the content hash
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer((d * ((self.embedding_dim * 8) // len(d) + 1))[: self.embedding_dim * 8], dtype=np.uint64)
        return (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        metas = [self._decode_meta(p, f) for p, f in zip(payloads, fmts)]
        embs = [self._embed(p).tolist() for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "meta": pa.array(metas, IMAGE_META_TYPE),
                "embedding": pa.array(embs, pa.list_(pa.float64())),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: audio payload -> fixed-size feature vector (stub).

    Real path would load an audio frontend once per actor; the stub derives
    deterministic "loudness curve" features from payload bytes.
    """

    def __init__(self, *, n_features: int = 8, strict: bool = False):
        if strict:
            raise NotImplementedError("audio decoding requires an audio stack")
        self.n_features = int(n_features)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            arr = np.frombuffer(p[: (len(p) // 8) * 8], dtype=np.uint64)
            if arr.size == 0:
                feats.append([0.0] * self.n_features)
                continue
            chunks = np.array_split(arr, self.n_features)
            feats.append([float(c.astype(np.float64).mean() / 2**64) if c.size else 0.0 for c in chunks])
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload -> k evenly-spaced "frame" digests (stub).

    Output is one row per sampled frame (flat_map-style fan-out), the layout
    a real frame sampler would produce.
    """

    def __init__(self, *, frames: int = 4, strict: bool = False):
        if strict:
            raise NotImplementedError("video decoding requires ffmpeg")
        self.frames = int(frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_digest = [], [], []
        for mid, p in zip(ids, payloads):
            n = max(len(p), 1)
            for f in range(self.frames):
                lo = (n * f) // self.frames
                hi = max((n * (f + 1)) // self.frames, lo + 1)
                out_id.append(mid)
                out_idx.append(f)
                out_digest.append(hashlib.sha256(p[lo:hi]).hexdigest()[:16])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_idx, pa.int32()),
                "digest": pa.array(out_digest, pa.string()),
            }
        )
