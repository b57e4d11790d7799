"""IMA/DVI ADPCM (WAV format tag 0x11) codec, pure numpy/Python.

The classic 4-bit telephony/game-audio compressor: each sample is a nibble
driving a predictor + adaptive step size (IMA "Recommended Practices for
Enhancing Digital Audio Compatibility", 1992; the tables and update rules
are the published constants).  Mono only — the synthetic corpus and the
feature stage need one real compressed-audio path, not a full container
matrix.

Block layout (fmt tag 0x11, mono): each ``block_align``-byte block starts
with a 4-byte header (int16 predictor = the block's FIRST decoded sample,
uint8 step index, uint8 reserved) followed by data bytes holding two
samples each, LOW nibble first.

Decoding is inherently sequential (predictor feedback), so the inner loop
is per-sample Python — acceptable because audio rows decode inside the
actor-pool feature stage at bounded payload sizes, never in a vectorized
hot path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_ima_adpcm_blocks", "encode_ima_adpcm_wav", "ima_decode_nibbles"]

# published IMA tables
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(v: int) -> int:
    return 0 if v < 0 else (88 if v > 88 else v)


def ima_decode_nibbles(nibbles, predictor: int, index: int) -> np.ndarray:
    """Decode a nibble sequence given the block-header state -> int16[n]."""
    out = np.empty(len(nibbles), dtype=np.int16)
    pred = int(predictor)
    idx = _clamp_idx(int(index))
    for k, nib in enumerate(nibbles):
        step = int(STEP_TABLE[idx])
        # shift-add reconstruction: diff = (2*mag + 1) * step / 8, exactly
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = _clamp16(pred - diff if nib & 8 else pred + diff)
        idx = _clamp_idx(idx + int(INDEX_TABLE[nib]))
        out[k] = pred
    return out


def decode_ima_adpcm_blocks(data: bytes, block_align: int) -> np.ndarray:
    """Mono fmt-0x11 data chunk -> int16 samples (header sample included)."""
    if block_align < 5:
        raise ValueError("IMA ADPCM block_align must be >= 5")
    chunks = []
    for off in range(0, len(data) - (len(data) % block_align), block_align):
        pred, idx = struct.unpack_from("<hB", data, off)
        body = np.frombuffer(data, np.uint8, block_align - 4, off + 4)
        nibbles = np.empty(body.size * 2, dtype=np.uint8)
        nibbles[0::2] = body & 0x0F  # LOW nibble first
        nibbles[1::2] = body >> 4
        chunks.append(np.concatenate([[np.int16(pred)], ima_decode_nibbles(nibbles, pred, idx)]))
    if not chunks:
        raise ValueError("no complete IMA ADPCM block")
    return np.concatenate(chunks)


def _encode_block(samples: np.ndarray, index: int) -> tuple[bytes, int, np.ndarray]:
    """samples[0] becomes the header predictor; the rest encode as nibbles.

    Returns (block bytes sans padding, final index, exact reconstruction) —
    the reconstruction is what any conforming decoder must produce."""
    pred = int(samples[0])
    idx = _clamp_idx(int(index))
    nibbles = []
    recon = [pred]
    for s in samples[1:]:
        step = int(STEP_TABLE[idx])
        diff = int(s) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        # track the decoder's state exactly
        d = step >> 3
        if nib & 4:
            d += step
        if nib & 2:
            d += step >> 1
        if nib & 1:
            d += step >> 2
        pred = _clamp16(pred - d if nib & 8 else pred + d)
        idx = _clamp_idx(idx + int(INDEX_TABLE[nib]))
        nibbles.append(nib)
        recon.append(pred)
    packed = bytearray()
    for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
        packed.append(lo | (hi << 4))
    if len(nibbles) % 2:
        packed.append(nibbles[-1])
    hdr = struct.pack("<hBB", int(samples[0]), _clamp_idx(int(index)), 0)
    return hdr + bytes(packed), idx, np.asarray(recon, dtype=np.int16)


def encode_ima_adpcm_wav(
    samples: np.ndarray, *, rate: int = 8000, block_align: int = 256
) -> tuple[bytes, np.ndarray]:
    """Mono int16 -> (complete RIFF/WAVE fmt-0x11 payload, exact expected
    reconstruction).  Trailing samples short of a block are dropped (the
    format is block-granular)."""
    samples = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1  # header sample + 2 nibbles/byte
    nblocks = len(samples) // spb
    if nblocks == 0:
        raise ValueError(f"need at least {spb} samples for one block")
    idx = 0
    blocks, recons = [], []
    for b in range(nblocks):
        blk, idx, recon = _encode_block(samples[b * spb : (b + 1) * spb], idx)
        assert len(blk) == block_align
        blocks.append(blk)
        recons.append(recon)
    data = b"".join(blocks)
    fmt = struct.pack(
        "<IHHIIHHHH",
        20,  # fmt chunk size: 16 + cbSize(2) + extra(2)
        0x11,  # IMA ADPCM
        1,  # mono
        rate,
        (rate * block_align + spb - 1) // spb,  # avg bytes/sec (informative)
        block_align,
        4,  # bits per sample
        2,  # cbSize
        spb,  # wSamplesPerBlock
    )
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + 20) + (8 + len(data)))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return payload, np.concatenate(recons)
