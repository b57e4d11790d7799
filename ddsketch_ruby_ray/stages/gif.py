"""Pure-numpy GIF codec (GIF87a/89a, first frame): real LZW both directions.

Public-spec implementation (GIF89a specification, CompuServe 1990):
logical-screen / image descriptors, global + local color tables, interlace,
extension-block skipping, and the variable-width LSB-first LZW stream with
the decoder-synchronized width growth rule (width bumps when the JUST-ADDED
code fills the current width, i.e. the classic GIF "early change off"
convention) and explicit CLEAR re-emission before the 12-bit table fills.

Scope (mirrors the honest-decoder policy of stages/jpeg.py): decodes the
FIRST image of the stream to RGB via its palette; animation frames beyond
the first, transparency compositing and disposal methods are out of scope —
``decode_gif`` returns frame 1 exactly as the palette paints it.

Encoder writes single-image GIF89a from an index matrix + palette (the
native GIF data model); grayscale/RGB arrays can be fed through
``palette_quantize`` helpers upstream if needed.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_GIF_MAGIC = (b"GIF87a", b"GIF89a")
_MAX_CODE = 4096  # 12-bit LZW cap (GIF spec)
# interlace passes: (first row, step) in output order of the stream
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, mcs: int, expected: int) -> bytes:
    """GIF-LZW decompress ``expected`` pixel indices from the code stream."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    pw2 = 1 << np.arange(12, dtype=np.int64)
    out = bytearray()
    pos = 0
    width = mcs + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev = None
    nbits = bits.size
    while len(out) < expected:
        if pos + width > nbits:
            raise ValueError("GIF: LZW stream truncated")
        code = int(bits[pos : pos + width] @ pw2[:width])
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("GIF: pixel data short of image size")
    return bytes(out[:expected])


def _lzw_encode(idxs: bytes, mcs: int) -> bytes:
    """GIF-LZW compress; emits CLEAR up-front and again before table full."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    codes: list[tuple[int, int]] = []  # (code, width-at-emission)
    width = mcs + 1
    codes.append((clear, width))
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for ch in idxs:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # decoder-synchronized growth: its table (one entry behind ours)
        # reaches 2^width exactly when our next_code - 1 does
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODE - 1:  # re-clear before either side fills
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((eoi, width))

    # pack LSB-first
    buf = bytearray()
    acc = 0
    nb = 0
    for code, cw in codes:
        acc |= code << nb
        nb += cw
        while nb >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        buf.append(acc & 0xFF)
    return bytes(buf)


def decode_gif(payload: bytes):
    """-> (width, height, 3, rgb ndarray (h, w, 3) uint8) of the FIRST image."""
    if payload[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF payload")
    pos = 6
    _cw, _ch = struct.unpack("<HH", payload[pos : pos + 4])  # canvas (unused)
    packed = payload[pos + 4]
    pos += 7  # LSD: w h packed bg aspect
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte then sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        _l, _t, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ip = payload[pos + 9]
        pos += 10
        pal = gct
        if ip & 0x80:
            n = 2 << (ip & 7)
            pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image without any color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = np.frombuffer(_lzw_decode(bytes(data), mcs, iw * ih), np.uint8)
        if (idx >= pal.shape[0]).any():
            raise ValueError("GIF: pixel index outside color table")
        rows = idx.reshape(ih, iw)
        if ip & 0x40:  # interlaced: stream rows are in 4-pass order
            out = np.empty_like(rows)
            src = 0
            for first, step in _INTERLACE:
                cnt = len(range(first, ih, step))
                out[first::step] = rows[src : src + cnt]
                src += cnt
            rows = out
        return int(iw), int(ih), 3, pal[rows]
    raise ValueError("GIF: no image block before trailer")


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, *, interlaced: bool = False
) -> bytes:
    """Single-image GIF89a from an (h, w) index matrix + (n<=256, 3) palette."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = palette.shape[0]
    if not 2 <= n <= 256 or palette.shape[1] != 3:
        raise ValueError("palette must be (2..256, 3) uint8")
    if int(idx.max(initial=0)) >= n:
        raise ValueError("index outside palette")
    depth = max(1, int(n - 1).bit_length())  # table size exponent - 1 + 1
    size_exp = depth - 1
    tbl_n = 2 << size_exp
    pal_bytes = np.zeros((tbl_n, 3), np.uint8)
    pal_bytes[:n] = palette
    mcs = max(2, depth)  # LZW minimum code size (spec floor of 2)

    if interlaced:
        stream_rows = np.concatenate(
            [idx[first::step] for first, step in _INTERLACE], axis=0
        )
    else:
        stream_rows = idx
    comp = _lzw_encode(stream_rows.tobytes(), mcs)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_exp & 7), 0, 0])  # GCT flag+size, bg, aspect
    out += pal_bytes.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlaced else 0])
    out += bytes([mcs])
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)
