"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool ``map_batches`` stages.

Decode support is split by what pure numpy can actually do:

* REAL decoders (no codec library needed, implemented here from the public
  format specs): Netpbm **PPM (P6) / PGM (P5)** images, **PNG** (stdlib
  zlib inflate + numpy scanline unfiltering, all five filter types, 8-bit
  gray/RGB/gray-alpha/RGBA), **GIF** (87a/89a first frame, real LZW with
  interlace - stages/gif.py), RIFF **WAV PCM-16** audio, and **YUV4MPEG2
  (Y4M)** video frame streams.  Features computed from these are real
  pixel/sample math (block-mean pooling, windowed RMS), deterministic to
  the bit (integer sums, exact float64 divisions).
* REMAINING COMPRESSED formats (jpeg/flac/mp4) need PIL/ffmpeg, which this
  container does not ship: they fall back to a deterministic content-hash
  stub, or raise ``NotImplementedError`` under ``strict=True``.  The try
  -import hook (`_try_pil`) picks PIL up automatically when present.

Scale notes: binary payloads are big, so these stages want SMALL batch
sizes (``batch_size=32-256``) and actor pools (``concurrency=(n, m)``) so
decode state is built once per actor; outputs drop the payload column so
the downstream pipeline never re-ships bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

__all__ = [
    "IMAGE_META_TYPE",
    "ImageDecodeStage",
    "AudioFeatureStage",
    "FrameSampleStage",
    "decode_netpbm",
    "decode_png",
    "encode_png",
    "decode_wav_pcm16",
    "parse_y4m",
    "synthesize_media_batch",
]

PNG_SIG = b"\x89PNG\r\n\x1a\n"

IMAGE_META_TYPE = pa.struct(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("channels", pa.int32()),
        pa.field("format", pa.string()),
    ]
)


# -- real pure-numpy decoders -------------------------------------------------

def decode_netpbm(payload: bytes):
    """P6 (RGB) / P5 (gray) binary Netpbm -> (w, h, c, uint8[h, w, c]).

    Header per the spec: magic, whitespace/comment-separated width, height,
    maxval (<=255 supported), ONE whitespace byte, then raw samples.
    """
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if payload[:2] == b"P6" else 1
    # tokenize header: skip comments (# .. \n) and whitespace
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=i)
    return w, h, channels, body.reshape(h, w, channels)


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def decode_png(payload: bytes):
    """PNG -> (w, h, c, uint8[h, w, c]); stdlib zlib + numpy unfiltering.

    Real decode per the PNG spec (RFC 2083): chunk walk, IDAT concat +
    inflate, then per-scanline reversal of filters 0-4.  Supports 8-bit
    depth, color types 0/2/4/6, non-interlaced (Adam7 raises).  ``Up`` and
    ``Sub`` reverse vectorized (Sub is a mod-256 prefix sum per channel
    lane); ``Average``/``Paeth`` need the left-neighbour recurrence, so
    those scanlines walk pixels in Python — bounded by image width, and
    this whole decoder runs inside an actor-pool stage, never on the
    driver.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    i, n = 8, len(payload)
    w = h = depth = color = interlace = None
    idat = []
    while i + 8 <= n:
        (size,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + size  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth/color ({depth}/{color})")
    if interlace:
        raise ValueError("Adam7 interlaced PNG not supported")
    c = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if raw.size != h * (1 + stride):
        raise ValueError("PNG data size mismatch")
    raw = raw.reshape(h, 1 + stride)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256 — exactly the spec
        elif f == 1:  # Sub: mod-256 prefix sum along each channel lane
            cur = np.cumsum(
                line.reshape(w, c).astype(np.uint64), axis=0, dtype=np.uint64
            ).astype(np.uint8).reshape(stride)
        else:  # Average (3) / Paeth (4): left-neighbour recurrence
            cur = np.empty(stride, dtype=np.uint8)
            up = prev.astype(np.int64)
            ln = line.astype(np.int64)
            left = np.zeros(c, dtype=np.int64)
            if f == 3:
                for x in range(w):
                    s = slice(x * c, (x + 1) * c)
                    left = (ln[s] + ((left + up[s]) >> 1)) & 0xFF
                    cur[s] = left
            elif f == 4:
                ul = np.zeros(c, dtype=np.int64)
                for x in range(w):
                    s = slice(x * c, (x + 1) * c)
                    b = up[s]
                    p = left + b - ul
                    pa_, pb, pc = np.abs(p - left), np.abs(p - b), np.abs(p - ul)
                    pred = np.where(
                        (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, b, ul)
                    )
                    left = (ln[s] + pred) & 0xFF
                    cur[s] = left
                    ul = b
            else:
                raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return w, h, c, out.reshape(h, w, c)


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8[h, w, c] -> PNG bytes (single IDAT, one filter for all rows).

    Deterministic: fixed zlib level 6, no ancillary chunks.  Supports the
    same 8-bit color types as :func:`decode_png`; ``filter_type`` 0 (None)
    or 2 (Up) keeps encoding fully vectorized (used by the test synthesizer
    to exercise both unfilter paths)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[c]
    flat = img.reshape(h, w * c)
    if filter_type == 0:
        body = flat
    elif filter_type == 2:
        body = flat.copy()
        body[1:] -= flat[:-1]  # uint8 wraps mod 256
    else:
        raise ValueError("encoder supports filter types 0 and 2 only")
    scan = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), body], axis=1
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes):
    """Windows BMP -> (w, h, c, uint8[h, w, c]); uncompressed (BI_RGB)
    24-bit BGR and 8-bit palettized, bottom-up or top-down rows, 4-byte
    row padding — the published BITMAPINFOHEADER layout."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, _, _, _, colors_used = struct.unpack_from("<IIiiI", payload, 30)
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} not supported")
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, h * stride, pix_off).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return w, h, 3, np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB
    ncol = colors_used or 256
    pal = np.frombuffer(payload, np.uint8, ncol * 4, 14 + hdr_size).reshape(ncol, 4)
    rgb_pal = np.ascontiguousarray(pal[:, 2::-1])  # BGRx -> RGB
    return w, h, 3, rgb_pal[rows[:, :w]]


def encode_bmp(img: np.ndarray, *, top_down: bool = False, palettized: bool = False) -> bytes:
    """uint8[h, w, 3] (or [h, w] grayscale when ``palettized``) -> BMP."""
    if palettized:
        h, w = img.shape[:2]
        gray = img if img.ndim == 2 else img[:, :, 0]
        pal = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = gray
        bpp, extra = 8, pal
    else:
        h, w, _ = img.shape
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
        bpp, extra = 24, b""
    body = (rows if top_down else rows[::-1]).tobytes()
    pix_off = 14 + 40 + len(extra)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0, len(body),
        2835, 2835, 256 if palettized else 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    return file_hdr + info + extra + body


def _g711_mulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear int16 lookup (the ubiquitous
    telephony companding; matches the classic Sun/CCITT decode table)."""
    u = ~np.arange(256, dtype=np.int64) & 0xFF  # bytes are stored inverted
    sign = u >> 7
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = ((mant << 3) + 0x84) << exp
    lin = mag - 0x84
    return np.where(sign == 1, -lin, lin).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear int16 lookup (even bits inverted)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    # in A-law the (inverted-alternate-bit) sign bit SET means positive
    return np.where(sign != 0, mag, -mag).astype(np.int16)


_MULAW_LUT = _g711_mulaw_table()
_ALAW_LUT = _g711_alaw_table()


def decode_wav_pcm16(payload: bytes):
    """RIFF/WAVE -> (sample_rate, n_channels, int16[frames, ch]).

    PCM 16-bit (format 1), the two G.711 companded telephony formats —
    A-law (6) and mu-law (7), via the ITU lookup tables — and mono IMA/DVI
    ADPCM (0x11, the published predictor + adaptive-step tables in
    stages/adpcm.py).  Real payloads, no stub."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    rate = channels = None
    fmt_tag = None
    block_align = 0
    data = None
    while i + 8 <= n:
        cid, size = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag == 1:
                if bits != 16:
                    raise ValueError("only PCM-16 supported")
            elif fmt_tag in (6, 7):
                if bits != 8:
                    raise ValueError("G.711 WAV must be 8-bit")
            elif fmt_tag == 0x11:
                if bits != 4:
                    raise ValueError("IMA ADPCM must be 4-bit")
                if channels != 1:
                    raise ValueError("IMA ADPCM: mono only")
            else:
                raise ValueError("only PCM-16 / A-law / mu-law / IMA ADPCM supported")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == 1:
        samples = np.frombuffer(
            data, dtype="<i2", count=(len(data) // (2 * channels)) * channels
        )
    elif fmt_tag == 0x11:
        from .adpcm import decode_ima_adpcm_blocks

        samples = decode_ima_adpcm_blocks(data, block_align)
    else:
        lut = _ALAW_LUT if fmt_tag == 6 else _MULAW_LUT
        raw = np.frombuffer(
            data, dtype=np.uint8, count=(len(data) // channels) * channels
        )
        samples = lut[raw]
    return rate, channels, samples.reshape(-1, channels)


def parse_y4m(payload: bytes):
    """YUV4MPEG2 stream -> (w, h, [frame Y-plane uint8[h, w], ...]) (4:2:0)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    hdr_end = payload.index(b"\n")
    w = h = None
    for tok in payload[9:hdr_end].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    frame_size = w * h + 2 * ((w // 2) * (h // 2))  # 4:2:0
    frames, i, n = [], hdr_end + 1, len(payload)
    while i < n and payload[i : i + 5] == b"FRAME":
        i = payload.index(b"\n", i) + 1
        y = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i).reshape(h, w)
        frames.append(y)
        i += frame_size
    return w, h, frames


def _try_pil():
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


# -- deterministic test-data synthesis ---------------------------------------

def _noise(seed: int, count: int) -> np.ndarray:
    d = hashlib.sha256(str(int(seed)).encode()).digest()
    reps = count // len(d) + 1
    return np.frombuffer((d * reps)[:count], dtype=np.uint8)


def synthesize_media_batch(batch: dict) -> pa.Table:
    """Deterministic media rows in REAL uncompressed formats (+ a stub row).

    id % 4 == 0 -> P6 PPM image; 1 -> P5 PGM; 2 -> WAV PCM-16 audio;
    3 -> Y4M video (3 frames).  Substitutions: id % 16 == 7 carries a REAL
    JPEG (alternating grayscale 4:4:4 / RGB 4:2:0; half baseline SOF0,
    half PROGRESSIVE SOF2 - the pure-numpy codec in stages/jpeg.py decodes
    both for real); id % 16 == 15 carries a
    fake "webp" blob so the unknown-compressed-format stub path stays
    exercised; id % 16 == 11 carries a REAL GIF (alternating interlaced)
    decoded by the pure-numpy LZW codec in stages/gif.py; id % 8 == 5 carries a REAL zlib-compressed PNG (alternating
    RGB/None-filter and gray/Up-filter) so the inflate + unfilter decode
    path is exercised end-to-end.
    """
    from .jpeg import encode_jpeg

    idx = np.asarray(batch["id"], dtype=np.int64)
    payloads, fmts = [], []
    for i in idx:
        i = int(i)
        w = 16 + i % 7 * 8
        h = 16 + i % 5 * 8
        if i % 16 == 7:
            c = 1 if i % 32 == 7 else 3
            img = _noise(i, w * h * c).reshape(h, w, c)
            if i % 64 in (23, 55):  # half the jpeg rows are PROGRESSIVE (SOF2)
                from .jpeg import encode_jpeg_progressive

                payloads.append(encode_jpeg_progressive(img, subsample=(c == 3)))
            else:
                payloads.append(encode_jpeg(img, subsample=(c == 3)))
            fmts.append("jpeg")
        elif i % 16 == 15:
            payloads.append(b"JUNK" + _noise(i, 128).tobytes())
            fmts.append("webp")
        elif i % 16 == 11:
            # REAL GIF (indexed noise + deterministic palette); alternates
            # interlaced so both row orders exercise the pure-numpy LZW codec
            from .gif import encode_gif

            pal = _noise(i ^ 0x6767, 768).reshape(256, 3)
            payloads.append(
                encode_gif(
                    _noise(i, w * h).reshape(h, w), pal, interlaced=(i % 32 == 11)
                )
            )
            fmts.append("gif")
        elif i % 8 == 5:
            c = 3 if i % 16 == 5 else 1
            img = _noise(i, w * h * c).reshape(h, w, c)
            payloads.append(encode_png(img, filter_type=0 if c == 3 else 2))
            fmts.append("png")
        elif i % 32 == 19:
            # REAL BMP (subset of the y4m residue class): alternates 24-bit
            # bottom-up RGB and 8-bit palettized top-down
            if i % 64 == 19:
                payloads.append(encode_bmp(_noise(i, w * h * 3).reshape(h, w, 3)))
            else:
                payloads.append(
                    encode_bmp(_noise(i, w * h).reshape(h, w), top_down=True, palettized=True)
                )
            fmts.append("bmp")
        elif i % 4 == 0:
            payloads.append(
                b"P6\n# synthetic\n%d %d\n255\n" % (w, h)
                + _noise(i, w * h * 3).tobytes()
            )
            fmts.append("ppm")
        elif i % 4 == 1:
            payloads.append(b"P5\n%d %d\n255\n" % (w, h) + _noise(i, w * h).tobytes())
            fmts.append("pgm")
        elif i % 4 == 2:
            rate, nsamp = 8000, 800 + (i % 5) * 80
            if i % 24 == 22:  # some audio rows are REAL IMA ADPCM (fmt 0x11)
                from .adpcm import encode_ima_adpcm_wav

                pcm = ((_noise(i, 2 * nsamp).astype(np.int16) - 128) * 200).astype(np.int16)
                payload, _ = encode_ima_adpcm_wav(
                    pcm[:nsamp], rate=rate, block_align=128
                )
                payloads.append(payload)
                fmts.append("wav")
                continue
            if i % 24 in (6, 14):  # a third of audio rows are G.711 telephony
                fmt_tag = 7 if i % 24 == 6 else 6  # mu-law / A-law
                data = _noise(i, nsamp).tobytes()
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, 1, rate, rate, 1, 8)
                    + b"data" + struct.pack("<I", len(data))
                )
            else:
                pcm = ((_noise(i, 2 * nsamp).astype(np.int16) - 128) * 200).astype("<i2")
                data = pcm[:nsamp].tobytes()
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data" + struct.pack("<I", len(data))
                )
            payloads.append(hdr + data)
            fmts.append("wav")
        else:
            frame = w * h + 2 * ((w // 2) * (h // 2))
            body = b"".join(
                b"FRAME\n" + _noise(i * 10 + f, frame).tobytes() for f in range(3)
            )
            payloads.append(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h) + body)
            fmts.append("y4m")
    return pa.table(
        {
            "media_id": pa.array(idx, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
        }
    )


# -- actor-pool stages --------------------------------------------------------

class ImageDecodeStage:
    """Actor-pool stage: (media_id, payload, format) -> (media_id, meta, embedding).

    Use as ``ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=64)``.  Decoder state is built ONCE per actor
    in ``__init__`` (the actor-pool contract).  PPM/PGM rows decode for
    real; compressed rows use PIL when importable, else the hash stub
    (``strict=True`` raises for them instead).
    """

    def __init__(self, *, embedding_dim: int = 16, strict: bool = False):
        self.has_pil = _try_pil()
        self.strict = bool(strict)
        self.embedding_dim = int(embedding_dim)

    def _hash_embed(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (d * ((self.embedding_dim * 8) // len(d) + 1))[: self.embedding_dim * 8],
            dtype=np.uint64,
        )
        return (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def _pixel_embed(self, img: np.ndarray) -> np.ndarray:
        """Block-mean pooled grid, flattened/cycled to embedding_dim.

        Integer sums -> one exact float64 division: bit-deterministic."""
        h, w, c = img.shape
        g = 4
        ys = (np.arange(g + 1) * h) // g
        xs = (np.arange(g + 1) * w) // g
        feats = np.empty(g * g * c, dtype=np.float64)
        k = 0
        acc = img.astype(np.int64)
        for yi in range(g):
            for xi in range(g):
                block = acc[ys[yi] : ys[yi + 1], xs[xi] : xs[xi + 1]]
                cnt = max(block.shape[0] * block.shape[1], 1)
                for ch in range(c):
                    feats[k] = block[:, :, ch].sum() / (cnt * 255.0)
                    k += 1
        reps = self.embedding_dim // feats.size + 1
        return np.tile(feats, reps)[: self.embedding_dim]

    def _decode_one(self, payload: bytes, fmt: str):
        if payload[:2] in (b"P6", b"P5"):
            w, h, c, img = decode_netpbm(payload)
            return (
                {"width": w, "height": h, "channels": c, "format": fmt},
                self._pixel_embed(img),
            )
        if payload[:8] == PNG_SIG:
            w, h, c, img = decode_png(payload)
            return (
                {"width": w, "height": h, "channels": c, "format": fmt},
                self._pixel_embed(img),
            )
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            # REAL GIF decode, pure numpy LZW (stages/gif.py)
            from .gif import decode_gif

            w, h, c, img = decode_gif(payload)
            return (
                {"width": w, "height": h, "channels": c, "format": fmt},
                self._pixel_embed(img),
            )
        if payload[:2] == b"BM":
            w, h, c, img = decode_bmp(payload)
            return (
                {"width": w, "height": h, "channels": c, "format": fmt},
                self._pixel_embed(img),
            )
        if payload[:2] == b"\xff\xd8":
            # REAL baseline JPEG decode, pure numpy (stages/jpeg.py);
            # progressive/12-bit raise NotImplementedError from the codec,
            # which is the strict-mode contract for unsupported variants
            from .jpeg import decode_jpeg

            w, h, c, img = decode_jpeg(payload)
            return (
                {"width": w, "height": h, "channels": c, "format": fmt},
                self._pixel_embed(img),
            )
        if self.has_pil:  # pragma: no cover
            raise NotImplementedError("PIL decode path untested in this container")
        if self.strict:
            raise NotImplementedError(
                f"no decoder for compressed format {fmt!r} (PIL not installed); "
                "run with strict=False for the deterministic stub"
            )
        return (
            {"width": 0, "height": 0, "channels": 0, "format": fmt},
            self._hash_embed(payload),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        metas, embs = [], []
        for p, f in zip(payloads, fmts):
            meta, emb = self._decode_one(p, f)
            metas.append(meta)
            embs.append(emb.tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "meta": pa.array(metas, IMAGE_META_TYPE),
                "embedding": pa.array(embs, pa.list_(pa.float64())),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: audio payload -> fixed-size loudness features.

    WAV PCM-16 rows decode for real: features are windowed RMS over the
    actual samples (exact int64 square sums -> one float64 sqrt), in [0, 1].
    Other formats: deterministic byte stub, or raise under ``strict=True``.
    """

    def __init__(self, *, n_features: int = 8, strict: bool = False):
        self.n_features = int(n_features)
        self.strict = bool(strict)

    def _wav_features(self, payload: bytes) -> list[float]:
        _, _, samples = decode_wav_pcm16(payload)
        mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
        if mono.size == 0:
            return [0.0] * self.n_features
        bounds = (np.arange(self.n_features + 1) * mono.size) // self.n_features
        out = []
        for k in range(self.n_features):
            seg = mono[bounds[k] : bounds[k + 1]]
            if seg.size == 0:
                out.append(0.0)
            else:
                out.append(float(np.sqrt((seg * seg).sum() / seg.size)) / 32768.0)
        return out

    def _stub_features(self, payload: bytes) -> list[float]:
        arr = np.frombuffer(payload[: (len(payload) // 8) * 8], dtype=np.uint64)
        if arr.size == 0:
            return [0.0] * self.n_features
        chunks = np.array_split(arr, self.n_features)
        return [
            float(c.astype(np.float64).mean() / 2**64) if c.size else 0.0
            for c in chunks
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            if p[:4] == b"RIFF":
                feats.append(self._wav_features(p))
            elif self.strict:
                raise NotImplementedError(
                    "no decoder for non-WAV audio (no audio stack installed)"
                )
            else:
                feats.append(self._stub_features(p))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload -> k evenly-spaced frame digests
    (flat_map-style fan-out, one row per sampled frame).

    Y4M rows sample REAL frames (digest of the actual Y plane); other
    formats fall back to evenly-spaced byte-range digests, or raise under
    ``strict=True``.
    """

    def __init__(self, *, frames: int = 4, strict: bool = False):
        self.frames = int(frames)
        self.strict = bool(strict)

    def _rows(self, mid: int, p: bytes):
        if p.startswith(b"YUV4MPEG2"):
            _, _, ys = parse_y4m(p)
            if ys:
                picks = [(len(ys) - 1) * f // max(self.frames - 1, 1) for f in range(self.frames)]
                return [
                    (mid, f, hashlib.sha256(ys[k].tobytes()).hexdigest()[:16])
                    for f, k in enumerate(picks)
                ]
        if self.strict:
            raise NotImplementedError("no decoder for non-Y4M video (no ffmpeg)")
        n = max(len(p), 1)
        out = []
        for f in range(self.frames):
            lo = (n * f) // self.frames
            hi = max((n * (f + 1)) // self.frames, lo + 1)
            out.append((mid, f, hashlib.sha256(p[lo:hi]).hexdigest()[:16]))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = [r for mid, p in zip(ids, payloads) for r in self._rows(mid, p)]
        return pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "frame": pa.array([r[1] for r in rows], pa.int32()),
                "digest": pa.array([r[2] for r in rows], pa.string()),
            }
        )
