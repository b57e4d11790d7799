"""Baseline JFIF (JPEG) codec in pure numpy — no PIL, no libjpeg.

Closes the biggest ``strict=True`` hole in the media decode stage
(stages/multimodal.py): baseline sequential DCT JPEGs — the
highest-frequency compressed image format in any real corpus — now decode
for real inside the actor pool, like PNG/PPM/PGM/WAV/Y4M already do.

Scope (honest): BASELINE (SOF0/1, 8-bit, Huffman) and PROGRESSIVE (SOF2 —
all four T.81 Annex G scan kinds: DC/AC x first/refinement, spectral
selection, successive approximation, EOB-run coding), 1 or 3 components,
sampling factors 1–2 (so 4:4:4, 4:2:2 and 4:2:0 all decode), restart
markers supported.  Arithmetic coding, hierarchical and 12-bit raise
``NotImplementedError`` — the strict-mode contract, not a silent wrong
answer.  The encoders (baseline + a progressive one with a libjpeg-style
scan script) emit 4:4:4 or 4:2:0 with the ITU T.81 Annex K quantization
tables; they exist so tests and the media synthesizer can produce real
JPEGs in a container with no image libraries — and the progressive
round-trip pins the SOF2 decoder to bit-identical pixels vs baseline.

Everything is deterministic: entropy decode is exact; the only lossy steps
(quantization, chroma averaging, the fixed-point-free float IDCT + color
transforms) are fixed numpy expression trees, so the same bytes decode to
the same pixels on every run/node — the property the fingerprinting stage
requires.

Hot-path shape: the per-symbol Huffman loop is sequential by nature (each
code's length depends on the previous ones) and runs in Python over a
pre-unstuffed ``np.unpackbits`` array; the heavy math (dequantize, zigzag,
IDCT, upsample, color transform) is batched over ALL blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# zigzag[i] = raster index of the i-th coefficient in zigzag order
ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K.1 example quantization tables (quality ~50 reference)
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: A[u, x] = c(u) cos((2x+1) u pi / 16)
_X = np.arange(8)
_DCT_A = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT_A[0, :] = np.sqrt(0.125)


# ---------------------------------------------------------------------------
# Huffman table machinery (canonical codes per T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_decode_table(bits, vals):
    """-> (mincode[17], maxcode[17], valptr[17], vals) for sequential decode."""
    mincode = np.zeros(17, dtype=np.int64)
    maxcode = np.full(17, -1, dtype=np.int64)
    valptr = np.zeros(17, dtype=np.int64)
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        valptr[length] = k
        mincode[length] = code
        code += n
        k += n
        maxcode[length] = code - 1 if n else -1
        code <<= 1
    return mincode, maxcode, valptr, np.asarray(vals, dtype=np.int64)


def _build_encode_table(bits, vals):
    """-> {symbol: (code, length)}."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitReader:
    """Sequential MSB-first reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        p = self.pos
        bits = self.bits
        for i in range(n):
            v = (v << 1) | int(bits[p + i])
        self.pos = p + n
        return v

    def decode_symbol(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = 0
        p = self.pos
        bits = self.bits
        for length in range(1, 17):
            code = (code << 1) | int(bits[p])
            p += 1
            if code <= maxcode[length]:
                self.pos = p
                return int(vals[valptr[length] + code - mincode[length]])
        raise ValueError("invalid JPEG: huffman code longer than 16 bits")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes):
    """-> (width, height, channels, uint8 array (h, w, c)).

    Baseline sequential only; raises ``NotImplementedError`` for
    progressive/arithmetic/12-bit/non-interleaved and ``ValueError`` for
    corrupt or truncated streams.
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error):
        raise ValueError("invalid JPEG: truncated stream") from None


def _decode_jpeg(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    progressive = False
    scans = []  # progressive: every scan accumulates coefficient bits
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qt[tq] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int64
                )
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}: "
                "arithmetic/hierarchical/lossless)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy data follows
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            data_start = pos
            # entropy segment ends at the next non-RST marker
            i = data_start
            while i < n - 1:
                if payload[i] == 0xFF and payload[i + 1] != 0x00 and not (
                    0xD0 <= payload[i + 1] <= 0xD7
                ):
                    break
                i += 1
            ecs = payload[data_start:i]
            pos = i
            if not progressive:
                return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                                    restart_interval, ecs)
            scans.append(
                {
                    "comps": scan,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "dc_tbls": dict(huff_dc),
                    "ac_tbls": dict(huff_ac),
                    "ri": restart_interval,
                    "ecs": ecs,
                }
            )
        # APPn / COM / others: skipped
    if progressive and scans:
        return _decode_progressive(frame, scans, qt)
    raise ValueError("invalid JPEG: no SOS marker")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, restart_interval, ecs):
    if frame is None:
        raise ValueError("invalid JPEG: SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(scan) != len(comps):
        # spec-legal baseline can split components across sequential scans;
        # this decoder only handles the (ubiquitous) single interleaved scan
        raise NotImplementedError(
            f"non-interleaved JPEG scan ({len(scan)} of {len(comps)} components)"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError(f"invalid JPEG: scan component {s['id']} not in frame")
        c = by_id[s["id"]]
        try:
            c["dc_tbl"] = huff_dc[s["dc"]]
            c["ac_tbl"] = huff_ac[s["ac"]]
        except KeyError as e:
            raise ValueError(f"invalid JPEG: undefined huffman table {e}") from None
        c["coef"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
        )
        c["pred"] = 0

    # split on restart markers (each interval resets DC predictions) and
    # remove 0xFF00 byte stuffing in either case
    if restart_interval:
        segments = _split_restarts(ecs)
    else:
        segments = [ecs.replace(b"\xff\x00", b"\xff")]

    mcu = 0
    total_mcus = mcux * mcuy
    try:
        for seg in segments:
            for c in comps:
                c["pred"] = 0
            reader = _BitReader(seg)
            limit = min(mcu + restart_interval, total_mcus) if restart_interval else total_mcus
            while mcu < limit:
                my, mx = divmod(mcu, mcux)
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = _decode_block(reader, c)
                            c["coef"][my * c["v"] + v, mx * c["h"] + hh] = blk
                mcu += 1
    except IndexError:
        # _BitReader ran off the end of the unstuffed segment
        raise ValueError("invalid JPEG: truncated entropy data") from None
    if mcu != total_mcus:
        raise ValueError("invalid JPEG: entropy data ended early")

    return _reconstruct(comps, qt, w, h, hmax, vmax)


def _reconstruct(comps, qt, w, h, hmax, vmax):
    """Dequantize + IDCT + upsample + color transform of decoded ``coef``
    arrays -> (w, h, channels, uint8 image).  Shared by the baseline and
    progressive paths."""
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coef = c["coef"].reshape(-1, 64) * q[None, :]
        blocks = coef[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        # IDCT for all blocks at once: x = A^T F A
        pix = np.einsum("ux,nuv,vy->nxy", _DCT_A, blocks, _DCT_A)
        nby, nbx = c["coef"].shape[:2]
        plane = (
            pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        plane = np.clip(np.floor(plane + 128.5), 0, 255)
        # upsample to full MCU-padded resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        img = planes[0][:, :, None].astype(np.uint8)
        return w, h, 1, img
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG (CMYK?)")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    img = np.stack([r, g, b], axis=-1)
    img = np.clip(np.floor(img + 0.5), 0, 255).astype(np.uint8)
    return w, h, 3, img


def _decode_progressive(frame, scans, qt):
    """Progressive (SOF2) decode: every scan deposits coefficient bits into
    the persistent per-component ``coef`` arrays; one reconstruction at the
    end.  All four scan kinds of T.81 Annex G are implemented: DC first /
    DC refine (successive approximation on coefficient 0) and AC first /
    AC refine (spectral selection + successive approximation with EOB-run
    coding).  Restart markers reset DC predictors and the EOB run."""
    if frame is None:
        raise ValueError("invalid JPEG: SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        # non-interleaved block grid (T.81 A.2.2): the component's OWN
        # sample dimensions, not the MCU-padded ones
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["bw"] = -(-cw // 8)
        c["bh"] = -(-ch // 8)

    for sc in scans:
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        scomps = [by_id[s["id"]] for s in sc["comps"] if s["id"] in by_id]
        if len(scomps) != len(sc["comps"]):
            raise ValueError("invalid JPEG: scan component not in frame")
        if ss == 0 and se != 0:
            raise ValueError("invalid JPEG: progressive scan with Ss=0 needs Se=0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("invalid JPEG: progressive AC scan must be single-component")
        if ss > se or se > 63:
            raise ValueError("invalid JPEG: bad spectral selection")
        for spec, c in zip(sc["comps"], scomps):
            try:
                if ss == 0 and ah == 0:  # DC first needs a DC table
                    c["dc_tbl"] = sc["dc_tbls"][spec["dc"]]
                if ss > 0:  # AC first AND refine need an AC table
                    c["ac_tbl"] = sc["ac_tbls"][spec["ac"]]
            except KeyError as e:
                raise ValueError(f"invalid JPEG: undefined huffman table {e}") from None

        ri = sc["ri"]
        if ri:
            segments = _split_restarts(sc["ecs"])
        else:
            segments = [sc["ecs"].replace(b"\xff\x00", b"\xff")]

        interleaved = len(scomps) > 1
        if interleaved:
            total_units = mcux * mcuy
        else:
            c0 = scomps[0]
            total_units = c0["bw"] * c0["bh"]

        unit = 0
        try:
            for seg in segments:
                for c in scomps:
                    c["pred"] = 0
                reader = _BitReader(seg)
                eobrun = 0
                limit = min(unit + ri, total_units) if ri else total_units
                while unit < limit:
                    if interleaved:  # DC scan over whole MCUs
                        my, mx = divmod(unit, mcux)
                        for c in scomps:
                            for v in range(c["v"]):
                                for hh in range(c["h"]):
                                    _prog_dc(reader, c, my * c["v"] + v,
                                             mx * c["h"] + hh, ah, al)
                    else:
                        c = scomps[0]
                        by, bx = divmod(unit, c["bw"])
                        if ss == 0:
                            _prog_dc(reader, c, by, bx, ah, al)
                        else:
                            blk = c["coef"][by, bx]
                            if ah == 0:
                                eobrun = _prog_ac_first(
                                    reader, blk, c["ac_tbl"], ss, se, al, eobrun
                                )
                            else:
                                eobrun = _prog_ac_refine(
                                    reader, blk, c["ac_tbl"], ss, se, al, eobrun
                                )
                    unit += 1
        except IndexError:
            raise ValueError("invalid JPEG: truncated entropy data") from None
        if unit != total_units:
            raise ValueError("invalid JPEG: entropy data ended early")

    return _reconstruct(comps, qt, w, h, hmax, vmax)


def _prog_dc(reader, c, by, bx, ah, al):
    blk = c["coef"][by, bx]
    if ah == 0:  # DC first: diff decode, shifted up by Al
        s = reader.decode_symbol(c["dc_tbl"])
        diff = _extend(reader.read_bits(s), s) if s else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al
    else:  # DC refine: one correction bit
        if reader.read_bit():
            blk[0] |= 1 << al


def _prog_ac_first(reader, blk, tbl, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.2: first AC scan of a band, with EOB-run coding."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of 2^r + extra empty bands
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("invalid JPEG: AC run past spectral band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, blk, tbl, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: correction bits for
    already-nonzero coefficients + newly-significant +-1 insertions."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(tbl)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # remaining coefficients handled below
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG: AC refine size != 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _split_restarts(ecs: bytes):
    """Split the entropy segment at RST0-7 markers (and unstuff each part)."""
    parts, cur = [], bytearray()
    i, n = 0, len(ecs)
    while i < n:
        if ecs[i] == 0xFF and i + 1 < n:
            nxt = ecs[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                parts.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(ecs[i])
        i += 1
    parts.append(bytes(cur))
    return parts


def _decode_block(reader: _BitReader, c) -> np.ndarray:
    blk = np.zeros(64, dtype=np.int64)
    s = reader.decode_symbol(c["dc_tbl"])
    diff = _extend(reader.read_bits(s), s) if s else 0
    c["pred"] += diff
    blk[0] = c["pred"]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(c["ac_tbl"])
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("invalid JPEG: AC run past end of block")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (nby, nbx, 8, 8)."""
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mult
    pw = (-ww) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _quantize_blocks(img: np.ndarray, subsample: bool):
    """Shared encoder front end: color transform, optional 4:2:0
    subsampling, DCT + quantization.  -> (qblocks, samp, tqs, quants, w, h)
    with ``qblocks[ci]`` of shape (mcuy*sv, mcux*sh, 64) in zigzag order."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) uint8 image")
    h, w, c = img.shape
    f = img.astype(np.float64)
    if c == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = 0.25 * (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2])
            cr = 0.25 * (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2])
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        tqs = [0, 1, 1]
        quants = [QUANT_LUMA, QUANT_CHROMA]
    else:
        planes = [f[:, :, 0]]
        samp = [(1, 1)]
        tqs = [0]
        quants = [QUANT_LUMA]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # quantized zigzag blocks per component, in raster block order
    qblocks = []
    for plane, (sh, sv), tq in zip(planes, samp, tqs):
        # pad each plane so the BLOCK grid covers ceil(mcu) MCUs exactly
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        target_w = mcux * 8 * sh
        target_h = mcuy * 8 * sv
        p = plane
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(p - 128.0)
        coef = np.einsum("ux,nmxy,vy->nmuv", _DCT_A, blocks, _DCT_A)
        # quant tables are stored in NATURAL (raster) order here; the DQT
        # segment below re-orders them to zigzag as T.81 requires
        q = quants[tq].astype(np.float64).reshape(8, 8)
        # round half away from zero (sign-symmetric, the common libjpeg choice)
        scaled = coef / q
        qz = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
        qblocks.append(qz.reshape(qz.shape[0], qz.shape[1], 64)[:, :, ZIGZAG].astype(np.int64))
    return qblocks, samp, tqs, quants, w, h


def encode_jpeg(img: np.ndarray, *, subsample: bool = False) -> bytes:
    """uint8 (h, w, c) with c in {1, 3} -> baseline JFIF bytes.

    Annex K tables; ``subsample=True`` emits 4:2:0 (2x2 chroma averaging),
    else 4:4:4.  Grayscale ignores ``subsample``.
    """
    qblocks, samp, tqs, quants, w, h = _quantize_blocks(img, subsample)
    planes = samp  # one entry per component

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    dc_tbls = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
               _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tbls = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
               _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                ti = 0 if ci == 0 else 1
                for v in range(sv):
                    for hh in range(sh):
                        blk = qblocks[ci][my * sv + v, mx * sh + hh]
                        preds[ci] = _encode_block(
                            writer, blk, preds[ci], dc_tbls[ti], ac_tbls[ti]
                        )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(quants):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in q[ZIGZAG]  # DQT is zigzag-ordered per T.81
        )
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, ((sh, sv), tq) in enumerate(zip(samp, tqs)):
        out += bytes([ci + 1, (sh << 4) | sv, tq])
    huffs = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (16, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        huffs += [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (16, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, th, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        out += bytes([ci + 1, (ti << 4) | ti])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(writer, blk, pred, dc_tbl, ac_tbl) -> int:
    dc = int(blk[0])
    diff = dc - pred
    s = _csize(diff)
    code, length = dc_tbl[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = ac_tbl[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_tbl[0x00]  # EOB
        writer.write(code, length)
    return dc


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G, libjpeg-style scan script)
# ---------------------------------------------------------------------------

class _ProgACWriter:
    """AC scan encoder state: EOB-run accumulation + buffered correction
    bits (the BE buffer of jcphuff), per T.81 G.1.2.2/G.1.2.3."""

    def __init__(self, writer: _BitWriter, ac_tbl):
        self.w = writer
        self.tbl = ac_tbl
        self.eobrun = 0
        self.be_bits: list[int] = []

    def emit_eobrun(self):
        if self.eobrun == 0:
            return
        nbits = self.eobrun.bit_length() - 1
        code, ln = self.tbl[nbits << 4]
        self.w.write(code, ln)
        if nbits:
            self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
        self.eobrun = 0
        for b in self.be_bits:
            self.w.write(b, 1)
        self.be_bits = []

    def block_first(self, blk, al: int):
        """First AC scan of the band (Ss=1..63 here), point transform Al."""
        r = 0
        for k in range(1, 64):
            v = int(blk[k])
            temp = (-v if v < 0 else v) >> al
            if temp == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                code, ln = self.tbl[0xF0]
                self.w.write(code, ln)
                r -= 16
            s = temp.bit_length()
            code, ln = self.tbl[(r << 4) | s]
            self.w.write(code, ln)
            self.w.write(temp if v >= 0 else ((1 << s) - 1 - temp), s)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def block_refine(self, blk, al: int):
        """Refinement AC scan (Ah = Al + 1): correction bits for known
        coefficients, (r, 1) symbols for newly significant ones."""
        absv = [0] * 64
        eob = 0
        for k in range(1, 64):
            v = int(blk[k])
            t = (-v if v < 0 else v) >> al
            absv[k] = t
            if t == 1:
                eob = k  # last NEWLY significant coefficient
        r = 0
        br: list[int] = []
        for k in range(1, 64):
            temp = absv[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.emit_eobrun()
                code, ln = self.tbl[0xF0]
                self.w.write(code, ln)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if temp > 1:  # already significant: one correction bit
                br.append(temp & 1)
                continue
            self.emit_eobrun()
            code, ln = self.tbl[(r << 4) | 1]
            self.w.write(code, ln)
            self.w.write(0 if int(blk[k]) < 0 else 1, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r or br:
            self.eobrun += 1
            self.be_bits.extend(br)
            if self.eobrun == 0x7FFF or len(self.be_bits) > 937:
                self.emit_eobrun()


# AC table for the progressive encoder's scans: the Annex K baseline AC
# tables have no EOBn (r>0, s=0) symbols, which progressive EOB-run coding
# needs.  A flat canonical table carrying ALL 256 symbols (255 at 9 bits +
# one at 10, keeping the all-ones code free per T.81 C.2) trades a little
# compression for full symbol coverage — the decoder just reads the DHT.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))


def encode_jpeg_progressive(img: np.ndarray, *, subsample: bool = False) -> bytes:
    """uint8 (h, w, c) with c in {1, 3} -> PROGRESSIVE (SOF2) JFIF bytes.

    Scan script exercising all four progressive scan kinds (the shape
    libjpeg's default script uses, condensed):

      1. DC first, all components interleaved, Al=1
      2. AC first per component, Ss=1..63, Al=1 (EOB-run coded)
      3. DC refinement, all components, Ah=1 -> Al=0
      4. AC refinement per component, Ah=1 -> Al=0 (correction bits)

    Decodes to EXACTLY the same pixels as the baseline encoding of the
    same image (same quantized coefficients, bit-for-bit) — pinned by the
    round-trip tests.
    """
    qblocks, samp, tqs, quants, w, h = _quantize_blocks(img, subsample)
    nc = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # non-interleaved (per-component) block grids for the AC scans
    bws, bhs = [], []
    for sh, sv in samp:
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        bws.append(-(-cw // 8))
        bhs.append(-(-ch // 8))

    dc_tbls = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
               _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    prog_ac = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    ac_tbls = [prog_ac, prog_ac]

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        seg = bytearray()
        seg += struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            ti = 0 if cid == 1 else 1
            seg += bytes([cid, (ti << 4) | ti])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + bytes(seg)

    scans = []

    # scan 1: DC first (interleaved, Al=1)
    wtr = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                ti = 0 if ci == 0 else 1
                for v in range(sv):
                    for hh in range(sh):
                        dcv = int(qblocks[ci][my * sv + v, mx * sh + hh][0]) >> 1
                        diff = dcv - preds[ci]
                        preds[ci] = dcv
                        s = _csize(diff)
                        code, ln = dc_tbls[ti][s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    scans.append((sos_header(list(range(1, nc + 1)), 0, 0, 0, 1), bytes(wtr.out)))

    # scans 2..: AC first per component (Ss=1..63, Al=1)
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        wtr = _BitWriter()
        ac = _ProgACWriter(wtr, ac_tbls[ti])
        for by in range(bhs[ci]):
            for bx in range(bws[ci]):
                ac.block_first(qblocks[ci][by, bx], 1)
        ac.emit_eobrun()
        wtr.flush()
        scans.append((sos_header([ci + 1], 1, 63, 0, 1), bytes(wtr.out)))

    # DC refinement (Ah=1, Al=0): one raw bit per block in MCU order
    wtr = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for v in range(sv):
                    for hh in range(sh):
                        wtr.write(int(qblocks[ci][my * sv + v, mx * sh + hh][0]) & 1, 1)
    wtr.flush()
    scans.append((sos_header(list(range(1, nc + 1)), 0, 0, 1, 0), bytes(wtr.out)))

    # AC refinement per component (Ah=1, Al=0)
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        wtr = _BitWriter()
        ac = _ProgACWriter(wtr, ac_tbls[ti])
        for by in range(bhs[ci]):
            for bx in range(bws[ci]):
                ac.block_refine(qblocks[ci][by, bx], 0)
        ac.emit_eobrun()
        wtr.flush()
        scans.append((sos_header([ci + 1], 1, 63, 1, 0), bytes(wtr.out)))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(quants):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in q[ZIGZAG]
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for ci, ((sh, sv), tq) in enumerate(zip(samp, tqs)):
        out += bytes([ci + 1, (sh << 4) | sv, tq])
    huffs = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (16, 0, _PROG_AC_BITS, _PROG_AC_VALS)]
    if nc == 3:
        huffs += [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (16, 1, _PROG_AC_BITS, _PROG_AC_VALS)]
    for tc, th, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc | th)
        out += bytes(bits) + bytes(vals)
    for hdr, data in scans:
        out += hdr + data
    out += b"\xff\xd9"  # EOI
    return bytes(out)
