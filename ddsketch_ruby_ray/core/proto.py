"""DDSketch protobuf wire format - hand-rolled, dependency-free.

Implements the reference's wire schema
(`/root/reference/lib/ddsketch/proto/ddsketch.proto`):

    DDSketch     { IndexMapping mapping = 1; Store positiveValues = 2;
                   Store negativeValues = 3; double zeroCount = 4; }
    IndexMapping { double gamma = 1; double indexOffset = 2;
                   Interpolation interpolation = 3; }   // NONE/LINEAR/CUBIC
    Store        { map<sint32,double> binCounts = 1;
                   repeated double contiguousBinCounts = 2 [packed = true];
                   sint32 contiguousBinIndexOffset = 3; }

Like the reference serializer (`proto.rb:27-32`) we write the contiguous
encoding; unlike it (`proto.rb` is one-way) we also DECODE - accepting both
encodings and summing them when both are present, per the proto comments
(`ddsketch.proto:58-66`).  One deliberate divergence: the reference writes
``relative_accuracy`` into the ``gamma`` field (`proto.rb:36`, a quirk); we
write the actual gamma, which round-trips correctly (alpha = (g-1)/(g+1)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .ddsketch import DDSketch, LogCollapsingHighestDenseSketch, LogCollapsingLowestDenseSketch
from .mapping import mapping_from_tag

__all__ = ["serialize_sketch", "deserialize_sketch"]

# ddsketch.proto:45-50: NONE = 0, LINEAR = 1, QUADRATIC = 2, CUBIC = 3.
# (QUADRATIC has no implementation in the reference gem or here.)
_INTERP_TO_ENUM = {None: 0, "linear": 1, "cubic": 3}
_ENUM_TO_INTERP = {0: None, 1: "linear", 3: "cubic"}


# -- low-level wire helpers --------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f64(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


# -- encode ------------------------------------------------------------------


def _encode_store(bins: np.ndarray, offset: int) -> bytes:
    out = b""
    if bins.size:
        packed = struct.pack(f"<{bins.size}d", *bins.tolist())
        out += _len_delim(2, packed)  # contiguousBinCounts, packed doubles
        if offset:  # proto3 omits default-valued scalars (golden-bytes parity)
            out += _tag(3, 0) + _varint(_zigzag(int(offset)))  # sint32 offset
    return out


def serialize_sketch(sk: DDSketch, *, compat: str | None = None) -> bytes:
    """Sketch -> proto bytes (contiguous store encoding).

    ``compat="ddsketch-ruby"`` mirrors the reference gem's serializer quirk
    (`/root/reference/lib/ddsketch/proto.rb:34-44`, ``gamma:
    mapping.relative_accuracy``): the proto ``gamma`` field carries ALPHA so
    the payload is readable by consumers of reference-gem bytes (the
    central-merge topology in the reference README).  Without the flag the
    field is true gamma — correct per the proto spec, and what our own
    ``deserialize_sketch`` default expects."""
    if compat not in (None, "ddsketch-ruby"):
        raise ValueError(f"unknown compat mode {compat!r}")
    mp = sk.mapping
    wire_gamma = mp.relative_accuracy if compat == "ddsketch-ruby" else mp.gamma
    mapping_msg = _f64(1, wire_gamma)
    if mp.offset != 0.0:
        mapping_msg += _f64(2, mp.offset)
    enum = _INTERP_TO_ENUM[mp.interpolation]
    if enum:
        mapping_msg += _tag(3, 0) + _varint(enum)

    pos = sk.store.to_state()
    neg = sk.negative_store.to_state()
    out = _len_delim(1, mapping_msg)
    pos_bytes = _encode_store(np.asarray(pos["bins"], dtype=np.float64), pos["bin_offset"])
    neg_bytes = _encode_store(np.asarray(neg["bins"], dtype=np.float64), neg["bin_offset"])
    if pos_bytes:
        out += _len_delim(2, pos_bytes)
    if neg_bytes:
        out += _len_delim(3, neg_bytes)
    if sk.zero_count:
        out += _f64(4, sk.zero_count)
    return out


# -- decode ------------------------------------------------------------------


def _decode_fields(data: bytes):
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(data, i)
        elif wire == 1:
            v = struct.unpack_from("<d", data, i)[0]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(data, i)
            v = data[i : i + ln]
            i += ln
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _decode_store(data: bytes) -> dict[int, float]:
    """-> {key: count}; sums sparse and contiguous encodings if both present."""
    counts: dict[int, float] = {}
    contiguous: list[float] = []
    offset = 0
    for field, wire, v in _decode_fields(data):
        if field == 1:  # map<sint32,double> binCounts entry
            k = c = None
            for f2, w2, v2 in _decode_fields(v):
                if f2 == 1:
                    k = _unzigzag(v2)
                elif f2 == 2:
                    c = v2
            if k is not None and c is not None:
                counts[k] = counts.get(k, 0.0) + c
        elif field == 2:  # packed doubles
            n = len(v) // 8
            contiguous.extend(struct.unpack(f"<{n}d", v))
        elif field == 3:
            offset = _unzigzag(v)
    for j, c in enumerate(contiguous):
        if c:
            counts[offset + j] = counts.get(offset + j, 0.0) + c
    return counts


def deserialize_sketch(
    data: bytes,
    *,
    store: str | None = None,
    bin_limit: int | None = None,
    compat: str | None = None,
) -> DDSketch:
    """proto bytes -> sketch.  count/sum/min/max are reconstructed from the
    histogram (the wire format does not carry them - they become estimates,
    exactly as in the reference's distributed topology where only the proto
    crosses nodes).

    ``compat="ddsketch-ruby"`` reads payloads written by the reference gem,
    whose serializer puts ``relative_accuracy`` in the proto ``gamma`` field
    (`/root/reference/lib/ddsketch/proto.rb:34-44`, ``gamma:
    mapping.relative_accuracy``): the field is interpreted as alpha and the
    true gamma derived as ``1 + 2a/(1-a)``.  Without the flag the field is
    true gamma (our serializer's convention, which round-trips)."""
    if compat not in (None, "ddsketch-ruby"):
        raise ValueError(f"unknown compat mode {compat!r}")
    gamma = None
    offset = 0.0
    interp = None
    pos: dict[int, float] = {}
    neg: dict[int, float] = {}
    zero_count = 0.0
    for field, wire, v in _decode_fields(data):
        if field == 1:
            for f2, w2, v2 in _decode_fields(v):
                if f2 == 1:
                    gamma = v2
                elif f2 == 2:
                    offset = v2
                elif f2 == 3:
                    if v2 not in _ENUM_TO_INTERP:
                        raise ValueError(
                            f"unsupported interpolation enum {v2}"
                            " (QUADRATIC has no reference implementation)"
                        )
                    interp = _ENUM_TO_INTERP[v2]
        elif field == 2:
            pos = _decode_store(v)
        elif field == 3:
            neg = _decode_store(v)
        elif field == 4:
            zero_count = v
    if gamma is None:
        raise ValueError("proto DDSketch missing mapping.gamma")
    if compat == "ddsketch-ruby":
        # the wire value is alpha, not gamma (reference quirk; see docstring)
        mapping = mapping_from_tag(interp, gamma, offset)
    else:
        mapping = mapping_from_tag(interp, None, offset, gamma=gamma)

    if store == "collapse_lowest":
        sk: DDSketch = LogCollapsingLowestDenseSketch(bin_limit=bin_limit or 2048, mapping=mapping)
    elif store == "collapse_highest":
        sk = LogCollapsingHighestDenseSketch(bin_limit=bin_limit or 2048, mapping=mapping)
    else:
        sk = DDSketch(mapping=mapping)

    total = 0.0
    total_sum = 0.0
    mn, mx = math.inf, -math.inf
    for side, counts in ((1, pos), (-1, neg)):
        if not counts:
            continue
        keys = np.fromiter(sorted(counts), dtype=np.int64, count=len(counts))
        c = np.array([counts[int(k)] for k in keys], dtype=np.float64)
        sk_store = sk.store if side == 1 else sk.negative_store
        sk_store.add_batch(keys, c)  # one scatter-add, not a per-key loop
        vals = side * np.asarray(mapping.value(keys), dtype=np.float64)
        total += float(c.sum())
        total_sum += float((vals * c).sum())
        mn = min(mn, float(vals.min()))
        mx = max(mx, float(vals.max()))
    if zero_count:
        sk.zero_count = zero_count
        total += zero_count
        mn = min(mn, 0.0)
        mx = max(mx, 0.0)
    sk.count = total
    sk.sum = total_sum
    sk.min = mn
    sk.max = mx
    return sk
