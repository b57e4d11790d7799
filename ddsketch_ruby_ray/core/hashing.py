"""Deterministic 64-bit hashing, bit-exactly mirrorable in DuckDB SQL.

Two families, chosen so every hash-based sketch (HLL, Bloom, count-min,
MinHash, SimHash) is a deterministic function of its input that an ANSI-SQL
oracle can reproduce exactly:

* ``hash64_int`` - splitmix64 (public constants, Steele et al. / Vigna) over
  int64/uint64 columns.  Fully vectorized in numpy (wrap-around uint64
  arithmetic); mirrored in SQL via HUGEINT limb arithmetic
  (:func:`splitmix64_sql`).
* ``hash256_str`` - sha256 over utf-8 bytes, sliced into four independent
  uint64 lanes.  Per-row hashlib loop (sha256 has no vectorized form), ~400
  MB/s/core, embarrassingly parallel across Ray tasks; mirrored in SQL via
  DuckDB's ``sha256`` + hex substring casts.

Seeds: integer hashes take a seed mixed in pre-hash; string hashes expose 4
independent lanes per value (the 256-bit digest), extendable by suffixing the
input with a seed byte if ever more are needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "splitmix64",
    "hash64_int",
    "hash256_str",
    "hash64_str_fast",
    "fold_windows",
    "splitmix64_sql",
    "sha_lane_sql",
]

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrap-around arithmetic)."""
    old = np.seterr(over="ignore")
    try:
        x = (x + np.uint64(_C1)) & _M64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(_C2)) & _M64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(_C3)) & _M64
        return x ^ (x >> np.uint64(31))
    finally:
        np.seterr(**old)


def hash64_int(values, seed: int = 0) -> np.ndarray:
    """uint64 hash of an int64/uint64 array; distinct seeds give independent fns."""
    v = np.asarray(values).astype(np.uint64)
    if seed:
        old = np.seterr(over="ignore")
        try:
            v = (v + np.uint64((seed * _C1) & 0xFFFFFFFFFFFFFFFF)) & _M64
        finally:
            np.seterr(**old)
    return splitmix64(v)


_POLY_R = np.uint64(0x100000001B3)  # FNV-64 prime as the polynomial base


def hash64_str_fast(col) -> np.ndarray:
    """Vectorized non-cryptographic 64-bit hash of an Arrow string column.

    PARTITIONING ONLY — it has NO SQL mirror and must never reach an
    oracle-compared output column (use :func:`hash256_str` there).  Polynomial
    fold over the raw utf-8 buffer, h = sum(byte * R^(len-1-pos)) mod 2^64,
    finalized with splitmix64(h ^ len); equal strings always collide, the
    byte stream is touched in ONE numpy pass regardless of row count (no
    per-row Python), and empty/null strings hash like "".  Segment sums use
    modular cumsum differences, which are exact under uint64 wrap and safe
    for empty segments (np.add.reduceat is not).
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(["" if s is None else str(s) for s in col], pa.string())
    col = pc.fill_null(col, "")
    n = len(col)
    if not n:
        return np.zeros(0, dtype=np.uint64)
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    off = np.frombuffer(col.buffers()[1], dtype=off_dt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    total = int(off[-1] - off[0])
    old = np.seterr(over="ignore")
    try:
        if total:
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
                off[0] : off[-1]
            ].astype(np.uint64)
            # R^k table up to the longest string (uint64 wrap is the modulus)
            max_len = int(lens.max())
            powers = np.ones(max_len, dtype=np.uint64)
            if max_len > 1:
                np.multiply.accumulate(
                    np.full(max_len - 1, _POLY_R, dtype=np.uint64),
                    out=powers[1:],
                )
            j = np.arange(total, dtype=np.int64) + off[0]
            pos_from_end = np.repeat(ends, lens) - 1 - j
            terms = data * powers[pos_from_end]
            csum = np.concatenate([np.zeros(1, np.uint64), np.cumsum(terms)])
            h = csum[ends - off[0]] - csum[starts - off[0]]
        else:
            h = np.zeros(n, dtype=np.uint64)
        return splitmix64(h ^ lens.astype(np.uint64))
    finally:
        np.seterr(**old)


def hash256_str(col, lanes: int = 1) -> list[np.ndarray]:
    """sha256 each string/binary; return ``lanes`` (<=4) uint64 arrays.

    Lane ``i`` is bytes ``8*i : 8*i+8`` of the digest, big-endian - exactly
    ``('0x' || substr(sha256(col), 1 + 16*i, 16))::UBIGINT`` in DuckDB.

    Null policy: a null value hashes as the EMPTY STRING (the SQL mirror is
    ``sha256(coalesce(col, ''))``, which :func:`sha_lane_sql` applies), so a
    corpus with null text rows flows through every hash pipeline with a
    defined, oracle-consistent result instead of an opaque TypeError.
    """
    assert 1 <= lanes <= 4
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = col.cast(pa.binary() if pa.types.is_string(col.type) else pa.large_binary())
        digests = [hashlib.sha256(b.as_py() or b"").digest() for b in col]
    else:  # numpy object array / list of str or bytes
        digests = [
            hashlib.sha256(
                s if isinstance(s, bytes) else b"" if s is None else str(s).encode("utf-8")
            ).digest()
            for s in col
        ]
    out = []
    for i in range(lanes):
        out.append(
            np.array(
                [int.from_bytes(d[8 * i : 8 * i + 8], "big") for d in digests],
                dtype=np.uint64,
            )
        )
    return out


def fold_windows(
    tokh: np.ndarray,
    starts: np.ndarray,
    n: int,
    widths: np.ndarray | None = None,
) -> np.ndarray:
    """uint64 fingerprint per n-element window of a uint64 token-hash array.

    Window w covers ``tokh[starts[w] : starts[w] + width_w]`` (``width_w = n``
    when ``widths`` is None); its fingerprint is the splitmix64 fold
    ``acc_j = splitmix64(acc_{j-1} + tokh[starts[w]+j])`` with ``acc_{-1}=0``
    — the same chain the LSH band buckets use, so the SQL mirror is the same
    CTE-per-step expansion (functions/dedup_oracle.py::_window_fold_ctes).

    Fully vectorized: n gather+splitmix passes over all windows at once — no
    per-window Python, no window-string materialization.  This replaces the
    round-2 ``" ".join(toks[i:i+n])`` + per-string sha256 map stage, whose
    O(total_tokens x n) char copies dominated the spans/shingle pipelines.
    """
    starts = np.asarray(starts, dtype=np.int64)
    acc = np.zeros(starts.size, dtype=np.uint64)
    if not starts.size:
        return acc
    old = np.seterr(over="ignore")
    try:
        for j in range(n):
            if widths is None:
                acc = splitmix64(acc + tokh[starts + j])
            else:
                live = widths > j
                if live.all():
                    acc = splitmix64(acc + tokh[starts + j])
                else:
                    idx = np.flatnonzero(live)
                    if not idx.size:
                        break
                    acc[idx] = splitmix64(acc[idx] + tokh[starts[idx] + j])
    finally:
        np.seterr(**old)
    return acc


# -- SQL mirrors -------------------------------------------------------------

_TWO64 = "18446744073709551616"  # 2^64
_TWO32 = "4294967296"  # 2^32


def _mulmod64_sql(a: str, b_const: int) -> str:
    """(a * b) mod 2^64 with a < 2^64 (HUGEINT limb arithmetic).

    int128 cannot hold a full 64x64 product, so split b into 32-bit limbs:
    (a*bl + ((a*bh mod 2^32) << 32)) mod 2^64 -- every intermediate < 2^127.
    """
    bh, bl = b_const >> 32, b_const & 0xFFFFFFFF
    return (
        f"((({a}) * {bl}::HUGEINT + ((({a}) * {bh}::HUGEINT % {_TWO32}) * {_TWO32}))"
        f" % {_TWO64})"
    )


def splitmix64_sql(x: str, seed: int = 0, normalize: bool = True) -> str:
    """SQL expression (HUGEINT in [0, 2^64)) = ``hash64_int(x, seed)``.

    ``x`` must be a SQL expression of integer type (interpreted mod 2^64,
    matching numpy's uint64 cast of int64 input).  Pass ``normalize=False``
    when ``x`` is already a HUGEINT expression in [0, 2^64) (e.g. a
    pre-seeded hash) to skip the int64 -> uint64 domain shift.
    """
    if normalize:
        e = f"((({x})::HUGEINT % {_TWO64} + {_TWO64}) % {_TWO64})"
    else:
        e = f"({x})"
    if seed:
        e = f"(({e} + {(seed * _C1) & 0xFFFFFFFFFFFFFFFF}::HUGEINT) % {_TWO64})"
    e = f"(({e} + {_C1}::HUGEINT) % {_TWO64})"
    e = f"xor({e}::UBIGINT, ({e} // 1073741824)::UBIGINT)::HUGEINT"  # >> 30
    e = _mulmod64_sql(e, _C2)
    e = f"xor({e}::UBIGINT, ({e} // 134217728)::UBIGINT)::HUGEINT"  # >> 27
    e = _mulmod64_sql(e, _C3)
    e = f"xor({e}::UBIGINT, ({e} // 2147483648)::UBIGINT)::HUGEINT"  # >> 31
    return e


def sha_lane_sql(col: str, lane: int = 0) -> str:
    """SQL expression (UBIGINT) = lane ``lane`` of ``hash256_str(col)``.

    ``coalesce(col, '')`` mirrors the Python side's null-as-empty-string
    policy (see :func:`hash256_str`).
    """
    assert 0 <= lane <= 3
    return f"('0x' || substr(sha256(coalesce({col}, '')), {1 + 16 * lane}, 16))::UBIGINT"
