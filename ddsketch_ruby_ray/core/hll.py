"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), numpy-vectorized.

Classic HLL with a 64-bit hash (no 32-bit large-range correction needed) and
the small-range linear-counting correction.  Standard error ~= 1.04 / sqrt(m).

Determinism contract (what makes it oracle-testable): registers are a pure
max-fold of per-row hashes - merge is elementwise max (idempotent,
associative, commutative), so ANY partition/merge order yields identical
registers.  The estimator avoids float-summation order sensitivity by
computing the harmonic-sum denominator as an EXACT integer
(sum of 2^(64-r) as python ints), so the estimate is bit-identical across
partitionings and reproducible in SQL (HUGEINT arithmetic).

Built from public descriptions of the algorithm; no reference-repo
counterpart (required by north_rule alongside DDSketch - see
/root/repo/SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_int, hash256_str

__all__ = ["HyperLogLog"]

# alpha_m constants per the HLL paper (m >= 128)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    """Dense HLL with 2**p uint8 registers.

    p in [4, 18]; default 14 (m=16384, ~1.04/128 = 0.8% std error, 16 KB).
    """

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # -- ingestion ---------------------------------------------------------
    def add_hashes(self, h: np.ndarray) -> None:
        """Fold pre-computed uint64 hashes into the registers (vectorized)."""
        if h.size == 0:
            return
        j = (h & np.uint64(self.m - 1)).astype(np.int64)  # low p bits: register
        w = h >> np.uint64(self.p)  # top 64-p bits
        width = 64 - self.p
        # rho = leading zeros of w in `width` bits, +1  =  width - bitlen(w) + 1.
        # Exact bitlen via frexp on 32-bit halves (frexp exponent is exact for
        # ints < 2^53; each half is < 2^32).
        hi = (w >> np.uint64(32)).astype(np.float64)
        lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
        _, ehi = np.frexp(hi)
        _, elo = np.frexp(lo)
        bitlen = np.where(hi > 0, ehi + 32, elo)
        rho = (width - bitlen + 1).astype(np.uint8)  # w==0 -> bitlen 0 -> width+1
        np.maximum.at(self.registers, j, rho)

    def add_ints(self, values, seed: int = 0) -> None:
        self.add_hashes(hash64_int(values, seed))

    def add_strings(self, col) -> None:
        self.add_hashes(hash256_str(col, lanes=1)[0])

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        """In-place elementwise-max merge; ``other`` is never mutated."""
        if other.p != self.p:
            raise ValueError("Cannot merge HLLs with different precision p")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def merged_with(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        """Bit-deterministic cardinality estimate (see module docstring)."""
        m = self.m
        counts = np.bincount(self.registers, minlength=65)
        # harmonic denominator as an exact integer, scaled by 2^64:
        # sum_j 2^-r_j = S / 2^64 with S = sum_j 2^(64 - r_j)
        S = sum(int(c) << (64 - r) for r, c in enumerate(counts.tolist()) if c)
        raw = _alpha(m) * m * m * float(2**64) / float(S)
        zeros = int(counts[0])
        if raw <= 2.5 * m and zeros:
            return m * float(np.log(m / float(zeros)))
        return raw

    # -- state -------------------------------------------------------------
    def to_state(self) -> dict:
        return {"p": self.p, "registers": self.registers.copy()}

    @staticmethod
    def from_state(state: dict) -> "HyperLogLog":
        h = HyperLogLog(int(state["p"]))
        h.registers = np.asarray(state["registers"], dtype=np.uint8).copy()
        return h

    def __eq__(self, other):
        if not isinstance(other, HyperLogLog):
            return NotImplemented
        return self.p == other.p and bool(np.array_equal(self.registers, other.registers))

    def __repr__(self):
        return f"HyperLogLog(p={self.p}, est={self.estimate():.1f})"
