"""Bloom filter (Bloom 1970) with Kirsch-Mitzenmacher double hashing.

k bit positions per element derived from two independent 64-bit hash lanes:
``pos_i = (h1 + i * h2) mod m_bits`` (Kirsch & Mitzenmacher 2006: two hashes
suffice for the asymptotic false-positive rate).  State is a packed uint64
bit array; merge is bitwise OR - idempotent, associative, commutative, so any
partition/merge order yields the identical filter, and membership answers are
a deterministic function of the input multiset (false positives included) -
which is what makes the sketch SQL-oracle-testable.

No reference-repo counterpart (north_rule family member, SURVEY.md §2.6).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64_int, hash256_str

__all__ = ["BloomFilter", "optimal_bits", "optimal_hashes"]


def optimal_bits(n: int, fp_rate: float) -> int:
    """m = -n ln(p) / (ln 2)^2, rounded up to a multiple of 64."""
    m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    return max(64, (m + 63) // 64 * 64)


def optimal_hashes(m_bits: int, n: int) -> int:
    """k = (m/n) ln 2."""
    return max(1, round(m_bits / max(1, n) * math.log(2)))


class BloomFilter:
    """Fixed-size Bloom filter over uint64 hash pairs."""

    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros(self.m_bits // 64, dtype=np.uint64)

    # -- positions ---------------------------------------------------------
    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) int64 bit positions via double hashing (all math mod 2^64)."""
        old = np.seterr(over="ignore")
        try:
            i = np.arange(self.k, dtype=np.uint64)
            combined = h1[:, None] + i[None, :] * h2[:, None]  # wraps mod 2^64
        finally:
            np.seterr(**old)
        return (combined % np.uint64(self.m_bits)).astype(np.int64)

    def hash_pair_ints(self, values) -> tuple[np.ndarray, np.ndarray]:
        v = np.asarray(values)
        return hash64_int(v, 0), hash64_int(v, 1)

    def hash_pair_strings(self, col) -> tuple[np.ndarray, np.ndarray]:
        lanes = hash256_str(col, lanes=2)
        return lanes[0], lanes[1]

    # -- ingestion ---------------------------------------------------------
    def add_hash_pairs(self, h1: np.ndarray, h2: np.ndarray) -> None:
        if h1.size == 0:
            return
        pos = self._positions(h1, h2).ravel()
        word, bit = pos >> 6, pos & 63
        np.bitwise_or.at(self.bits, word, np.uint64(1) << bit.astype(np.uint64))

    def contains_hash_pairs(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """bool[n]: True if ALL k positions are set (maybe-member)."""
        if h1.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h1, h2)
        word, bit = pos >> 6, pos & 63
        hits = (self.bits[word] >> bit.astype(np.uint64)) & np.uint64(1)
        return hits.astype(bool).all(axis=1)

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("Cannot merge Bloom filters with different (m, k)")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def merged_with(self, other: "BloomFilter") -> "BloomFilter":
        out = BloomFilter(self.m_bits, self.k)
        np.bitwise_or(self.bits, other.bits, out=out.bits)
        return out

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.m_bits

    # -- state -------------------------------------------------------------
    def to_state(self) -> dict:
        return {"m_bits": self.m_bits, "k": self.k, "bits": self.bits.copy()}

    @staticmethod
    def from_state(state: dict) -> "BloomFilter":
        b = BloomFilter(int(state["m_bits"]), int(state["k"]))
        b.bits = np.asarray(state["bits"], dtype=np.uint64).copy()
        return b

    def __eq__(self, other):
        if not isinstance(other, BloomFilter):
            return NotImplemented
        return (
            self.m_bits == other.m_bits
            and self.k == other.k
            and bool(np.array_equal(self.bits, other.bits))
        )

    def __repr__(self):
        return f"BloomFilter(m_bits={self.m_bits}, k={self.k}, fill={self.fill_ratio:.4f})"
