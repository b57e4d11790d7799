"""Count-min sketch (Cormode & Muthukrishnan 2005), numpy-vectorized.

d x w counter matrix; row i uses the double-hashed function
``bucket_i = (h1 + i * h2) mod w`` (same Kirsch-Mitzenmacher construction as
the Bloom filter).  Point estimate = min over rows of the addressed counters:
an overestimate with err <= eps * N (eps = e/w) at confidence 1 - delta
(delta = e^-d).  Counts are float64 (weighted adds are first-class, matching
the DDSketch convention from the reference - base_sketch.rb:96).

Merge = elementwise matrix add: associative/commutative, and with
integer-valued weights bit-exact under any partition order, hence
SQL-oracle-testable.

No reference-repo counterpart (north_rule family member, SURVEY.md §2.6).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64_int, hash256_str

__all__ = ["CountMinSketch"]


class CountMinSketch:
    """d rows x w buckets of float64 counters."""

    def __init__(self, w: int = 2048, d: int = 4):
        if w <= 0 or d <= 0 or d > 4:
            raise ValueError("need w > 0 and 0 < d <= 4 (4 sha256 lanes)")
        self.w = int(w)
        self.d = int(d)
        self.table = np.zeros((self.d, self.w), dtype=np.float64)
        self.total = 0.0

    @classmethod
    def from_error(cls, eps: float, delta: float) -> "CountMinSketch":
        """w = ceil(e/eps), d = ceil(ln(1/delta))."""
        return cls(w=int(math.ceil(math.e / eps)), d=int(math.ceil(math.log(1.0 / delta))))

    # -- hashing -----------------------------------------------------------
    def _buckets(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(d, n) int64 bucket per row via double hashing (mod-2^64 wrap)."""
        old = np.seterr(over="ignore")
        try:
            i = np.arange(self.d, dtype=np.uint64)
            combined = h1[None, :] + i[:, None] * h2[None, :]
        finally:
            np.seterr(**old)
        return (combined % np.uint64(self.w)).astype(np.int64)

    def hash_pair_ints(self, values):
        v = np.asarray(values)
        return hash64_int(v, 0), hash64_int(v, 1)

    def hash_pair_strings(self, col):
        lanes = hash256_str(col, lanes=2)
        return lanes[0], lanes[1]

    # -- ingestion / query -------------------------------------------------
    def add_hash_pairs(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        if h1.size == 0:
            return
        w = (
            np.ones(h1.size, dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        buckets = self._buckets(h1, h2)
        for i in range(self.d):
            np.add.at(self.table[i], buckets[i], w)
        self.total += float(w.sum())

    def estimate_hash_pairs(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """float64[n] point estimates (min over rows)."""
        if h1.size == 0:
            return np.zeros(0, dtype=np.float64)
        buckets = self._buckets(h1, h2)
        ests = np.stack([self.table[i][buckets[i]] for i in range(self.d)])
        return ests.min(axis=0)

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.w, other.d) != (self.w, self.d):
            raise ValueError("Cannot merge count-min sketches with different (w, d)")
        self.table += other.table
        self.total += other.total
        return self

    def merged_with(self, other: "CountMinSketch") -> "CountMinSketch":
        out = CountMinSketch(self.w, self.d)
        np.add(self.table, other.table, out=out.table)
        out.total = self.total + other.total
        return out

    # -- state -------------------------------------------------------------
    def to_state(self) -> dict:
        return {"w": self.w, "d": self.d, "table": self.table.copy(), "total": self.total}

    @staticmethod
    def from_state(state: dict) -> "CountMinSketch":
        c = CountMinSketch(int(state["w"]), int(state["d"]))
        c.table = np.asarray(state["table"], dtype=np.float64).reshape(c.d, c.w).copy()
        c.total = float(state["total"])
        return c

    def __eq__(self, other):
        if not isinstance(other, CountMinSketch):
            return NotImplemented
        return (
            (self.w, self.d, self.total) == (other.w, other.d, other.total)
            and bool(np.array_equal(self.table, other.table))
        )

    def __repr__(self):
        return f"CountMinSketch(w={self.w}, d={self.d}, total={self.total})"
