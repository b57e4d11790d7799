"""KMV (k-minimum-values / bottom-k theta) distinct-count sketch.

Complements HyperLogLog (core/hll.py) in the north_rule sketch family: same
``accumulate / merge / finalize`` contract as the reference's DDSketch
(/root/reference/lib/ddsketch/base_sketch.rb:96-171), but where HLL keeps
per-bucket rank maxima, KMV keeps the k SMALLEST distinct hash values.  That
makes it simultaneously

* a distinct-count estimator  — E[distinct] = (k-1)/U_(k) with U_(k) the
  k-th smallest hash normalized to (0,1)  (Bar-Yossef et al. 2002 /
  Beyer et al. "Distinct-value synopses", SIGMOD 2007), and
* a mergeable uniform SAMPLE of the distinct values' hashes (the theta-sketch
  property) — set intersections/unions of two sketches estimate Jaccard and
  overlap cardinalities, which HLL registers cannot.

Fully deterministic given the hash function (splitmix64 / sha256 lanes from
core/hashing.py): union-then-take-k is associative and commutative, so any
Ray block split or merge order yields the SAME k hashes — the DuckDB oracle
(functions/family_oracle.py:kmv_sql) reproduces the estimate bit-for-bit.

Scale: state is at most k uint64s (~8k·B); the groupby shuffle moves KB
states, never rows.  add_batch is one np.unique over the batch's hashes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["KMVSketch"]

_TWO64_F = 18446744073709551616.0  # 2^64 as float, shared with the SQL mirror


class KMVSketch:
    """Bottom-k sketch over uint64 hash values.

    ``hashes`` is kept sorted ascending and duplicate-free, length <= k.
    """

    __slots__ = ("k", "hashes")

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)

    def add_hashes(self, h: np.ndarray) -> None:
        """Fold a batch of uint64 hash values into the bottom-k set."""
        if h.size == 0:
            return
        merged = np.unique(np.concatenate([self.hashes, h.astype(np.uint64)]))
        self.hashes = merged[: self.k]

    def merged_with(self, other: "KMVSketch") -> "KMVSketch":
        if self.k != other.k:
            raise ValueError(f"cannot merge KMV sketches with k={self.k} and k={other.k}")
        out = KMVSketch(self.k)
        out.hashes = np.unique(np.concatenate([self.hashes, other.hashes]))[: self.k]
        return out

    def estimate(self) -> float:
        """Distinct-count estimate: exact below k, (k-1)/U_(k) at/after k.

        Evaluation order ``(k-1) * 2^64 / float(kth)`` matches the SQL
        mirror's ``(k-1) * 18446744073709551616.0 / kth::DOUBLE`` exactly.
        """
        n = self.hashes.size
        if n < self.k:
            return float(n)
        kth = float(self.hashes[self.k - 1])
        return (self.k - 1) * _TWO64_F / kth

    def jaccard_with(self, other: "KMVSketch") -> float:
        """Jaccard similarity estimate via the theta-sketch sample property:
        |A ∩ B| / |A ∪ B| over the union's bottom-k (exact when both sides
        saw < k distinct values)."""
        if self.k != other.k:
            raise ValueError("k mismatch")
        union = np.unique(np.concatenate([self.hashes, other.hashes]))[: self.k]
        if union.size == 0:
            return 0.0
        inter = np.intersect1d(
            np.intersect1d(union, self.hashes, assume_unique=True),
            other.hashes,
            assume_unique=True,
        )
        return inter.size / union.size
