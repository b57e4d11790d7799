"""AMS tug-of-war sketch: second frequency moment F2 / self-join size.

Alon-Matias-Szegedy (STOC'96): d independent ±1 hash functions; each
estimator keeps the signed sum S_j = Σ_x sign_j(x) over the stream.  E[S_j²]
= F2 = Σ_v f_v² — the self-join size, the quantity a query planner wants
before hash-joining a key.  The estimate is the MEDIAN of the d squares
(median-of-estimators error boosting; d odd so the median is an element).

Same contract as the reference's DDSketch (accumulate / merge / finalize,
base_sketch.rb:96-171): S_j sums are trivially mergeable by addition, so
any Ray block split or merge order yields the same integers, and the whole
sketch — sums, squares, median — is exact integer arithmetic with a
bit-exact DuckDB mirror.

sign_j(x) = +1 if bit 0 of splitmix64(x, seed=j) else -1 (independent
splitmix64 lanes per estimator, core/hashing.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["AMSSketch"]


class AMSSketch:
    """d signed counters over a stream of uint64 hash values."""

    __slots__ = ("d", "sums", "count")

    def __init__(self, d: int = 5):
        if d < 1 or d % 2 == 0:
            raise ValueError(f"d must be odd and >= 1, got {d}")
        self.d = int(d)
        self.sums = np.zeros(d, dtype=np.int64)
        self.count = 0

    def add_hash_lanes(self, lanes: list[np.ndarray]) -> None:
        """Fold a batch: ``lanes[j]`` is the j-th estimator's uint64 hashes."""
        assert len(lanes) == self.d
        if lanes and lanes[0].size:
            self.count += int(lanes[0].size)
            for j, h in enumerate(lanes):
                # sign = +1 if low bit set else -1; sum = 2*popcount(bit0) - n
                ones = int((h & np.uint64(1)).sum())
                self.sums[j] += 2 * ones - h.size

    def merged_with(self, other: "AMSSketch") -> "AMSSketch":
        if self.d != other.d:
            raise ValueError(f"cannot merge AMS sketches with d={self.d} and d={other.d}")
        out = AMSSketch(self.d)
        out.sums = self.sums + other.sums
        out.count = self.count + other.count
        return out

    def f2_estimate(self) -> float:
        """Median of the d squared sums (exact integers -> float at the end)."""
        squares = np.sort(self.sums.astype(object) ** 2)  # python ints: no overflow
        return float(squares[self.d // 2])
