"""KLL rank/quantile sketch (Karnin, Lang & Liberty, FOCS 2016).

Compactor hierarchy: level h holds items of weight 2^h; when a level
overflows its capacity (k * (2/3)^(depth-from-top), min 2), it sorts and
promotes every other item to the level above.  Rank error is additive:
eps ~= O(1/k) with high probability (~2.6/k for the standard construction).

The even/odd "coin flip" per compaction is drawn from a counter-based
splitmix64 stream (seeded constant), so a given ingest order is fully
reproducible; across different partition/merge orders results legitimately
differ within the bound, so KLL driver queries are rows-only and accuracy is
pinned by the pytest suite (rank-error + merge-bound checks).

No reference-repo counterpart (north_rule family member, SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

__all__ = ["KLL"]


class KLL:
    """KLL sketch with parameter k (default 200: ~1.3% rank error)."""

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._coin_counter = 0

    # -- internals ---------------------------------------------------------
    def _capacity(self, h: int) -> int:
        depth_from_top = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth_from_top)))

    def _coin(self) -> int:
        """Deterministic 0/1 stream (counter-based; reproducible ingest)."""
        self._coin_counter += 1
        h = splitmix64(np.array([self._coin_counter], dtype=np.uint64))
        return int(h[0]) & 1

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    def _compress(self) -> None:
        while sum(a.size for a in self.levels) > self._total_capacity():
            for h in range(len(self.levels)):
                if self.levels[h].size > self._capacity(h):
                    buf = np.sort(self.levels[h], kind="stable")
                    offset = self._coin()
                    promoted = buf[offset::2]
                    self.levels[h] = np.zeros(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.zeros(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break  # nothing individually over capacity

    # -- ingestion ---------------------------------------------------------
    def add_batch(self, values) -> None:
        vals = np.ascontiguousarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        self.count += vals.size
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()

    # -- queries -----------------------------------------------------------
    def _weighted_items(self):
        items, weights = [], []
        for h, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, float(2**h)))
        if not items:
            return np.zeros(0), np.zeros(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float):
        """Value whose estimated rank is closest to q * (count - 1)."""
        if not 0 <= q <= 1 or self.count == 0:
            return None
        if q == 0:
            return float(self.min)
        if q == 1:
            return float(self.max)
        it, wt = self._weighted_items()
        cum = np.cumsum(wt) - wt / 2.0
        target = q * float(wt.sum())
        idx = int(np.clip(np.searchsorted(cum, target), 0, it.size - 1))
        return float(it[idx])

    def quantiles(self, qs):
        return [self.quantile(q) for q in qs]

    def rank(self, value: float) -> float:
        """Estimated number of items <= value."""
        it, wt = self._weighted_items()
        idx = np.searchsorted(it, value, side="right")
        return float(wt[:idx].sum())

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        """In-place merge; ``other`` is never mutated."""
        if other.k != self.k:
            raise ValueError("Cannot merge KLL sketches with different k")
        if other.count == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for h, arr in enumerate(other.levels):
            if arr.size:
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    def merged_with(self, other: "KLL") -> "KLL":
        return self.copy().merge(other)

    def copy(self) -> "KLL":
        out = KLL(self.k)
        out.levels = [a.copy() for a in self.levels]
        out.count = self.count
        out.min = self.min
        out.max = self.max
        out._coin_counter = self._coin_counter
        return out

    # -- state -------------------------------------------------------------
    def to_state(self) -> dict:
        return {
            "k": self.k,
            "levels": [a.copy() for a in self.levels],
            "count": self.count,
            "min": self.min,
            "max": self.max,
            "coin_counter": self._coin_counter,
        }

    @staticmethod
    def from_state(state: dict) -> "KLL":
        s = KLL(int(state["k"]))
        s.levels = [np.asarray(a, dtype=np.float64).copy() for a in state["levels"]]
        if not s.levels:
            s.levels = [np.zeros(0, dtype=np.float64)]
        s.count = float(state["count"])
        s.min = float(state["min"])
        s.max = float(state["max"])
        s._coin_counter = int(state.get("coin_counter", 0))
        return s

    def __repr__(self):
        return f"KLL(k={self.k}, count={self.count}, levels={len(self.levels)})"
