"""t-digest quantile sketch (Dunning & Ertl 2019), merging variant.

Centroids (mean, weight) kept sorted by mean; compression enforces the k_1
scale-function size bound (candidate centroid pairs merge only while the
combined weight stays under the local capacity ``4 N q (1-q) / delta``).
Rank-accuracy is strongest at the tails - complementary to DDSketch's
relative-VALUE-error guarantee.

Determinism: given the same input multiset in the same arrival order the
digest is deterministic (no RNG), but unlike the register/bin sketches the
result DOES depend on buffering/merge order, so the driver check for
t-digest queries is rows-only; accuracy and merge-stability are pinned by the
pytest suite instead (published bound: quantile rank error well under
~1/compression at the tails, a few percent mid-range).

No reference-repo counterpart (north_rule family member, SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np

__all__ = ["TDigest"]


class TDigest:
    """Merging t-digest with compression parameter ``delta`` (default 200)."""

    def __init__(self, compression: float = 200.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._buf_vals: list[np.ndarray] = []
        self._buf_wts: list[np.ndarray] = []
        self._buf_n = 0

    # -- ingestion ---------------------------------------------------------
    def add_batch(self, values, weights=None) -> None:
        vals = np.ascontiguousarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        w = (
            np.ones(vals.size, dtype=np.float64)
            if weights is None
            else np.ascontiguousarray(weights, dtype=np.float64)
        )
        if w.size and float(w.min()) <= 0.0:
            raise ValueError("weight must be positive")
        self._buf_vals.append(vals)
        self._buf_wts.append(w)
        self._buf_n += vals.size
        if self._buf_n >= 8 * self.compression:
            self._flush()

    def _flush(self) -> None:
        if not self._buf_n:
            return
        vals = np.concatenate([self.means] + self._buf_vals)
        wts = np.concatenate([self.weights] + self._buf_wts)
        self._buf_vals, self._buf_wts, self._buf_n = [], [], 0
        self.means, self.weights = self._compress(vals, wts)
        self.count = float(self.weights.sum())
        if self.means.size:
            self.min = min(self.min, float(vals.min()))
            self.max = max(self.max, float(vals.max()))

    def _compress(self, vals: np.ndarray, wts: np.ndarray):
        """Cluster sorted items by scale-function cell (vectorized).

        Scale function k_sqrt(q) = (delta/4) * (sqrt(2q) - 1) for q < 1/2,
        mirrored as (delta/4) * (1 - sqrt(2(1-q))) above - monotone, range
        [-delta/4, delta/4] (so at most ~delta/2 + 1 centroids survive), with
        cell rank-width ~ 4 sqrt(q)/delta at the low tail (and symmetrically
        at the high tail) - the same sqrt-of-rank tail shrink as Dunning &
        Ertl's k_1 = (delta/2pi) asin(2q-1), which it tracks within a small
        constant.  Chosen over asin because sqrt is IEEE-754
        correctly-rounded in BOTH numpy and DuckDB (asin/ln differ by up to
        2 ulp between libm implementations), making the whole digest - and
        therefore the quantile ESTIMATE itself - bit-exactly SQL-mirrorable
        (functions/rank_oracle.py) when built through the canonical
        single-compaction form (pipelines/canonical.py, buckets=1).
        """
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        total = wts.sum()
        # clip: with fractional weights, cumsum can exceed sum by ~1 ulp,
        # sending 2*(1-q) negative and sqrt to NaN (the old arcsin form
        # carried the same guard as np.clip(2q-1, -1, 1))
        q = np.clip((np.cumsum(wts) - wts / 2.0) / total, 0.0, 1.0)
        d4 = self.compression / 4.0
        k = np.where(
            q < 0.5,
            d4 * (np.sqrt(2.0 * q) - 1.0),
            d4 * (1.0 - np.sqrt(2.0 * (1.0 - q))),
        )
        cells = np.floor(k).astype(np.int64)
        starts = np.concatenate([[0], np.nonzero(np.diff(cells))[0] + 1])
        seg_w = np.add.reduceat(wts, starts)
        seg_sum = np.add.reduceat(vals * wts, starts)
        return seg_sum / seg_w, seg_w

    # -- queries -----------------------------------------------------------
    def quantile(self, q: float):
        """Value estimate at quantile q (interpolated between centroids)."""
        self._flush()
        if not 0 <= q <= 1 or self.count == 0:
            return None
        if self.means.size == 1:
            return float(self.means[0])
        target = q * self.count
        cum = np.cumsum(self.weights) - self.weights / 2.0  # centroid midpoints
        if target <= cum[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0) / max(cum[0], 1e-300)) if cum[0] > 0 else float(self.min)
        if target >= cum[-1]:
            span = self.count - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        idx = int(np.searchsorted(cum, target, side="right"))
        c0, c1 = cum[idx - 1], cum[idx]
        frac = (target - c0) / (c1 - c0)
        return float(self.means[idx - 1] + (self.means[idx] - self.means[idx - 1]) * frac)

    def quantiles(self, qs):
        return [self.quantile(q) for q in qs]

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        """In-place merge; ``other`` is never mutated."""
        if other.compression != self.compression:
            raise ValueError("Cannot merge t-digests with different compression")
        o = other.copy()
        o._flush()
        self._flush()
        if o.count == 0:
            return self
        self._buf_vals.append(o.means)
        self._buf_wts.append(o.weights)
        self._buf_n += o.means.size
        self.min = min(self.min, o.min)
        self.max = max(self.max, o.max)
        self._flush()
        return self

    def merged_with(self, other: "TDigest") -> "TDigest":
        return self.copy().merge(other)

    def copy(self) -> "TDigest":
        out = TDigest(self.compression)
        out.means = self.means.copy()
        out.weights = self.weights.copy()
        out.count = self.count
        out.min = self.min
        out.max = self.max
        out._buf_vals = [v.copy() for v in self._buf_vals]
        out._buf_wts = [w.copy() for w in self._buf_wts]
        out._buf_n = self._buf_n
        return out

    # -- state -------------------------------------------------------------
    def to_state(self) -> dict:
        self._flush()
        return {
            "compression": self.compression,
            "means": self.means.copy(),
            "weights": self.weights.copy(),
            "count": self.count,
            "min": self.min,
            "max": self.max,
        }

    @staticmethod
    def from_state(state: dict) -> "TDigest":
        t = TDigest(float(state["compression"]))
        t.means = np.asarray(state["means"], dtype=np.float64).copy()
        t.weights = np.asarray(state["weights"], dtype=np.float64).copy()
        t.count = float(state["count"])
        t.min = float(state["min"])
        t.max = float(state["max"])
        return t

    def __repr__(self):
        return (
            f"TDigest(compression={self.compression}, centroids={self.means.size}, "
            f"count={self.count})"
        )
