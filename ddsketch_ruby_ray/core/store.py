"""Bucket stores: integer key -> float64 counter, dense over [min_key, max_key].

Semantics derived from the reference (DataDog/ddsketch-ruby):
  - ``DenseStore``: `/root/reference/lib/ddsketch/store/dense_store.rb:14-207`
  - ``CollapsingLowestDenseStore``:
    `/root/reference/lib/ddsketch/store/collapsing_lowest_dense_store.rb:8-142`
  - ``CollapsingHighestDenseStore``:
    `/root/reference/lib/ddsketch/store/collapsing_highest_dense_store.rb:8-140`

From-scratch design notes (NOT a port):

* The reference grows a Ruby array in chunks of 128 and re-centers the occupied
  key range for amortized O(1) scalar ``add``.  Here adds arrive as whole numpy
  key arrays (one per Arrow batch), so the store keeps ``bins`` exactly spanning
  ``[min_key, max_key]`` (``offset == min_key``) and reallocates at most once per
  batch.  The chunked-growth/centering of the reference is a scalar-hot-path
  optimization with no observable semantics: the spec's bin-multiset invariant
  (`spec/support/custom_store_matchers.rb:1-11`) and ``key_at_rank`` results are
  identical for any padding.

* Collapsing semantics are implemented as the reference *spec's* own end-state
  model (`spec/ddsketch/store/collapsing_lowest_dense_store_spec.rb:35-38`):
  whenever the key range would exceed ``bin_limit``, keys are clamped to
  ``max(key, max_key - bin_limit + 1)`` (lowest) / ``min(key, min_key +
  bin_limit - 1)`` (highest) and previously-stored out-of-window mass is folded
  into the boundary bin.  This is provably equivalent to the reference's
  incremental ``adjust``/``get_index``/``merge`` fold logic
  (collapsing_lowest_dense_store.rb:46-73,:107-142): after any collapse the kept
  window is exactly ``bin_limit`` wide and anchored at the running extreme key,
  and folds always target the boundary bin, so the final bins equal the
  clamp-at-end multiset regardless of arrival order.

* Counts are float64 (weighted adds are first-class - dense_store.rb:31).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DenseStore",
    "CollapsingLowestDenseStore",
    "CollapsingHighestDenseStore",
    "store_from_state",
]

CHUNK_SIZE = 128  # kept for API parity; see module docstring


class DenseStore:
    """Dense counter array over the occupied key range ``[min_key, max_key]``."""

    collapse_mode: str | None = None

    def __init__(self, chunk_size: int = CHUNK_SIZE):
        self.chunk_size = chunk_size
        self.count = 0.0
        self.min_key = np.inf  # int once non-empty
        self.max_key = -np.inf
        self.bins = np.zeros(0, dtype=np.float64)

    # -- layout ------------------------------------------------------------
    @property
    def offset(self):
        """Key of bins[0] (== min_key in this layout; +inf when empty)."""
        return self.min_key

    def __len__(self) -> int:
        return len(self.bins)

    @property
    def is_empty(self) -> bool:
        return self.count == 0.0

    def _reserve(self, new_min: int, new_max: int) -> None:
        """Grow ``bins`` (never shrink) to span [new_min, new_max] exactly."""
        new_min, new_max = int(new_min), int(new_max)
        if len(self.bins) == 0:
            self.bins = np.zeros(new_max - new_min + 1, dtype=np.float64)
            self.min_key, self.max_key = new_min, new_max
            return
        if new_min >= self.min_key and new_max <= self.max_key:
            return
        lo = min(new_min, int(self.min_key))
        hi = max(new_max, int(self.max_key))
        fresh = np.zeros(hi - lo + 1, dtype=np.float64)
        fresh[int(self.min_key) - lo : int(self.max_key) - lo + 1] = self.bins
        self.bins = fresh
        self.min_key, self.max_key = lo, hi

    # -- mutation ----------------------------------------------------------
    def add(self, key: int, weight: float = 1.0) -> None:
        self.add_batch(np.asarray([key], dtype=np.int64), np.asarray([weight]))

    def add_batch(self, keys: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Vectorized multi-add: equivalent to ``add(k, w)`` per element."""
        if len(keys) == 0:
            return
        keys = np.asarray(keys, dtype=np.int64)
        if weights is None:
            weights = np.ones(len(keys), dtype=np.float64)
        else:
            weights = np.asarray(weights, dtype=np.float64)
        keys = self._prepare_keys(int(keys.min()), int(keys.max()), keys)
        np.add.at(self.bins, keys - int(self.min_key), weights)
        self.count += float(weights.sum())

    def _prepare_keys(self, kmin: int, kmax: int, keys: np.ndarray) -> np.ndarray:
        """Extend the range for [kmin, kmax]; return (possibly clamped) keys."""
        self._reserve(kmin, kmax)
        return keys

    def copy(self, other: "DenseStore") -> None:
        """Replace this store's state with a deep copy of ``other``'s."""
        self.bins = other.bins.copy()
        self.count = other.count
        self.min_key = other.min_key
        self.max_key = other.max_key

    def merge(self, other: "DenseStore") -> None:
        """Fold ``other`` into self; ``other`` is never mutated or aliased."""
        if other.count == 0:
            return
        if self.count == 0:
            self.copy(other)
            return
        omin, omax = int(other.min_key), int(other.max_key)
        obins = other.bins
        keys = np.arange(omin, omax + 1, dtype=np.int64)
        keys = self._prepare_keys(omin, omax, keys)
        # keys may be clamped by collapsing subclasses -> scatter-add
        np.add.at(self.bins, keys - int(self.min_key), obins)
        self.count += other.count

    # -- queries -----------------------------------------------------------
    def key_at_rank(self, rank: float, lower: bool = True) -> int:
        """Key of the bucket holding the given rank.

        lower=True: first key with running count > rank;
        lower=False: first key with running count >= rank + 1
        (dense_store.rb:123-135).  Falls through to ``max_key``.
        """
        if len(self.bins) == 0:
            return self.max_key
        cum = np.cumsum(self.bins)
        if lower:
            idx = int(np.searchsorted(cum, rank, side="right"))
        else:
            idx = int(np.searchsorted(cum, rank + 1, side="left"))
        if idx >= len(self.bins):
            return int(self.max_key)
        return idx + int(self.min_key)

    def cumulative(self) -> np.ndarray:
        """Running counts per bin (for vectorized multi-quantile queries)."""
        return np.cumsum(self.bins)

    # -- (de)serialization -------------------------------------------------
    def to_state(self) -> dict:
        return {
            "bins": self.bins.copy(),
            "bin_offset": int(self.min_key) if len(self.bins) else 0,
            "count": float(self.count),
        }

    @classmethod
    def from_state(cls, state: dict, **kwargs) -> "DenseStore":
        st = cls(**kwargs)
        bins = np.asarray(state["bins"], dtype=np.float64)
        if len(bins):
            st.bins = bins.copy()
            st.min_key = int(state["bin_offset"])
            st.max_key = st.min_key + len(bins) - 1
        st.count = float(state["count"])
        return st

    def __eq__(self, other):
        if not isinstance(other, DenseStore):
            return NotImplemented
        if self.count != other.count:
            return False
        if len(self.bins) == 0 and len(other.bins) == 0:
            return True
        # compare trimmed occupied ranges (padding is not observable)
        return self._trimmed() == other._trimmed()

    def _trimmed(self):
        nz = np.flatnonzero(self.bins)
        if len(nz) == 0:
            return (0, ())
        lo, hi = nz[0], nz[-1]
        return (int(self.min_key) + int(lo), tuple(self.bins[lo : hi + 1].tolist()))

    def __hash__(self):  # pragma: no cover
        return id(self)


class _CollapsingStore(DenseStore):
    """Shared machinery for bounded stores (window of at most ``bin_limit`` keys)."""

    def __init__(self, bin_limit: int, chunk_size: int = CHUNK_SIZE):
        super().__init__(chunk_size)
        self.bin_limit = int(bin_limit)
        self.is_collapsed = False

    def copy(self, other) -> None:
        super().copy(other)
        self.bin_limit = other.bin_limit
        self.is_collapsed = other.is_collapsed

    def to_state(self) -> dict:
        st = super().to_state()
        st["is_collapsed"] = self.is_collapsed
        return st

    @classmethod
    def from_state(cls, state: dict, *, bin_limit: int, **kwargs):
        st = super().from_state(state, bin_limit=bin_limit, **kwargs)
        st.is_collapsed = bool(state.get("is_collapsed", False))
        return st


class CollapsingLowestDenseStore(_CollapsingStore):
    """Bounded store folding the *lowest* keys into the window's lowest bin."""

    collapse_mode = "lowest"

    def _prepare_keys(self, kmin: int, kmax: int, keys: np.ndarray) -> np.ndarray:
        new_min = min(kmin, int(self.min_key)) if self.count else kmin
        new_max = max(kmax, int(self.max_key)) if self.count else kmax
        if new_max - new_min + 1 > self.bin_limit:
            threshold = new_max - self.bin_limit + 1
            self.is_collapsed = True
            if self.count:
                if threshold > int(self.max_key):
                    # everything previously stored folds into the boundary bin
                    total = self.bins.sum()
                    self.bins = np.asarray([total], dtype=np.float64)
                    self.min_key = self.max_key = threshold
                elif threshold > int(self.min_key):
                    # fold existing low mass into the new boundary bin
                    cut = threshold - int(self.min_key)
                    folded = self.bins[:cut].sum()
                    self.bins = self.bins[cut:].copy()
                    self.min_key = threshold
                    self.bins[0] += folded
            clamped_min = max(kmin, threshold)
            lo = min(clamped_min, int(self.min_key)) if self.count else clamped_min
            self._reserve(lo, new_max)
            return np.maximum(keys, threshold)
        self._reserve(new_min, new_max)
        return keys


class CollapsingHighestDenseStore(_CollapsingStore):
    """Bounded store folding the *highest* keys into the window's highest bin."""

    collapse_mode = "highest"

    def _prepare_keys(self, kmin: int, kmax: int, keys: np.ndarray) -> np.ndarray:
        new_min = min(kmin, int(self.min_key)) if self.count else kmin
        new_max = max(kmax, int(self.max_key)) if self.count else kmax
        if new_max - new_min + 1 > self.bin_limit:
            threshold = new_min + self.bin_limit - 1
            self.is_collapsed = True
            if self.count:
                if threshold < int(self.min_key):
                    total = self.bins.sum()
                    self.bins = np.asarray([total], dtype=np.float64)
                    self.min_key = self.max_key = threshold
                elif threshold < int(self.max_key):
                    cut = threshold - int(self.min_key) + 1
                    folded = self.bins[cut:].sum()
                    self.bins = self.bins[:cut].copy()
                    self.max_key = threshold
                    self.bins[-1] += folded
            clamped_max = min(kmax, threshold)
            hi = max(clamped_max, int(self.max_key)) if self.count else clamped_max
            self._reserve(new_min, hi)
            return np.minimum(keys, threshold)
        self._reserve(new_min, new_max)
        return keys


_STORE_MODES = {
    None: DenseStore,
    "none": DenseStore,
    "lowest": CollapsingLowestDenseStore,
    "highest": CollapsingHighestDenseStore,
}


def store_from_state(state: dict, mode: str | None, bin_limit: int | None) -> DenseStore:
    cls = _STORE_MODES[mode]
    if cls is DenseStore:
        return DenseStore.from_state(state)
    return cls.from_state(state, bin_limit=int(bin_limit))
