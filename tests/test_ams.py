"""AMS tug-of-war F2 sketch (core/ams.py, AMSSpec)."""

from __future__ import annotations

import numpy as np
import pytest

from ddsketch_ruby_ray.core.ams import AMSSketch
from ddsketch_ruby_ray.core.hashing import hash64_int


def _fill(vals, d=5):
    sk = AMSSketch(d)
    v = np.asarray(vals, dtype=np.int64)
    sk.add_hash_lanes([hash64_int(v, j) for j in range(d)])
    return sk


class TestAMS:
    def test_tracks_true_f2(self):
        rng = np.random.default_rng(4)
        # zipf-ish frequencies over 200 keys
        vals = rng.zipf(1.5, 20000) % 200
        true_f2 = float((np.bincount(vals) ** 2).sum())
        est = _fill(vals, d=21).f2_estimate()
        assert abs(est - true_f2) / true_f2 < 0.6  # median-of-21 AMS bound-ish

    def test_merge_equals_single_build_and_is_pure(self):
        rng = np.random.default_rng(9)
        a_vals, b_vals = rng.integers(0, 500, 3000), rng.integers(0, 500, 4000)
        a, b = _fill(a_vals), _fill(b_vals)
        a_sums = a.sums.copy()
        merged = a.merged_with(b)
        assert (a.sums == a_sums).all()  # purity
        whole = _fill(np.concatenate([a_vals, b_vals]))
        assert (merged.sums == whole.sums).all()  # exact integer algebra
        assert merged.count == whole.count
        assert merged.f2_estimate() == whole.f2_estimate()

    def test_join_size_product_tracks_truth(self):
        rng = np.random.default_rng(31)
        a_vals = rng.integers(0, 300, 20000)
        b_vals = rng.integers(0, 300, 8000)
        fa, fb = np.bincount(a_vals, minlength=300), np.bincount(b_vals, minlength=300)
        true_join = float((fa.astype(np.int64) * fb).sum())
        d = 21
        a, b = _fill(a_vals, d), _fill(b_vals, d)
        prods = sorted(int(x) * int(y) for x, y in zip(a.sums, b.sums))
        est = float(prods[d // 2])
        assert abs(est - true_join) / true_join < 0.6

    def test_d_validation_and_mismatch(self):
        with pytest.raises(ValueError):
            AMSSketch(4)  # even
        with pytest.raises(ValueError):
            AMSSketch(5).merged_with(AMSSketch(7))

    def test_singleton_stream(self):
        sk = _fill([42] * 100)
        # one key with frequency 100 -> every estimator is +-100 -> F2 exact
        assert sk.f2_estimate() == 100.0 * 100.0
