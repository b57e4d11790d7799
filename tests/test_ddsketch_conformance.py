"""DDSketch conformance suite.

Python re-creation of the reference's shared sketch examples
(`/root/reference/spec/support/shared_examples_for_sketch.rb:3-263`) run
against all three sketch classes, plus the merge-order permutation-identity
tests required by the north rule (beyond the reference's random merge tests).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from ddsketch_ruby_ray.core import (
    DDSketch,
    InvalidSketchMergeError,
    LogCollapsingHighestDenseSketch,
    LogCollapsingLowestDenseSketch,
)
from .datasets import (
    DETERMINISTIC_SHAPES,
    RANDOM_DISTRIBUTIONS,
    TEST_QUANTILES,
    TEST_SIZES,
    accuracy_ok,
    integers,
    lognormal,
    normal,
    true_quantile,
)

ALPHA = 0.05  # sketch_spec.rb:4 / log_collapsing_*_spec.rb:4
BIN_LIMIT = 1024

SKETCHES = {
    "dense": lambda: DDSketch(ALPHA),
    "collapse_lowest": lambda: LogCollapsingLowestDenseSketch(ALPHA, BIN_LIMIT),
    "collapse_highest": lambda: LogCollapsingHighestDenseSketch(ALPHA, BIN_LIMIT),
}


def _check_sketch_vs_data(sketch, data, alpha=ALPHA):
    data = np.asarray(data, dtype=np.float64)
    assert sketch.num_values == len(data)
    assert sketch.sum == pytest.approx(data.sum(), abs=1e-3)
    assert sketch.avg == pytest.approx(data.mean(), abs=1e-3)
    for q in TEST_QUANTILES:
        est = sketch.get_quantile_value(q)
        true = true_quantile(data, q)
        assert accuracy_ok(est, true, alpha), (
            f"q={q}: est={est} true={true} alpha={alpha}"
        )


@pytest.mark.parametrize("sketch_name", SKETCHES)
@pytest.mark.parametrize("shape", DETERMINISTIC_SHAPES)
@pytest.mark.parametrize("size", TEST_SIZES)
def test_add_deterministic_shapes(sketch_name, shape, size):
    data = DETERMINISTIC_SHAPES[shape](size)
    sketch = SKETCHES[sketch_name]()
    if size <= 100:  # exercise the scalar path like the spec's add loop
        for v in data:
            sketch.add(float(v))
    else:
        sketch.add_batch(data)
    _check_sketch_vs_data(sketch, data)


@pytest.mark.parametrize("sketch_name", SKETCHES)
@pytest.mark.parametrize("dist", RANDOM_DISTRIBUTIONS)
def test_add_random_distributions(sketch_name, dist):
    data = RANDOM_DISTRIBUTIONS[dist]()
    sketch = SKETCHES[sketch_name]()
    sketch.add_batch(data)
    _check_sketch_vs_data(sketch, data)


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_scalar_and_batch_add_agree(sketch_name):
    data = DETERMINISTIC_SHAPES["NumberLineForward"](100)
    a = SKETCHES[sketch_name]()
    b = SKETCHES[sketch_name]()
    for v in data:
        a.add(float(v))
    b.add_batch(data)
    assert a == b


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_weighted_add_equals_repeated_add(sketch_name):
    # shared_examples_for_sketch.rb:63-83
    data = integers(1000)
    values, counts = np.unique(data, return_counts=True)
    sketch = SKETCHES[sketch_name]()
    for v, c in zip(values, counts):
        sketch.add(float(v), float(c))
    _check_sketch_vs_data(sketch, data)


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_weighted_add_explicit_case(sketch_name):
    # shared_examples_for_sketch.rb:85-103
    sketch = SKETCHES[sketch_name]()
    for v in range(100):
        sketch.add(v, 1.1)
    sketch.add(100, 110.0)
    median = sketch.get_quantile_value(0.5)
    assert abs(median - 99) - ALPHA * 99 <= 1e-15
    assert sketch.count == pytest.approx(220, abs=1e-3)
    assert sketch.sum == pytest.approx(16445, abs=1e-3)
    assert sketch.avg == pytest.approx(74.75, abs=1e-3)


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_nonpositive_weight_raises(sketch_name):
    sketch = SKETCHES[sketch_name]()
    with pytest.raises(ValueError, match="must be positive"):
        sketch.add(0, 0)
    with pytest.raises(ValueError, match="must be positive"):
        sketch.add_batch(np.asarray([1.0, 2.0]), np.asarray([1.0, -1.0]))


# -- merge suite (shared_examples_for_sketch.rb:117-263) ---------------------

MERGE_PARAMS = [(35, 1), (1, 3), (15, 2), (40, 0.5)]


@pytest.mark.parametrize("sketch_name", SKETCHES)
@pytest.mark.parametrize("size", TEST_SIZES)
def test_merge_equal_sized(sketch_name, size):
    target = SKETCHES[sketch_name]()
    acc = []
    for loc, scale in MERGE_PARAMS:
        data = normal(size, loc, scale, tag=f"merge-{size}")
        part = SKETCHES[sketch_name]()
        part.add_batch(data)
        target.merge(part)
        acc.append(data)
    _check_sketch_vs_data(target, np.concatenate(acc))


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_merge_unequal_split(sketch_name):
    data = lognormal(1000)
    rng = np.random.default_rng(7)
    mask = rng.random(1000) < 0.7
    s1 = SKETCHES[sketch_name]()
    s2 = SKETCHES[sketch_name]()
    s1.add_batch(data[mask])
    s2.add_batch(data[~mask])
    s1.merge(s2)
    _check_sketch_vs_data(s1, data)


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_merge_mixed_distributions(sketch_name):
    target = SKETCHES[sketch_name]()
    acc = []
    for name, gen in RANDOM_DISTRIBUTIONS.items():
        data = gen()
        part = SKETCHES[sketch_name]()
        part.add_batch(data)
        target.merge(part)
        acc.append(data)
    _check_sketch_vs_data(target, np.concatenate(acc))


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_consistent_merge_no_mutation(sketch_name):
    # shared_examples_for_sketch.rb:203-250: merging must not mutate the right
    # operand, and later adds to the target must not leak into the source.
    target = SKETCHES[sketch_name]()
    source = SKETCHES[sketch_name]()
    data1 = normal(100, tag="consistency")
    source.add_batch(data1)
    before = source.to_state()
    target.merge(source)  # empty-target copy path
    target.add_batch(normal(50, 10.0, 2.0, tag="later"))
    after = source.to_state()
    assert before.keys() == after.keys()
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)

    # merging an empty sketch into a non-empty one is a no-op on both
    empty = SKETCHES[sketch_name]()
    snap = target.to_state()
    target.merge(empty)
    for k, v in target.to_state().items():
        np.testing.assert_array_equal(snap[k], v, err_msg=k)
    assert empty.count == 0


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_merge_gamma_mismatch_raises(sketch_name):
    a = DDSketch(0.1)
    b = DDSketch(0.2)
    with pytest.raises(InvalidSketchMergeError, match="different relative accuracy"):
        a.merge(b)


# -- merge-order permutation identity (north_rule, FIXTURES.md section 5) ----

@pytest.mark.parametrize("sketch_name", SKETCHES)
@pytest.mark.parametrize("k", [2, 8])
def test_merge_order_permutation_identity(sketch_name, k):
    """Any partition merge order yields identical sketch state.

    Uses integer-valued data so all bin counts and the exact running sum are
    exactly representable -> bit-identical states for every permutation/tree.
    """
    rng = np.random.default_rng(123)
    parts = []
    for i in range(k):
        data = np.round(rng.normal(100, 30, size=200)).astype(np.float64)
        s = SKETCHES[sketch_name]()
        s.add_batch(data)
        parts.append(s)

    def left_fold(order):
        acc = SKETCHES[sketch_name]()
        for i in order:
            acc.merge(parts[i])
        return acc

    def balanced(lo, hi):
        if hi - lo == 1:
            return parts[lo].copy()
        mid = (lo + hi) // 2
        return balanced(lo, mid).merge(balanced(mid, hi))

    base = left_fold(range(k))
    orders = itertools.permutations(range(k)) if k == 2 else [
        tuple(reversed(range(k))),
        tuple(np.random.default_rng(5).permutation(k)),
    ]
    for order in orders:
        assert left_fold(order) == base, f"order {order}"
    assert balanced(0, k) == base
    # operands untouched throughout
    for i, p in enumerate(parts):
        assert p.count == 200, i


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_state_round_trip(sketch_name):
    data = RANDOM_DISTRIBUTIONS["Bimodal"]()
    s = SKETCHES[sketch_name]()
    s.add_batch(data)
    restored = DDSketch.from_state(s.to_state())
    assert restored == s
    assert type(restored) is type(s)
    for q in TEST_QUANTILES:
        assert restored.get_quantile_value(q) == s.get_quantile_value(q)


@pytest.mark.parametrize("sketch_name", SKETCHES)
def test_empty_sketch_quantiles(sketch_name):
    s = SKETCHES[sketch_name]()
    assert s.get_quantile_value(0.5) is None
    assert s.get_quantile_value(-0.1) is None
    assert s.get_quantile_value(1.1) is None
    assert s.count == 0


def test_collapsing_sketch_bounds_memory():
    alpha, bin_limit = 0.01, 512
    data = np.geomspace(1e-6, 1e12, 50_000)
    s = LogCollapsingLowestDenseSketch(alpha, bin_limit=bin_limit)
    s.add_batch(data)
    assert len(s.store) <= bin_limit
    # accuracy holds for quantiles whose true value lies inside the kept
    # window [max / gamma**bin_limit, max]; lower mass is folded upward.
    window_lo = data.max() / s.gamma**bin_limit
    for q in (0.5, 0.75, 0.9, 0.99, 0.999, 1.0):
        true = true_quantile(data, q)
        est = s.get_quantile_value(q)
        if true >= window_lo * s.gamma:  # one-bucket margin
            assert accuracy_ok(est, true, alpha), (q, est, true)
        else:
            assert est >= true  # folded mass only moves values upward
