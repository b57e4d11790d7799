"""Store-level conformance tests.

Re-creation of `/root/reference/spec/ddsketch/store/dense_store_spec.rb` and
`collapsing_{lowest,highest}_dense_store_spec.rb` invariants (FIXTURES.md
section 3): bin-multiset invariant under the clamp model, merge permutations,
key_at_rank lower/upper semantics, extreme keys.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from ddsketch_ruby_ray.core import (
    CollapsingHighestDenseStore,
    CollapsingLowestDenseStore,
    DenseStore,
)

KEY_SEQUENCES = {
    "zeros": [0] * 100,
    "ascending": list(range(100)),
    "descending": list(range(99, -1, -1)),
    "pow2": [2**x for x in range(10)],
    "pow2_desc": [2**x for x in range(15, -1, -1)],
    "triangular_signed": [s * (i + 1) for i in range(4) for s in (1, -1) for _ in range(2 * (i + 1))],
}

BIN_LIMITS = [1, 20, 1000]


def bin_multiset(store):
    """{key: count} for nonzero bins (custom_store_matchers.rb:1-11)."""
    out = {}
    for i, c in enumerate(store.bins):
        if c != 0:
            out[i + int(store.min_key)] = c
    return out


def clamp(keys, store):
    if isinstance(store, CollapsingLowestDenseStore):
        lo = int(store.max_key) - store.bin_limit + 1
        return [max(k, lo) for k in keys]
    if isinstance(store, CollapsingHighestDenseStore):
        hi = int(store.min_key) + store.bin_limit - 1
        return [min(k, hi) for k in keys]
    return list(keys)


def check_store_invariant(store, keys):
    assert store.count == len(keys)
    assert sum(store.bins) == pytest.approx(len(keys))
    expected = Counter(clamp(keys, store))
    assert bin_multiset(store) == expected


@pytest.mark.parametrize("seq", KEY_SEQUENCES)
def test_dense_store_add_sequences(seq):
    keys = KEY_SEQUENCES[seq]
    st = DenseStore()
    for k in keys:
        st.add(k)
    check_store_invariant(st, keys)
    # batch add gives the identical store
    st2 = DenseStore()
    st2.add_batch(np.asarray(keys, dtype=np.int64))
    assert st == st2


@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize("seq", KEY_SEQUENCES)
@pytest.mark.parametrize("cls", [CollapsingLowestDenseStore, CollapsingHighestDenseStore])
def test_collapsing_store_add_sequences(cls, seq, bin_limit):
    keys = KEY_SEQUENCES[seq]
    st = cls(bin_limit)
    for k in keys:
        st.add(k)
    check_store_invariant(st, keys)
    assert len(st.bins) <= bin_limit
    st2 = cls(bin_limit)
    st2.add_batch(np.asarray(keys, dtype=np.int64))
    assert st == st2


@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize("cls", [CollapsingLowestDenseStore, CollapsingHighestDenseStore])
def test_collapsing_store_extreme_keys(cls, bin_limit):
    # collapsing_*_spec extremes; +-2**63 overflows practical dense ranges, use
    # clamp-window semantics with a window anchored at the extreme.
    keys = [0, 2**40, -(2**40), 2**40 - 5]
    st = cls(bin_limit)
    for k in keys:
        st.add(k)
    check_store_invariant(st, keys)
    assert len(st.bins) <= bin_limit


MERGE_LISTS = [
    [[-10000], [10000]],
    [[10000, 0], [-10000], [0]],
    [[2, 2], [2, 2, 2], [2]],
    [list(range(0, 40)), list(range(40, 80)), [1000]],
]


@pytest.mark.parametrize("lists", MERGE_LISTS)
@pytest.mark.parametrize(
    "cls", [DenseStore, lambda: CollapsingLowestDenseStore(20), lambda: CollapsingHighestDenseStore(20)]
)
def test_store_merge_equals_adds(cls, lists):
    factory = cls if cls is DenseStore else cls
    merged = factory() if cls is DenseStore else cls()
    flat = []
    for part_keys in lists:
        part = factory() if cls is DenseStore else cls()
        part.add_batch(np.asarray(part_keys, dtype=np.int64))
        merged.merge(part)
        flat.extend(part_keys)
        # right operand untouched
        check_store_invariant(part, part_keys)
    check_store_invariant(merged, flat)


def test_store_merge_permutation_identity():
    parts_keys = [[-10, 0, 5], [100, 100], [7] * 10, [-3, 50]]
    def build(order):
        acc = DenseStore()
        for i in order:
            p = DenseStore()
            p.add_batch(np.asarray(parts_keys[i], dtype=np.int64))
            acc.merge(p)
        return acc
    base = build(range(4))
    for order in [(3, 2, 1, 0), (1, 3, 0, 2), (2, 0, 3, 1)]:
        assert build(order) == base


def test_key_at_rank_semantics():
    # dense_store_spec.rb:59-80 lower/upper semantics, incl. fractional ranks
    st = DenseStore()
    for k in (4, 10, 100):
        st.add(k)

    def oracle(rank, lower):
        running = 0.0
        for i, c in enumerate(st.bins):
            running += c
            if (lower and running > rank) or (not lower and running >= rank + 1):
                return i + int(st.min_key)
        return int(st.max_key)

    for rank in (-0.5, 0, 0.5, 1, 1.5, 2, 2.5, 3, 10):
        for lower in (True, False):
            assert st.key_at_rank(rank, lower) == oracle(rank, lower), (rank, lower)


def test_key_at_rank_expected_values():
    st = DenseStore()
    for k in (4, 10, 100):
        st.add(k)
    assert st.key_at_rank(0) == 4
    assert st.key_at_rank(1) == 10
    assert st.key_at_rank(2) == 100
    assert st.key_at_rank(0.5) == 4
    assert st.key_at_rank(-0.5) == 4
    assert st.key_at_rank(0, lower=False) == 4
    assert st.key_at_rank(0.5, lower=False) == 10
    assert st.key_at_rank(1, lower=False) == 10
    assert st.key_at_rank(1.5, lower=False) == 100


@pytest.mark.parametrize(
    "make", [DenseStore, lambda: CollapsingLowestDenseStore(1000), lambda: CollapsingHighestDenseStore(1000)]
)
def test_store_copy(make):
    src = make()
    src.add_batch(np.asarray([1, 5, 5, 9], dtype=np.int64))
    dst = make()
    dst.copy(src)
    assert dst == src
    dst.add(100)
    assert src.count == 4  # deep copy: no aliasing
    empty = make()
    dst.copy(empty)
    assert dst.count == 0
