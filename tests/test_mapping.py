"""Key-mapping property sweep.

Re-creation of `/root/reference/spec/support/shared_context_for_mapping.rb`:
round-trip relative error < alpha across the full representable range for a
geometric sweep of alphas; offset property; constructor validation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ddsketch_ruby_ray.core import (
    CubicallyInterpolatedKeyMapping,
    KeyMapping,
    LinearlyInterpolatedKeyMapping,
    LogarithmicKeyMapping,
)

MAPPINGS = [
    LogarithmicKeyMapping,
    LinearlyInterpolatedKeyMapping,
    CubicallyInterpolatedKeyMapping,
]

def alpha_sweep():
    # shared_context_for_mapping.rb:46-65: from 1-1e-3 down to 1e-8,
    # multiplying by (1 - sqrt(2)*0.1)
    alpha = 1 - 1e-3
    factor = 1 - math.sqrt(2) * 0.1
    out = []
    while alpha >= 1e-8:
        out.append(alpha)
        alpha *= factor
    return out


@pytest.mark.parametrize("cls", MAPPINGS)
def test_round_trip_accuracy(cls):
    mult = 2 - math.sqrt(2) * 0.1  # value sweep factor (rb:18-41)
    for alpha in alpha_sweep():
        m = cls(alpha)
        # vectorized geometric sweep over the full indexable range
        lo, hi = math.log(m.min_possible), math.log(m.max_possible)
        n = int((hi - lo) / math.log(mult)) + 1
        values = np.exp(lo + np.arange(n) * math.log(mult))
        values = values[(values >= m.min_possible) & (values <= m.max_possible)]
        rt = m.value(m.key(values))
        rel_err = np.abs(rt - values) / values
        assert float(rel_err.max()) < alpha, (cls.__name__, alpha, float(rel_err.max()))


@pytest.mark.parametrize("cls", MAPPINGS)
@pytest.mark.parametrize("offset", [0, 1, -12.23, 7768.3])
def test_offset_property(cls, offset):
    # key(1) == int(offset) (rb:67-79); log_gamma(1)=0, ceil->0, truncate offset
    m = cls(0.01, offset=offset)
    assert m.key(1.0) == int(offset)


@pytest.mark.parametrize("cls", MAPPINGS)
@pytest.mark.parametrize("alpha", [1.1, -0.1, 0.0, 1.0])
def test_ctor_validation(cls, alpha):
    with pytest.raises(ValueError, match="must be between 0 and 1"):
        cls(alpha)


def test_gamma_and_multiplier_values():
    m = LogarithmicKeyMapping(0.01)
    assert m.gamma == pytest.approx(1 + 2 * 0.01 / 0.99)
    # key formula: ceil(log2(v) * ln2/ln(gamma))
    assert m.multiplier == pytest.approx(math.log(2) / math.log(m.gamma))
    assert m.key(100.0) == math.ceil(math.log(100.0, 2) * m.multiplier)


def test_vectorized_matches_scalar():
    m = LogarithmicKeyMapping(0.02)
    vals = np.geomspace(1e-9, 1e9, 1000)
    keys_vec = m.key(vals)
    for v, k in zip(vals[::97], keys_vec[::97]):
        assert m.key(float(v)) == int(k)
    back = m.value(keys_vec)
    for k, b in zip(keys_vec[::97], back[::97]):
        # scalar path uses libm pow, vector path exp2 -> agree to the last ulp
        assert m.value(int(k)) == pytest.approx(float(b), rel=1e-15)
