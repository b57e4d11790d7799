"""Key mappings: value <-> integer bucket index with relative-accuracy guarantee.

Semantics derived from the reference (DataDog/ddsketch-ruby):
  - ``KeyMapping`` contract: `/root/reference/lib/ddsketch/mapping/key_mapping.rb:46-82`
    * gamma = 1 + 2*alpha/(1-alpha)  (== (1+alpha)/(1-alpha))
    * multiplier = 1/ln(gamma)
    * min_possible = DBL_MIN * gamma, max_possible = DBL_MAX / gamma
    * key(v)   = int(ceil(log_gamma(v)) + offset)   (truncation toward zero)
    * value(k) = pow_gamma(k - offset) * 2/(1+gamma)
  - ``LogarithmicKeyMapping``: `/root/reference/lib/ddsketch/mapping/logarithmic_key_mapping.rb:10-23`
    * multiplier *= ln(2); log_gamma(v) = log2(v)*multiplier; pow_gamma(x) = 2**(x/multiplier)
  - ``LinearlyInterpolatedKeyMapping``:
    `/root/reference/lib/ddsketch/mapping/linear_interpolated_key_mapping.rb:15-49`
  - ``CubicallyInterpolatedKeyMapping``:
    `/root/reference/lib/ddsketch/mapping/cubically_interpolated_key_mapping.rb:10-67`

This is a from-scratch numpy implementation: every method is vectorized over
ndarrays (the reference is scalar Ruby). ``key()``/``value()`` accept scalars or
arrays and return int64 / float64 ndarrays for array input.
"""

from __future__ import annotations

import math
import sys

import numpy as np

__all__ = [
    "KeyMapping",
    "LogarithmicKeyMapping",
    "LinearlyInterpolatedKeyMapping",
    "CubicallyInterpolatedKeyMapping",
    "mapping_from_tag",
]


class KeyMapping:
    """Abstract value<->key mapping imposing relative accuracy ``alpha``."""

    #: interpolation tag used by serialization (None | "linear" | "cubic")
    interpolation: str | None = None

    def __init__(self, relative_accuracy: float | None, offset: float = 0.0, *, gamma: float | None = None):
        """Construct from ``relative_accuracy`` or (wire decode) exact ``gamma``.

        The wire format carries gamma, not alpha; constructing from gamma
        keeps merge-compatibility (gamma equality) exact across a
        serialize/deserialize hop.  The derived multiplier can differ from
        the alpha-constructed one by an ulp (gamma - 1 vs 2a/(1-a)) - an
        inherent property of the proto schema, not of this implementation.
        """
        self.offset = float(offset)
        if gamma is not None:
            if gamma <= 1.0:
                raise ValueError("gamma must be > 1")
            self.gamma = float(gamma)
            gamma_mantissa = self.gamma - 1.0
            self.relative_accuracy = gamma_mantissa / (self.gamma + 1.0)
        else:
            if relative_accuracy <= 0 or relative_accuracy >= 1:
                raise ValueError("Relative accuracy must be between 0 and 1.")
            self.relative_accuracy = float(relative_accuracy)
            gamma_mantissa = 2 * relative_accuracy / (1 - relative_accuracy)
            self.gamma = 1.0 + gamma_mantissa
        self._multiplier = 1.0 / math.log1p(gamma_mantissa)
        self.min_possible = sys.float_info.min * self.gamma
        self.max_possible = sys.float_info.max / self.gamma

    # -- subclass hooks ----------------------------------------------------
    def _log_gamma(self, value):  # pragma: no cover - abstract
        raise NotImplementedError

    def _pow_gamma(self, value):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- public API --------------------------------------------------------
    def key(self, value):
        """Bucket key(s) for value(s); vectorized. int(ceil(log_gamma)+offset)."""
        lg = self._log_gamma(np.asarray(value, dtype=np.float64))
        # Ruby Integer() truncates toward zero; np trunc matches for float offsets.
        k = np.trunc(np.ceil(lg) + self.offset)
        if np.ndim(k) == 0:
            return int(k)
        return k.astype(np.int64)

    def value(self, key):
        """Representative value(s) of bucket key(s): lower-bound * 2/(1+gamma)."""
        k = np.asarray(key, dtype=np.float64)
        v = self._pow_gamma(k - self.offset) * (2.0 / (1.0 + self.gamma))
        if np.ndim(v) == 0:
            return float(v)
        return v

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.gamma == other.gamma
            and self.offset == other.offset
        )

    def __hash__(self):
        return hash((type(self).__name__, self.gamma, self.offset))


class LogarithmicKeyMapping(KeyMapping):
    """Memory-optimal exact-log mapping (the default in all sketch classes)."""

    interpolation = None

    def __init__(self, relative_accuracy: float | None, offset: float = 0.0, *, gamma: float | None = None):
        super().__init__(relative_accuracy, offset, gamma=gamma)
        self._multiplier *= math.log(2.0)

    def _log_gamma(self, value):
        return np.log2(value) * self._multiplier

    def _pow_gamma(self, value):
        # Scalar path (quantile finalize) uses libm pow: bit-identical to SQL
        # engines' power(2.0, x), which lets the DuckDB oracle value-hash the
        # estimates exactly.  Vectorized path uses exp2 (fast, last-ulp close).
        if np.ndim(value) == 0:
            return math.pow(2.0, float(value) / self._multiplier)
        return np.exp2(value / self._multiplier)

    @property
    def multiplier(self) -> float:
        """log2->key multiplier (exposed for the SQL-mirrored oracle)."""
        return self._multiplier


class LinearlyInterpolatedKeyMapping(KeyMapping):
    """Approximates log2 by exponent extraction + linear mantissa interpolation.

    log2(v) ~= (exponent-1) + (2*mantissa - 1) for v = mantissa * 2**exponent,
    mantissa in [0.5, 1).  Inverse uses exp2/ldexp.
    """

    interpolation = "linear"

    def _log_gamma(self, value):
        mantissa, exponent = np.frexp(value)
        return (2.0 * mantissa - 1.0 + (exponent - 1)) * self._multiplier

    def _pow_gamma(self, value):
        x = np.asarray(value, dtype=np.float64) / self._multiplier
        exponent = np.floor(x) + 1
        mantissa = (x - np.floor(x) + 1.0) / 2.0
        return np.ldexp(mantissa, exponent.astype(np.int64))


class CubicallyInterpolatedKeyMapping(KeyMapping):
    """Cubic mantissa interpolation of log2 (~1% fewer buckets than linear).

    Forward: ((A*s + B)*s + C)*s + (e-1) for v = (1+s)*2**e, s in [0,1);
    inverse solves the cubic via Cardano.  Constants per the reference.
    """

    interpolation = "cubic"

    _A = 6.0 / 35.0
    _B = -3.0 / 5.0
    _C = 10.0 / 7.0

    def __init__(self, relative_accuracy: float | None, offset: float = 0.0, *, gamma: float | None = None):
        super().__init__(relative_accuracy, offset, gamma=gamma)
        self._multiplier /= self._C

    def _log_gamma(self, value):
        mantissa, exponent = np.frexp(value)
        s = 2.0 * mantissa - 1.0  # in [0, 1)
        approx = ((self._A * s + self._B) * s + self._C) * s + (exponent - 1)
        return approx * self._multiplier

    def _pow_gamma(self, value):
        # Solve A*s^3 + B*s^2 + C*s = frac for s in [0,1) via Cardano's formula,
        # in the exact algebraic form of the reference (cubically_interpolated_
        # key_mapping.rb:48-63) so round-trips agree to the last ulp.
        a, b, c = self._A, self._B, self._C
        delta_0 = b * b - 3.0 * a * c
        if np.ndim(value) == 0:
            # Scalar path (quantile finalize): libm cbrt via math.cbrt, which
            # is bit-identical to DuckDB's cbrt - np.cbrt is numpy's own
            # kernel and differs in the last ulp, breaking the SQL oracle.
            x = float(value) / self._multiplier
            exponent = math.floor(x)
            frac = x - exponent
            delta_1 = 2.0 * b**3 - 9.0 * a * b * c - 27.0 * a * a * frac
            cardano = math.cbrt((delta_1 - math.sqrt(delta_1 * delta_1 - 4.0 * delta_0**3)) / 2.0)
            significand_plus_one = -(b + cardano + delta_0 / cardano) / (3.0 * a) + 1.0
            return math.ldexp(significand_plus_one / 2.0, int(exponent + 1))
        x = np.asarray(value, dtype=np.float64) / self._multiplier
        exponent = np.floor(x)
        frac = x - exponent
        delta_1 = 2.0 * b**3 - 9.0 * a * b * c - 27.0 * a * a * frac
        cardano = np.cbrt((delta_1 - np.sqrt(delta_1 * delta_1 - 4.0 * delta_0**3)) / 2.0)
        significand_plus_one = -(b + cardano + delta_0 / cardano) / (3.0 * a) + 1.0
        return np.ldexp(significand_plus_one / 2.0, (exponent + 1).astype(np.int64))


_TAGS = {
    None: LogarithmicKeyMapping,
    "none": LogarithmicKeyMapping,
    "log": LogarithmicKeyMapping,
    "linear": LinearlyInterpolatedKeyMapping,
    "cubic": CubicallyInterpolatedKeyMapping,
}


def mapping_from_tag(
    tag, relative_accuracy: float | None, offset: float = 0.0, *, gamma: float | None = None
) -> KeyMapping:
    """Construct a mapping by its serialization tag (alpha- or gamma-based)."""
    try:
        cls = _TAGS[tag]
    except KeyError:
        raise ValueError(f"unknown mapping tag {tag!r}") from None
    return cls(relative_accuracy, offset, gamma=gamma)
