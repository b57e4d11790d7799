"""Pure-numpy sketch algorithms (no Ray imports).

DDSketch semantics follow the reference spec suite of DataDog/ddsketch-ruby
(see module docstrings for file:line citations); the sibling sketches (HLL,
count-min, Bloom, t-digest, KLL) follow their published papers and share the
same accumulate / merge / finalize algebra.
"""

from .mapping import (
    CubicallyInterpolatedKeyMapping,
    KeyMapping,
    LinearlyInterpolatedKeyMapping,
    LogarithmicKeyMapping,
)
from .store import CollapsingHighestDenseStore, CollapsingLowestDenseStore, DenseStore
from .ddsketch import (
    DEFAULT_BIN_LIMIT,
    DEFAULT_REL_ACC,
    DDSketch,
    InvalidSketchMergeError,
    LogCollapsingHighestDenseSketch,
    LogCollapsingLowestDenseSketch,
)

__all__ = [
    "KeyMapping",
    "LogarithmicKeyMapping",
    "LinearlyInterpolatedKeyMapping",
    "CubicallyInterpolatedKeyMapping",
    "DenseStore",
    "CollapsingLowestDenseStore",
    "CollapsingHighestDenseStore",
    "DDSketch",
    "LogCollapsingLowestDenseSketch",
    "LogCollapsingHighestDenseSketch",
    "InvalidSketchMergeError",
    "DEFAULT_REL_ACC",
    "DEFAULT_BIN_LIMIT",
]
