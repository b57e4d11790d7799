"""Ray-Data-native distributed sketch / approximate-aggregation engine.

Built from scratch with the query capabilities of DataDog/ddsketch-ruby
(reference at /root/reference, cited per-module) re-expressed as mergeable
Ray Data aggregations over zero-copy Arrow batches, plus the sketch family
(HLL, count-min, t-digest, KLL, Bloom) and large-scale training-data
operators (dedup, similarity search, text analysis) mandated by the
project's north rule.
"""

from .core import (  # noqa: F401
    DDSketch,
    InvalidSketchMergeError,
    LogCollapsingHighestDenseSketch,
    LogCollapsingLowestDenseSketch,
)

__version__ = "0.1.0"

# NOTE: Ray Data tuning (push-based shuffle) lives in pipelines/__init__.py
# so that importing the package for the pure-numpy sketches alone never
# pulls in ray.data.
