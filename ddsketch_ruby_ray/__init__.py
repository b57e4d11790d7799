"""Ray-Data-native distributed sketch / approximate-aggregation engine.

Built from scratch with the query capabilities of DataDog/ddsketch-ruby
(reference at /root/reference, cited per-module) re-expressed as mergeable
Ray Data aggregations over zero-copy Arrow batches, plus the sketch family
(HLL, count-min, t-digest, KLL, Bloom) and large-scale training-data
operators (dedup, similarity search, text analysis) mandated by the
project's north rule.
"""

import os as _os

from .core import (  # noqa: F401
    DDSketch,
    InvalidSketchMergeError,
    LogCollapsingHighestDenseSketch,
    LogCollapsingLowestDenseSketch,
)

__version__ = "0.1.0"


def _configure_ray_data() -> None:
    """Engine-wide Ray Data tuning (no ray.init here - the driver owns that).

    Push-based shuffle pipelines the map and reduce sides of every sort /
    groupby exchange instead of materializing all map outputs first
    (https://docs.ray.io/en/latest/data - Ray's large-scale shuffle mode).
    Measured on the 16M-row as-of join at 32 cpus: 20-29 s -> 14-17 s wall
    with identical results (the keyed exchanges here reduce by partition id,
    so reduce-side order never affects output).  Opt out with
    GRAFT_PUSH_SHUFFLE=0.
    """
    if _os.environ.get("GRAFT_PUSH_SHUFFLE", "1") == "0":
        return
    try:
        from ray.data import DataContext
    except ImportError:  # pragma: no cover - ray always present in this env
        return
    DataContext.get_current().use_push_based_shuffle = True


_configure_ray_data()
