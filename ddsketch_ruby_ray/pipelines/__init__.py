"""End-to-end pipelines (flagship sketch pipeline, checkpointed runs)."""

import os as _os


def _configure_ray_data() -> None:
    """Engine-wide Ray Data tuning (no ray.init here - the driver owns that).

    Push-based sort shuffle pipelines the map and reduce sides of every
    sort / groupby exchange instead of materializing all map outputs first.
    Measured on the 16M-row as-of join at 32 cpus: 20-29 s -> 14-17 s wall
    with identical results (the keyed exchanges here reduce by partition
    id, so reduce-side order never affects output); Ray 2.49's HASH_SHUFFLE
    strategy measured 39-45 s on the same job (aggregator-actor overhead)
    and is not used.  Lives here, not in the package __init__, so importing
    the package for the pure-numpy sketches alone never imports ray.data.
    Opt out with GRAFT_PUSH_SHUFFLE=0.
    """
    if _os.environ.get("GRAFT_PUSH_SHUFFLE", "1") == "0":
        return
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy
    except ImportError:  # pragma: no cover - ray always present in this env
        return
    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED


_configure_ray_data()

from .corpus import (  # noqa: E402
    corpus_sketch_pipeline,
    documents_sketch_pipeline,
    grouped_sketch_pipeline,
    merge_sketch_states,
    read_corpus,
    sketch_states,
)

__all__ = [
    "corpus_sketch_pipeline",
    "documents_sketch_pipeline",
    "grouped_sketch_pipeline",
    "merge_sketch_states",
    "read_corpus",
    "sketch_states",
]
