"""End-to-end pipelines (flagship sketch pipeline, checkpointed runs)."""

from .corpus import (
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
