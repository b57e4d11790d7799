"""End-to-end pipelines (flagship sketch pipeline, checkpointed runs)."""

from .corpus import corpus_sketch_pipeline, documents_sketch_pipeline

__all__ = ["corpus_sketch_pipeline", "documents_sketch_pipeline"]
