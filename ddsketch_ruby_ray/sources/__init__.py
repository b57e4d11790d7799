"""Input sources: parquet readers and the deterministic synthetic corpus."""

from .corpus import corpus_dataset, synthesize_corpus_batch, write_corpus

__all__ = ["corpus_dataset", "synthesize_corpus_batch", "write_corpus"]
