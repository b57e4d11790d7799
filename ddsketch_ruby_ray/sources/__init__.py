"""Input sources: format adapters (parquet/CSV/JSONL) and the
deterministic synthetic corpus."""

from .corpus import corpus_dataset, synthesize_corpus_batch, write_corpus
from .formats import coerce_schema, read_table

__all__ = [
    "coerce_schema",
    "corpus_dataset",
    "read_table",
    "synthesize_corpus_batch",
    "write_corpus",
]
