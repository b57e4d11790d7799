"""Per-batch transform stages (vectorized, Arrow-first)."""

from .derive import add_sha256, derive_content_metrics
from .util import unnest, unnest_struct

__all__ = ["derive_content_metrics", "add_sha256", "unnest", "unnest_struct"]
