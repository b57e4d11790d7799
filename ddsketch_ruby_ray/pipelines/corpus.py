"""Flagship pipeline: per-group quantile sketches over a source-file corpus.

Shape (north_star): read -> map_batches(derive metric columns, zero-copy
Arrow) -> groupby(lang[,repo]).aggregate(DDSketchAgg...) -> finalize per group.

Ray Data's sort-aggregate partially aggregates map-side (one sketch per group
per block), so the only data crossing the shuffle is KB-sized sketch states -
never rows, never content.  Hot-key skew (Zipf langs) therefore costs
O(num_blocks) small states for the hot key, not O(rows).
"""

from __future__ import annotations

from ..functions.aggregates import DDSketchAgg
from ..stages import derive_content_metrics, unnest

__all__ = ["corpus_sketch_pipeline", "documents_sketch_pipeline"]


def corpus_sketch_pipeline(
    ds,
    *,
    group_keys=("lang",),
    alpha: float = 0.01,
    quantiles=(0.5, 0.9, 0.99),
    content_col: str = "content",
):
    """content corpus -> per-group sketch summary of byte length + line count.

    Returns a Dataset with columns: group keys + ``bytes_*`` / ``lines_*``
    (count/sum/min/max/avg + requested quantiles).
    """
    needed = list(group_keys) + [content_col]
    ds = ds.select_columns(needed)
    ds = ds.map_batches(
        lambda t: derive_content_metrics(t, content_col=content_col).drop_columns([content_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ds.groupby(list(group_keys)).aggregate(
        DDSketchAgg(on="content_bytes", relative_accuracy=alpha, quantiles=quantiles, name="bytes"),
        DDSketchAgg(on="n_lines", relative_accuracy=alpha, quantiles=quantiles, name="lines"),
    )
    out = unnest(out, columns=["bytes"], prefix="bytes_")
    return unnest(out, columns=["lines"], prefix="lines_")


def documents_sketch_pipeline(sf_dir: str, *, alpha: float = 0.01, quantiles=(0.5, 0.9, 0.99)):
    """Same pipeline over the driver testdata ``documents`` table (text docs)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return corpus_sketch_pipeline(ds, group_keys=("lang",), alpha=alpha, quantiles=quantiles, content_col="text")
