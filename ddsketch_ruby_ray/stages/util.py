"""Small Arrow batch utilities."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["unnest_struct", "unnest"]


def unnest_struct(table: pa.Table, columns=None, prefix: str | None = None) -> pa.Table:
    """Flatten struct columns into top-level columns.

    Aggregate finalizers emit one struct column per aggregation; this lifts the
    struct fields to flat columns (field names become column names, optionally
    ``{prefix}{field}``), which is what the SQL-oracle comparison and Parquet
    sinks want.
    """
    arrays, names = [], []
    for i, field in enumerate(table.schema):
        col = table.column(i)
        if pa.types.is_struct(field.type) and (columns is None or field.name in columns):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for j, sub in enumerate(field.type):
                names.append(f"{prefix}{sub.name}" if prefix else sub.name)
                arrays.append(col.field(j))
        else:
            names.append(field.name)
            arrays.append(col)
    return pa.Table.from_arrays(arrays, names=names)


def unnest(ds, columns=None, prefix: str | None = None):
    """Dataset-level :func:`unnest_struct` (lazy map_batches, zero-copy)."""
    return ds.map_batches(
        lambda t: unnest_struct(t, columns, prefix),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
