"""Input format adapters: one `read_table` front door for parquet/CSV/JSONL.

The reference is a value-stream library with no I/O surface at all; an
engine replacing it must ingest whatever the upstream drops.  Parquet is
the primary (columnar, predicate/column pushdown — `queries._read` uses it
everywhere); CSV and JSONL arrive from legacy exports and event hoses.
This module makes the text formats SCHEMA-FAITHFUL to the parquet tables:

  * Ray's readers already parallelize by file and stream blocks with
    backpressure — this wrapper adds nothing to the physical plan.
  * CSV/JSON type inference is normalized to an explicit target schema
    (int widths, float64, timestamp[us] parsed from ISO strings) with one
    zero-copy-where-possible `Table.cast` per block — so a pipeline sees
    IDENTICAL Arrow types whichever format fed it (the parity contract
    tests/test_sources.py pins).
  * column pruning: parquet prunes at the read; CSV/JSONL read then
    project per block (a text row is parsed whole regardless — pushdown
    is impossible in the format, which is exactly why the engine treats
    parquet as primary).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_table", "coerce_schema"]


def coerce_schema(ds, schema: pa.Schema):
    """Cast every block to ``schema`` (column order + types); string ->
    timestamp parses ISO-8601 (Arrow's cast), numeric widths narrow/widen
    exactly.  A missing column raises; extra columns are dropped."""

    def cast(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            c = t.column(f.name)  # KeyError -> loud failure, by design
            if pa.types.is_timestamp(f.type) and pa.types.is_string(c.type):
                c = c.cast(pa.timestamp("us"))
            cols.append(c.cast(f.type) if c.type != f.type else c)
        return pa.table(dict(zip(schema.names, cols)))

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def read_table(
    path: str,
    *,
    format: str | None = None,
    columns=None,
    schema: pa.Schema | None = None,
):
    """-> ray.data.Dataset from ``path`` (file or directory).  ``format``
    in {"parquet", "csv", "jsonl"}; inferred from the extension when None.
    ``columns`` prunes (at the read for parquet, per block otherwise);
    ``schema`` normalizes text-format types (see :func:`coerce_schema`)."""
    import ray.data as rd

    fmt = format
    if fmt is None:
        low = path.lower()
        if low.endswith((".parquet", ".pq")):
            fmt = "parquet"
        elif low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith((".jsonl", ".json", ".ndjson")):
            fmt = "jsonl"
        else:
            raise ValueError(f"cannot infer format from {path!r}; pass format=")

    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=list(columns) if columns else None)
        if schema is not None:
            ds = coerce_schema(ds, schema)
        return ds
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if schema is not None:
        ds = coerce_schema(
            ds,
            schema
            if columns is None
            else pa.schema([schema.field(c) for c in columns]),
        )
    elif columns is not None:
        cols = list(columns)
        ds = ds.map_batches(
            lambda t: t.select(cols), batch_format="pyarrow", zero_copy_batch=True
        )
    return ds
