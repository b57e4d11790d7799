"""Derived metric columns over text/content (vectorized pyarrow.compute).

These are the metric-derivation stages of the flagship pipeline
(`BASELINE.json.north_star`): byte length and line counts of source-file
content, plus the per-row sha256 content invariant.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["derive_content_metrics", "add_sha256"]


def derive_content_metrics(
    table: pa.Table,
    content_col: str = "content",
    bytes_col: str = "content_bytes",
    lines_col: str = "n_lines",
) -> pa.Table:
    """Append ``content_bytes`` (utf-8 byte length) and ``n_lines`` columns.

    Zero-copy pyarrow kernels: ``binary_length`` counts bytes of the utf-8
    string, ``count_substring("\\n") + 1`` counts lines.
    """
    col = table.column(content_col)
    nbytes = pc.cast(pc.binary_length(col), pa.int64())
    nlines = pc.cast(pc.add(pc.count_substring(col, "\n"), 1), pa.int64())
    table = table.append_column(bytes_col, nbytes)
    return table.append_column(lines_col, nlines)


def add_sha256(table: pa.Table, content_col: str = "content", out_col: str = "sha256") -> pa.Table:
    """Append hex sha256 of each row's content (the per-row invariant column).

    Hashing is inherently per-row; the loop runs over the Arrow binary view
    (no utf-8 re-encode) at memory bandwidth, well above typical I/O rates.
    """
    col = pc.cast(table.column(content_col), pa.binary())
    sha = [hashlib.sha256(buf.as_py()).hexdigest() for buf in col]
    return table.append_column(out_col, pa.array(sha, type=pa.string()))


def add_sha64(table: pa.Table, content_col: str = "content", out_col: str = "sha64") -> pa.Table:
    """Append the first 60 bits of sha256(content) as a non-negative int64.

    The per-row content invariant in aggregable form: XOR-folding this column
    per group is order/partition-independent, so a distributed run can prove
    "every row's content hash matches the reference" against a DuckDB oracle
    (``bit_xor(('0x' || substr(sha256(col), 1, 15))::BIGINT)``) no matter how
    blocks were split or merged.  60 bits (15 hex chars) keeps the value
    positive in both int64 domains.
    """
    col = pc.cast(table.column(content_col), pa.binary())
    sigs = [int(hashlib.sha256(buf.as_py()).hexdigest()[:15], 16) for buf in col]
    return table.append_column(out_col, pa.array(sigs, type=pa.int64()))
