"""Document chunking: split long texts into fixed-size overlapping windows.

The training-data step BEFORE sequence packing (pipelines/packing.py):
context-window-sized chunks with an overlap so no boundary content is lost.
A pure flat_map shape — each input row expands independently, no shuffle, no
state; output streams onward (resumable through state/sink.py like any
row-transform).

Vectorization: chunk texts are built with ONE byte-gather over the block's
flat Arrow string buffer (np.repeat/arange index construction + a single
fancy-index copy), then wrapped back into an Arrow string array via computed
offsets — no per-row Python, no per-chunk slicing loop.

Boundary contract: chunk positions are BYTE offsets.  On ASCII corpora (the
synthetic tables here — verified, and guarded below) bytes == characters, so
the SQL mirror's character `substring` is identical; multibyte content
raises rather than silently splitting a codepoint (a real deployment would
chunk on rune boundaries after a vectorized continuation-byte scan).

Chunk-count convention (mirrored by the oracle's generate_series): chunks
start at 0, step, 2*step, ... while start < len(text); empty docs emit no
chunks.  step = chunk_size - overlap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["chunk_documents_pipeline"]


def chunk_documents_pipeline(
    ds, *, key_col: str, text_col: str, chunk_size: int, overlap: int = 0
):
    """-> Dataset[(key_col, chunk_id, chunk, chunk_len)], one row per chunk.

    ``chunk_id`` is 0-based; every chunk is ``text[start : start+chunk_size]``
    with ``start = chunk_id * (chunk_size - overlap)``.
    """
    if not (0 <= overlap < chunk_size):
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap

    def expand(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.string())
        n = len(col)
        # honor a possible array offset (sliced/combined arrays share buffers)
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=col.offset + n + 1
        ).astype(np.int64)[col.offset :]
        data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
        lens = offs[1:] - offs[:-1]
        if bool((data[offs[0] : offs[-1]] >= 0x80).any()):
            raise NotImplementedError(
                "byte-offset chunking requires ASCII text; multibyte UTF-8 "
                "needs rune-boundary chunking (see module docstring)"
            )
        # chunks per doc: ceil(len/step), 0 for empty docs
        n_chunks = -(-lens // step)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    key_col: t.column(key_col).slice(0, 0),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "chunk_len": pa.array([], pa.int64()),
                }
            )
        row = np.repeat(np.arange(n), n_chunks)
        starts_in_row = (
            np.arange(total) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        )
        c_start = starts_in_row * step
        c_len = np.minimum(lens[row] - c_start, chunk_size)
        # one gather builds every chunk's bytes back-to-back
        out_offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(c_len, out=out_offs[1:])
        src_start = offs[row] + c_start
        gidx = np.repeat(src_start - out_offs[:-1], c_len) + np.arange(out_offs[-1])
        buf = data[gidx]
        chunk_arr = pa.StringArray.from_buffers(
            total,
            pa.py_buffer(out_offs.astype(np.int32).tobytes()),
            pa.py_buffer(buf.tobytes()),
        )
        return pa.table(
            {
                key_col: t.column(key_col).take(pa.array(row)),
                "chunk_id": pa.array(starts_in_row.astype(np.int64)),
                "chunk": chunk_arr,
                "chunk_len": pa.array(c_len.astype(np.int64)),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
