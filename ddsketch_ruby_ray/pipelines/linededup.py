"""Corpus-wide duplicated-line removal (CCNet / RefinedWeb boilerplate pass).

Web-scale curation removes LINES that repeat across many documents (nav bars,
cookie banners, license footers): a line whose exact bytes occur >=
``min_count`` times anywhere in the corpus is boilerplate and is dropped from
every document (Wenzek et al. 2020 CCNet §3.1; Penedo et al. 2023 RefinedWeb
§4.2).  Two streaming passes:

- Pass 1 (count): split each doc into lines, 64-bit sha lane per line,
  block-local ``np.unique`` pre-agg -> tiny ``groupby(lh).sum`` shuffle of
  (hash, count) pairs -> the >= min_count survivors.  The duplicated-line set
  is small by nature (boilerplate is the point: few distinct lines, many
  occurrences), so it is materialized and broadcast once via ``ray.put`` —
  the same broadcast-membership shape as ``decontam.py``.
- Pass 2 (filter): stream the docs again; one ``searchsorted`` membership
  test per batch marks boilerplate lines; per doc we emit ``n_lines``,
  ``n_kept`` and ``kept_sig`` — the XOR fold of the 60-bit sha256 of
  ``"<ord>|<line>"`` over KEPT lines, pinning the exact kept (position,
  bytes) multiset without shipping text (same convention as
  ``stages/text.py:line_filter_stats``).

Line identity is the 64-bit sha lane on BOTH sides — the SQL mirror groups
by the same ``sha_lane_sql`` expression — so a hash collision produces the
identical answer in engine and oracle (the decontam parity rule from round
2's ADVICE).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _split_lines(col: pa.ChunkedArray | pa.Array):
    """Split a string column on ``\\n`` -> (flat lines, parent doc index,
    1-based ordinal, per-doc line count).  All-Arrow kernels."""
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    lines = pc.split_pattern(col, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    starts = np.cumsum(n_lines) - n_lines
    ord1 = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, n_lines) + 1
    return flat, parent, ord1, n_lines


def line_dedup_pipeline(ds, *, key_col: str, text_col: str, min_count: int = 3):
    """-> Dataset[(key_col, n_lines, n_kept, kept_sig)] with corpus-wide
    duplicated lines (global occurrence count >= ``min_count``) removed.

    ``ds`` is consumed twice (count pass + filter pass); pass an already
    line-broken dataset (the driver query rewrites the single-line synthetic
    docs first, mirrored verbatim in its oracle CTE).
    """
    import ray

    from ..core.hashing import hash256_str

    def count_lines(batch: pa.Table) -> pa.Table:
        flat, _, _, _ = _split_lines(batch.column(text_col))
        # int64 reinterpretation of the uint64 sha lane: equality-preserving,
        # and keeps the (hash, count) shuffle Arrow-native (a raw uint64 >
        # 2^63-1 makes Ray's sort-aggregate fall back to pickled objects).
        h = hash256_str(flat, lanes=1)[0].astype(np.int64)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"lh": pa.array(u), "c": pa.array(c.astype(np.int64))})

    counts = (
        ds.map_batches(count_lines, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lh")
        .sum("c")
    )

    def heavy_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("sum(c)"), min_count)).select(["lh"])

    heavy_tbls = counts.map_batches(heavy_only, batch_format="pyarrow").take_all()
    # The boilerplate set is tiny relative to the corpus (distinct lines that
    # repeat >= min_count times); at 100 TB this is the same small-side
    # broadcast as decontam's benchmark set.  KB-MB scale, never raw rows.
    heavy = np.sort(
        np.asarray([r["lh"] for r in heavy_tbls], dtype=np.int64)
        if heavy_tbls
        else np.empty(0, dtype=np.int64)
    )
    heavy_ref = ray.put(heavy)

    def scrub(batch: pa.Table) -> pa.Table:
        boiler = ray.get(heavy_ref)
        n_docs = batch.num_rows
        flat, parent, ord1, n_lines = _split_lines(batch.column(text_col))
        h = hash256_str(flat, lanes=1)[0].astype(np.int64)
        if h.size and boiler.size:
            idx = np.minimum(np.searchsorted(boiler, h), boiler.size - 1)
            keep = boiler[idx] != h
        else:
            keep = np.ones(h.size, dtype=bool)

        n_kept = np.bincount(parent[keep], minlength=n_docs).astype(np.int64)
        kept_sig = np.zeros(n_docs, dtype=np.int64)
        kp = parent[keep]
        if kp.size:
            ord_str = pc.cast(pa.array(ord1[keep]), pa.string())
            salted = pc.binary_join_element_wise(
                ord_str, pc.take(flat, pa.array(np.flatnonzero(keep))), "|"
            )
            hs = (hash256_str(salted, lanes=1)[0] >> np.uint64(4)).astype(np.int64)
            seg = np.flatnonzero(np.r_[True, kp[1:] != kp[:-1]])
            kept_sig[kp[seg]] = np.bitwise_xor.reduceat(hs, seg)

        return pa.table(
            {
                key_col: batch.column(key_col),
                "n_lines": pa.array(n_lines),
                "n_kept": pa.array(n_kept),
                "kept_sig": pa.array(kept_sig),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
