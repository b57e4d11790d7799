"""Positional duplicate-span detection (substring-level dedup).

The Lee et al. ("Deduplicating Training Data Makes Language Models Better",
ACL 2022) shape: instead of doc-level identity, find the exact TOKEN SPANS
that occur more than once anywhere in the corpus (boilerplate headers,
licenses, templated paragraphs), so curation can cut the span and keep the
document.

Semantics: every POSITIONAL n-token window (doc, p) - including repeats
within one document - is duplicated iff its exact token string occurs at
least twice in the corpus; a document's duplicated windows merge into
maximal spans (windows whose token ranges overlap or touch join the same
span).  Output one row per span: (key, span_start, span_end), 1-based token
positions inclusive, matching the SQL mirror's generate_subscripts
convention.  Docs shorter than n tokens contribute no windows.

Scale shape: one row per token position leaves the map stage (the
algorithm's true cost - the suffix-array formulation has the same input
volume), as 20-byte (window-hash, doc, pos) postings.  Shuffle 1 co-locates
each window hash: the duplicate test is a local run-length >= 2, and only
duplicated instances survive.  Shuffle 2 co-locates each doc's surviving
positions: span merging is one sorted boundary scan.  No per-window or
per-doc Python in either reduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import fold_windows, hash64_int
from .dedup import _doc_token_hashes, _window_geometry

__all__ = [
    "duplicate_spans_pipeline",
    "duplicate_spans_stages",
    "resumable_duplicate_spans_job",
]


def _doc_window_hashes(batch: pa.Table, text_col: str, n: int):
    """Flat positional window-hash array + per-doc boundaries (no dedup).

    Window fingerprint = splitmix64 fold of the window's per-token sha256
    hashes (vectorized; see fold_windows) — no per-window string build, no
    per-window sha256.  Docs shorter than n tokens contribute no windows.
    """
    tokh, bounds = _doc_token_hashes(batch, text_col)
    starts, _, n_win = _window_geometry(bounds, n, short_docs=False)
    flat = fold_windows(tokh, starts, n)
    return flat, np.concatenate([[0], np.cumsum(n_win)]).astype(np.int64)


def duplicate_spans_pipeline(
    ds,
    *,
    key_col: str,
    text_col: str,
    n: int = 8,
    num_partitions: int = 64,
):
    """-> Dataset[(key_col, span_start, span_end)] - maximal duplicated token
    spans, 1-based inclusive positions."""
    postings, reduce = duplicate_spans_stages(
        key_col=key_col, text_col=text_col, n=n, num_partitions=num_partitions
    )
    return reduce(ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True))


def duplicate_spans_stages(
    *,
    key_col: str,
    text_col: str,
    n: int = 8,
    num_partitions: int = 64,
):
    """The pipeline split at its stage boundary: ``(postings, reduce)``.

    ``postings`` is the per-shard-pure map (checkpointable through
    state/staged.py); ``reduce`` takes the posted Dataset through both keyed
    shuffles to spans.  ``duplicate_spans_pipeline`` is their composition."""

    def postings(batch: pa.Table) -> pa.Table:
        flat, bounds = _doc_window_hashes(batch, text_col, n)
        counts = np.diff(bounds)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # 1-based window start position within each doc
        pos = np.arange(flat.size, dtype=np.int64) - np.repeat(bounds[:-1], counts) + 1
        part = (flat % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part),
                "h": pa.array(flat.astype(np.int64)),
                "key": pa.array(np.repeat(keys, counts)),
                "p": pa.array(pos),
            }
        )

    empty_dup = pa.table(
        {"key": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
    )

    def dup_reduce(pt: pa.Table) -> pa.Table:
        h = pt.column("h").to_numpy(zero_copy_only=False)
        if not h.size:
            return empty_dup
        key = pt.column("key").to_numpy(zero_copy_only=False)
        p = pt.column("p").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        new = np.empty(h_s.size, dtype=bool)
        new[0] = True
        new[1:] = h_s[1:] != h_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, h_s.size))
        keep = np.repeat(lens, lens) >= 2  # window occurs >= 2 times anywhere
        kept = order[keep]
        return pa.table({"key": pa.array(key[kept]), "p": pa.array(p[kept])})

    def key_part(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        part = (hash64_int(k, 3) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    empty_spans = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64()),
        }
    )

    def spans(pt: pa.Table) -> pa.Table:
        k = pt.column("key").to_numpy(zero_copy_only=False)
        if not k.size:
            return empty_spans
        p = pt.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, k))
        k_s, p_s = k[order], p[order]
        # a window extends the current span iff its range [p, p+n-1] overlaps
        # or touches the span end: p <= prev_end + 1 <=> p - prev_p <= n
        new = np.empty(k_s.size, dtype=bool)
        new[0] = True
        new[1:] = (k_s[1:] != k_s[:-1]) | (p_s[1:] - p_s[:-1] > n)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], k_s.size) - 1
        return pa.table(
            {
                key_col: pa.array(k_s[starts]),
                "span_start": pa.array(p_s[starts]),
                "span_end": pa.array(p_s[ends] + n - 1),
            }
        )

    def reduce(posted):
        dups = posted.groupby("_part").map_groups(dup_reduce, batch_format="pyarrow")
        return (
            dups.map_batches(key_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_part")
            .map_groups(spans, batch_format="pyarrow")
        )

    return postings, reduce


def resumable_duplicate_spans_job(
    input_files,
    workdir: str,
    *,
    prepare,
    key_col: str,
    text_col: str,
    n: int = 8,
    num_partitions: int = 64,
    read_columns=None,
    max_shards: int | None = None,
):
    """Checkpointed duplicate-span job over parquet shards (state/staged.py).

    Phase A (per shard, exactly-once): ``prepare(shard_ds)`` derives
    (key_col, text_col), then the postings map tokenizes + window-hashes —
    the dominant cost of the longest wall in BASELINE.md.  Phase B reruns
    only the two keyed shuffles on a crash.  ``prepare`` must be per-shard
    pure (stateless derivation, e.g. doc id from path hash)."""
    from ..state.staged import staged_shuffle_job

    postings, reduce = duplicate_spans_stages(
        key_col=key_col, text_col=text_col, n=n, num_partitions=num_partitions
    )

    def phase_a(ds):
        return prepare(ds).map_batches(
            postings, batch_format="pyarrow", zero_copy_batch=True
        )

    return staged_shuffle_job(
        input_files,
        workdir,
        phase_a=phase_a,
        phase_b=reduce,
        read_columns=read_columns,
        max_shards=max_shards,
    )
