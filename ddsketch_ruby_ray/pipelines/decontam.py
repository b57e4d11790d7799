"""Benchmark decontamination: flag training docs sharing n-grams with an
eval/benchmark set.

The standard contamination check of a training-data pipeline (the GPT-3 /
PaLM appendix shape): a document is contaminated when any of its word
n-grams also occurs in the held-out benchmark corpus.  Two asymmetric sides:

  * benchmark side — SMALL by definition (eval sets are thousands of docs,
    not billions).  Its distinct shingle-hash set is collected once and
    broadcast via ``ray.put`` (the probe.py small-side pattern); at 100 TB
    this is the only correct plan — a shuffle join against 10^12 training
    grams for a megabyte of benchmark grams would be absurd.
  * training side — streamed: one ``map_batches`` pass computes each doc's
    distinct shingle hashes (shared ``_doc_shingle_hashes`` contract with
    the dedup pipelines) and a vectorized sorted-membership test
    (searchsorted) against the broadcast array.  Text never shuffles;
    nothing materializes.

Shingle identity is the splitmix64 fold of the shingle's per-token sha256
hashes (core/hashing.py::fold_windows, the shared ``_doc_shingle_hashes``
contract) — identical on both corpus and benchmark sides and in the SQL
oracle (functions/dedup_oracle.py::decontam_sql mirrors the same fold), so
the driver compare is bit-exact including any collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _doc_shingle_hashes

__all__ = ["decontaminate_pipeline"]


def decontaminate_pipeline(train_ds, bench_ds, *, key_col: str, text_col: str, ngram: int = 8):
    """-> Dataset[(key_col, n_grams, n_hits, contaminated)] over ``train_ds``.

    ``n_grams``: distinct word-``ngram`` shingles of the doc; ``n_hits``: how
    many of those occur anywhere in ``bench_ds``; ``contaminated``: 1 iff
    n_hits > 0.  Zero-token docs emit (0, 0, 0).
    """
    import ray

    def bench_hashes(batch: pa.Table) -> pa.Table:
        flat, _ = _doc_shingle_hashes(batch, text_col, ngram)
        return pa.table({"sh": pa.array(np.unique(flat))})

    bench_blocks = [
        ray.get(r)
        for r in bench_ds.map_batches(
            bench_hashes, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    bench_blocks = [t for t in bench_blocks if t.num_rows]
    bench_set = (
        np.unique(
            np.concatenate(
                [t.column("sh").to_numpy(zero_copy_only=False) for t in bench_blocks]
            ).astype(np.uint64)
        )
        if bench_blocks
        else np.empty(0, dtype=np.uint64)
    )
    bench_ref = ray.put(bench_set)

    def check(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        flat, bounds = _doc_shingle_hashes(batch, text_col, ngram)
        n_docs = batch.num_rows
        sizes = np.diff(bounds)
        if flat.size and bench.size:
            idx = np.searchsorted(bench, flat)
            idx_c = np.minimum(idx, bench.size - 1)
            hit = bench[idx_c] == flat
        else:
            hit = np.zeros(flat.size, dtype=bool)
        doc_idx = np.repeat(np.arange(n_docs), sizes)
        n_hits = np.bincount(doc_idx, weights=hit, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "n_grams": pa.array(sizes.astype(np.int64)),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array((n_hits > 0).astype(np.int64)),
            }
        )

    return train_ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
