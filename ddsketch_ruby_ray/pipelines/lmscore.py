"""Bigram language-model-proxy quality scoring.

The classic cheap LM-quality signal for corpus curation: documents whose
bigrams are frequent in the corpus read like the corpus; gibberish and
boilerplate-free noise score near zero.  Two phases, both scale-shaped:

  1. GLOBAL top-K bigram table: vectorized bigram explosion per block
     (Arrow split + numpy boundary mask - no per-doc Python), per-block
     np.unique pre-agg, one (bigram, n) groupby-sum shuffle, global
     sort+limit K.  K rows (KBs) come back to the driver and are
     ``ray.put`` ONCE - the standard small-side broadcast.
  2. SCORE pass: every batch recomputes its bigrams the same way and looks
     them up with ONE np.searchsorted against the broadcast sorted table;
     per-doc sums via bincount.

Determinism / oracle parity: the per-bigram weight is
``floor(log2(1 + n) * 1000)`` - an INTEGER, so per-doc sums are exact in
any order; numpy's log2 equals DuckDB's bit-for-bit on this platform
(verified; see NOTES_ROUND1 finding 7).  Top-K ties break (n DESC,
bigram ASC) on both sides; numpy '<U' comparison = UTF-8 byte order =
DuckDB's binary collation.

Output per document: (id, n_bigrams, score_milli) - both exact int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["bigram_lm_score_pipeline"]


def _batch_bigrams(batch: pa.Table, text_col: str):
    """-> (bigram '<U' array, doc index per bigram, bigram count per doc)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch.column(text_col), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ndocs = len(lens)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    keep = flat != ""
    flat, doc_of = flat[keep], doc_of[keep]
    if flat.size < 2:
        return (
            np.zeros(0, dtype="U1"),
            np.zeros(0, dtype=np.int64),
            np.zeros(ndocs, dtype=np.int64),
        )
    same = doc_of[:-1] == doc_of[1:]
    fu = flat.astype(str)
    bigrams = np.char.add(np.char.add(fu[:-1], " "), fu[1:])[same]
    bdoc = doc_of[:-1][same]
    return bigrams, bdoc, np.bincount(bdoc, minlength=ndocs)


def bigram_lm_score_pipeline(ds, *, id_col: str, text_col: str, top_k: int = 1000):
    """-> Dataset[(id_col, n_bigrams, score_milli)]."""
    import ray
    import ray.data as rd  # noqa: F401  (documents the Dataset dependency)

    def explode(t: pa.Table) -> pa.Table:
        bigrams, _, _ = _batch_bigrams(t, text_col)
        uniq, counts = np.unique(bigrams, return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(uniq.tolist(), pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    # bigram domain is open-ended (Zipf tail ~ corpus size): the native
    # sort-based groupby collapses past ~1M groups, so fold through the
    # bounded-partition plan (pipelines/fold.py)
    from ddsketch_ruby_ray.pipelines.fold import partitioned_group_sum

    counted = partitioned_group_sum(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        "bigram",
        "n",
    )
    top = (
        counted.map_batches(
            lambda t: pa.table({"bigram": t.column("bigram"), "n": t.column("sum(n)")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["n", "bigram"], descending=[True, False])
        .limit(top_k)
        .take_all()  # K rows - KBs, the broadcast small side
    )
    tb = np.array([r["bigram"] for r in top], dtype=str)
    tn = np.array([r["n"] for r in top], dtype=np.float64)
    w = np.floor(np.log2(1.0 + tn) * 1000.0).astype(np.int64)
    order = np.argsort(tb)
    ref = ray.put((tb[order], w[order]))

    def score(t: pa.Table) -> pa.Table:
        sorted_b, sorted_w = ray.get(ref)
        bigrams, bdoc, per_doc = _batch_bigrams(t, text_col)
        ndocs = t.num_rows
        if bigrams.size and sorted_b.size:
            idx = np.searchsorted(sorted_b, bigrams)
            idx_c = np.clip(idx, 0, sorted_b.size - 1)
            hit = sorted_b[idx_c] == bigrams
            wts = np.where(hit, sorted_w[idx_c], 0)
            sums = np.bincount(bdoc, weights=wts, minlength=ndocs)
        else:
            sums = np.zeros(ndocs)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_bigrams": pa.array(per_doc[:ndocs].astype(np.int64)),
                "score_milli": pa.array(sums[:ndocs].astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
