"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the 100 TB story):
  * exact: per-row 128-bit content hash in map_batches, then a groupby over
    (hash_hi, hash_lo) + min(doc_id) - the shuffle moves 24 bytes/row, never
    text.  (60-bit hashes collide at 10^12 rows; 128 bits do not.)
  * MinHash+LSH: per-row signatures in map_batches (vectorized reduceat over
    all shingles in a batch), then a groupby on (band, bucket) whose groups
    are tiny by construction; candidate pairs come out of map_groups.  The
    bucket id is a splitmix64 fold of the band's minhash slots (one uint64
    per row x band - no Python string building).
  * SimHash: one 64-bit signature per row, near-dup candidates via band
    equality - same groupby shape.
  * Jaccard verify: exact similarity computed INSIDE each (band, bucket)
    group - the shingle-HASH sets (8 bytes/shingle, never the text) ride the
    same shuffle as the bucket rows, so verification is distributed and
    nothing is ever materialized on the driver; cross-band duplicate pairs
    collapse in a final (a, b) groupby whose value is identical in every
    band by construction.

Every stage is deterministic (sha256 / splitmix64 hashing - see
core/hashing.py) and mirrored bit-for-bit in DuckDB SQL
(functions/dedup_oracle.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import hash64_int, hash256_str, splitmix64

__all__ = [
    "tokenize",
    "word_shingles",
    "exact_dedup_pipeline",
    "exact_dedup_rows_pipeline",
    "minhash_signatures",
    "lsh_candidate_pairs_pipeline",
    "jaccard_pairs_pipeline",
    "simhash_pipeline",
]

SPLIT_CHAR = " "  # literal split; mirrored by string_split(text, ' ') in SQL


def tokenize(text: str | None) -> list[str]:
    """Literal single-space split, empties dropped (= SQL string_split + filter).

    Null text tokenizes like the empty string (see hash256_str's null policy).
    """
    if not text:
        return []
    return [t for t in text.split(SPLIT_CHAR) if t]


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Distinct word n-grams joined by a single space."""
    toks = tokenize(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


# -- exact dedup -------------------------------------------------------------


def exact_dedup_pipeline(ds, *, key_col: str, text_col: str):
    """Keep the first (min key) row per exact text: -> Dataset[key_col].

    128-bit content identity (two sha256 lanes) so the shuffle never carries
    text and collisions are impossible at any realistic scale.
    """

    def hash_stage(batch: pa.Table) -> pa.Table:
        lanes = hash256_str(batch.column(text_col), lanes=2)
        return pa.table(
            {
                "h_hi": pa.array(lanes[0].astype(np.int64)),  # same bits, int64 domain
                "h_lo": pa.array(lanes[1].astype(np.int64)),
                key_col: batch.column(key_col),
            }
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    kept = hashed.groupby(["h_hi", "h_lo"]).min(key_col)
    return kept.map_batches(
        lambda t: pa.table({key_col: t.column(f"min({key_col})")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def exact_dedup_rows_pipeline(ds, *, key_col: str, text_col: str):
    """Full-row exact dedup: -> Dataset with one (min-key) row per distinct text.

    Rows are co-located by 128-bit content hash and each hash group keeps its
    min-key row - the standard one-shuffle dedup shape (content moves exactly
    once; at petabyte scale prefer exact_dedup_pipeline + a broadcast keep-set
    when the duplicate fraction is high and rows are wide).
    """

    def hash_stage(batch: pa.Table) -> pa.Table:
        lanes = hash256_str(batch.column(text_col), lanes=2)
        batch = batch.append_column("_h_hi", pa.array(lanes[0].astype(np.int64)))
        return batch.append_column("_h_lo", pa.array(lanes[1].astype(np.int64)))

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)

    def keep_min(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        winner = int(np.argmin(keys))
        return group.slice(winner, 1).drop_columns(["_h_hi", "_h_lo"])

    return hashed.groupby(["_h_hi", "_h_lo"]).map_groups(keep_min, batch_format="pyarrow")


# -- MinHash + LSH -----------------------------------------------------------


def _doc_shingle_hashes(batch: pa.Table, text_col: str, n: int):
    """Per batch: flat uint64 shingle-hash array + per-doc boundaries."""
    texts = batch.column(text_col).to_pylist()
    all_shingles: list[str] = []
    boundaries = [0]
    for t in texts:
        sh = word_shingles(t, n)
        all_shingles.extend(sh)
        boundaries.append(len(all_shingles))
    if all_shingles:
        flat = hash256_str(np.array(all_shingles, dtype=object), lanes=1)[0]
    else:
        flat = np.zeros(0, dtype=np.uint64)
    return flat, np.asarray(boundaries, dtype=np.int64)


def minhash_signatures(ds, *, key_col: str, text_col: str, num_hashes: int = 16, ngram: int = 3):
    """-> Dataset[(key_col, m0..m{K-1})]: MinHash signature per row.

    Vectorized: ONE sha256 pass over all shingles in the batch, then K
    seeded splitmix64 re-hashes + np.minimum.reduceat over doc boundaries.
    Empty docs get sentinel 2^63-1 in every slot.
    """
    sentinel = np.int64(2**63 - 1)

    def stage(batch: pa.Table) -> pa.Table:
        flat, bounds = _doc_shingle_hashes(batch, text_col, ngram)
        n_docs = len(bounds) - 1
        cols = {key_col: batch.column(key_col)}
        starts = bounds[:-1]
        # reduceat only over NON-EMPTY docs' starts: consecutive non-empty
        # starts delimit exact segments (empty docs have zero width), and a
        # trailing empty doc would otherwise need a start == flat.size, which
        # reduceat rejects — clamping it would truncate the previous doc's
        # segment (silently dropping its last shingle).
        valid = bounds[1:] > starts
        for i in range(num_hashes):
            mins = np.full(n_docs, sentinel, dtype=np.int64)
            if flat.size and valid.any():
                h = (hash64_int(flat.astype(np.int64), seed=i) >> np.uint64(1)).astype(np.int64)
                mins[valid] = np.minimum.reduceat(h, starts[valid])
            cols[f"m{i}"] = pa.array(mins)
        return pa.table(cols)

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def lsh_candidate_pairs_pipeline(
    ds,
    *,
    key_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
):
    """-> Dataset[(a, b)]: distinct key pairs sharing >= 1 LSH band bucket.

    Band bucket = the band's minhash values joined into one string (mirrored
    by concat_ws in SQL).  Groups are tiny by construction, so emitting
    pairs inside map_groups is bounded work.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        ds, key_col=key_col, text_col=text_col, num_hashes=num_hashes, ngram=ngram
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        out_band, out_bucket, out_key = [], [], []
        m = [batch.column(f"m{i}").to_numpy(zero_copy_only=False) for i in range(num_hashes)]
        for b in range(bands):
            parts = m[b * r : (b + 1) * r]
            bucket = ["-".join(str(int(p[j])) for p in parts) for j in range(batch.num_rows)]
            out_band.extend([b] * batch.num_rows)
            out_bucket.extend(bucket)
            out_key.extend(keys.to_pylist())
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.string()),
                key_col: pa.array(out_key),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_of_group(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(key_col).to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = buckets.groupby(["band", "bucket"]).map_groups(
        pairs_of_group, batch_format="pyarrow"
    )
    # distinct (a, b) across bands
    return (
        pairs.groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )


def jaccard_pairs_pipeline(
    ds,
    *,
    key_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
):
    """LSH candidates verified by exact shingle-set Jaccard; emits
    (a, b, jac1000) for pairs >= threshold (jac1000 = floor(jaccard*1000)).

    The candidate pair set and their shingle sets are tiny after LSH, so the
    shingle lookup is a broadcast, not a shuffle.
    """
    import ray

    pairs_tbl = (
        lsh_candidate_pairs_pipeline(
            ds,
            key_col=key_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            ngram=ngram,
        )
        .to_pandas()
    )
    needed = set(pairs_tbl["a"]) | set(pairs_tbl["b"])

    def collect_shingles(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        rows = [(k, word_shingles(t, ngram)) for k, t in zip(keys, texts) if k in needed]
        return pa.table(
            {
                key_col: pa.array([r[0] for r in rows], pa.int64()),
                "shingles": pa.array([r[1] for r in rows], pa.list_(pa.string())),
            }
        )

    sh_rows = ds.map_batches(collect_shingles, batch_format="pyarrow").take_all()
    sh = {r[key_col]: set(r["shingles"]) for r in sh_rows}

    a_out, b_out, j_out = [], [], []
    for _, row in pairs_tbl.iterrows():
        A, B = sh[row["a"]], sh[row["b"]]
        inter = len(A & B)
        union = len(A | B)
        jac = inter / union if union else 0.0
        if jac >= threshold:
            a_out.append(int(row["a"]))
            b_out.append(int(row["b"]))
            j_out.append(int(np.floor(jac * 1000)))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "jac1000": pa.array(j_out, pa.int64()),
        }
    )


# -- SimHash -----------------------------------------------------------------


def simhash_pipeline(ds, *, key_col: str, text_col: str):
    """-> Dataset[(key, simhash_hi, simhash_lo)]: 64-bit SimHash per row.

    Bit b is set iff the (multiset) token votes sum positive:
    sum over tokens of (bit_b(sha256(token)) ? +1 : -1) > 0.  Emitted as two
    int32-range halves (SQL BIGINT-friendly).
    """

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        all_toks: list[str] = []
        bounds = [0]
        for t in texts:
            toks = tokenize(t)
            all_toks.extend(toks)
            bounds.append(len(all_toks))
        sums = np.zeros((len(texts), 64), dtype=np.int64)
        starts = np.asarray(bounds[:-1])
        valid = np.asarray(bounds[1:]) > starts  # non-empty docs only (see minhash note)
        if all_toks and valid.any():
            h = hash256_str(np.array(all_toks, dtype=object), lanes=1)[0]
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits * 2 - 1  # (n_tokens, 64) in {-1, +1}
            sums[valid] = np.add.reduceat(votes, starts[valid], axis=0)
        simhash = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {
                key_col: batch.column(key_col),
                "simhash_hi": pa.array((simhash >> np.uint64(32)).astype(np.int64)),
                "simhash_lo": pa.array((simhash & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
