"""Build-then-probe pipelines: global sketch -> broadcast -> vectorized probe.

The canonical small-side-broadcast pattern (instead of a shuffle join): the
merged sketch is KB-MB sized regardless of input rows, so it is ``ray.put``
ONCE and read by every probe task from the local object store - never
re-shipped per batch, never a shuffle.

Used for Bloom membership (does key X appear in a 10^12-row corpus?) and
count-min frequency estimates at any probe fan-out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.aggregates import SketchStateMergeAgg
from .corpus import sketch_states

__all__ = ["build_sketch", "bloom_membership_pipeline", "cms_frequency_pipeline"]


def build_sketch(ds, spec, *, batch_size=None, concurrency=None):
    """rows -> ONE merged sketch (global aggregate; driver gets KBs, not rows)."""
    states = sketch_states(ds, [spec], (), batch_size=batch_size, concurrency=concurrency)
    out = states.aggregate(SketchStateMergeAgg(spec, emit_state=True))
    return spec.from_state(out[spec.name])


def _broadcast(obj):
    import ray

    return ray.put(obj)


def _group_reduce(
    ds,
    key_col: str,
    weight: str | None,
    num_partitions: int = 64,
    strategy: str = "native",
):
    """-> Dataset[(key_col, _exact)]: per-key count (weight=None) or sum.

    Two regimes, mirroring the states/rows/pairs strategy table
    (SURVEY.md §8.5), both measured at sf0.1/32 cpus:

    * ``"native"``: Ray ``groupby().count()/sum()``.  Its reduce iterates
      groups in Python (~250us/group) but its aggregate tree beats a sort
      shuffle at low cardinality (<~10^4 keys: 1500-key query 1.5-3 s
      native vs 4.7 s partition).
    * ``"partition"``: per-block np.unique+bincount pre-agg -> key-hash
      partition shuffle -> one more unique+bincount per partition.  ZERO
      per-group Python - the only viable regime at 10^5+ keys (20k-key
      query: 4 s vs native's ~5 s and growing linearly in key count).

    Keys must be non-null (int or string).  Float weight sums follow block
    order: bit-reproducibility (and oracle parity) needs integer-valued
    weights - the standing exact-sum convention of this repo's oracles.
    """
    if strategy == "native":
        if weight is None:
            per = ds.groupby(key_col).count()
            src = "count()"
        else:
            per = ds.groupby(key_col).sum(weight)
            src = f"sum({weight})"

        def rename(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    key_col: t.column(key_col),
                    "_exact": pc.cast(t.column(src), pa.float64()),
                }
            )

        return per.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    from ..core.hashing import hash256_str, hash64_int

    def _uniq_part(col: pa.Array, values: np.ndarray):
        if pa.types.is_integer(col.type):
            h = hash64_int(values.astype(np.int64))
        else:
            h = hash256_str(np.array(values, dtype=object), lanes=1)[0]
        return (h % np.uint64(num_partitions)).astype(np.int32)

    def preagg(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = col.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        if weight is None:
            sums = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
        else:
            w = t.column(weight).to_numpy(zero_copy_only=False).astype(np.float64)
            sums = np.bincount(inv, weights=w, minlength=len(uniq))
        return pa.table(
            {
                key_col: pa.array(uniq.tolist(), type=col.type),
                "_w": pa.array(sums, pa.float64()),
                "_part": pa.array(_uniq_part(col, uniq)),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        col = g.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = col.to_numpy(zero_copy_only=False)
        w = g.column("_w").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        sums = np.bincount(inv, weights=w, minlength=len(uniq))
        return pa.table(
            {
                key_col: pa.array(uniq.tolist(), type=col.type),
                "_exact": pa.array(sums, pa.float64()),
            }
        )

    return (
        ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(combine, batch_format="pyarrow")
    )


def bloom_membership_pipeline(build_ds, probe_ds, *, build_spec, probe_col: str, out_key: str, exact_strategy: str = "native"):
    """Build a Bloom filter over ``build_ds[build_spec.on]``; probe the
    DISTINCT values of ``probe_ds[probe_col]``.

    Returns a Dataset ``(out_key, maybe_member)`` - deterministic including
    false positives (oracle-verifiable, see family_oracle.bloom_membership_sql).
    """
    import ray

    filt = build_sketch(build_ds, build_spec)
    ref = _broadcast(filt)
    kind = build_spec.kind

    distinct = _group_reduce(probe_ds, probe_col, None, strategy=exact_strategy).drop_columns(["_exact"])

    def probe(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        col = batch.column(probe_col)
        if kind == "int":
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h1, h2 = f.hash_pair_ints(v)
        else:
            h1, h2 = f.hash_pair_strings(col)
        member = f.contains_hash_pairs(h1, h2)
        return pa.table({out_key: col, "maybe_member": pa.array(member)})

    return distinct.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def cms_frequency_pipeline(ds, *, spec, out_key: str, exact_strategy: str = "native"):
    """Build a count-min sketch over ``ds[spec.on]``; emit the estimate and
    the exact count for every distinct key.

    Exact counts come from the same pass's groupby (they're the probe list
    anyway); estimates come from the broadcast sketch - demonstrating the
    bounded-memory path that still works when exact per-key counting would
    not (10^9+ distinct keys).
    """
    import ray

    cms = build_sketch(ds, spec)
    ref = _broadcast(cms)
    kind = spec.kind
    key_col = spec.on
    weight = spec.weight

    per_key = _group_reduce(ds, key_col, weight, strategy=exact_strategy)
    exact_col = "_exact"

    def probe(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        col = batch.column(key_col)
        if kind == "int":
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h1, h2 = c.hash_pair_ints(v)
        else:
            h1, h2 = c.hash_pair_strings(col)
        est = c.estimate_hash_pairs(h1, h2)
        exact = batch.column(exact_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {out_key: col, "est": pa.array(est, pa.float64()), "exact": pa.array(exact, pa.float64())}
        )

    return per_key.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
