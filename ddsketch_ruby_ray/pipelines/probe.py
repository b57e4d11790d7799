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


def bloom_membership_pipeline(build_ds, probe_ds, *, build_spec, probe_col: str, out_key: str):
    """Build a Bloom filter over ``build_ds[build_spec.on]``; probe the
    DISTINCT values of ``probe_ds[probe_col]``.

    Returns a Dataset ``(out_key, maybe_member)`` - deterministic including
    false positives (oracle-verifiable, see family_oracle.bloom_membership_sql).
    """
    import ray

    filt = build_sketch(build_ds, build_spec)
    ref = _broadcast(filt)
    kind = build_spec.kind

    distinct = probe_ds.groupby(probe_col).count().drop_columns(["count()"])

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


def cms_frequency_pipeline(ds, *, spec, out_key: str):
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

    if weight is None:
        per_key = ds.groupby(key_col).count()
        exact_col = "count()"
    else:
        per_key = ds.groupby(key_col).sum(weight)
        exact_col = f"sum({weight})"

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
