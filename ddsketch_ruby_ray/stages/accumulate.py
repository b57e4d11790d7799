"""Actor-pool accumulate stage: raw rows -> per-(batch, group) sketch states.

This is stage 1 of the two-level merge (`SURVEY.md §4.2`): each map task turns
its Arrow batch into at most ``num_groups`` KB-sized state rows, so the
downstream ``groupby(keys)`` shuffle moves sketch STATES, never raw rows.  A
hot key (Zipf ``lang``) therefore costs O(num_batches) small states instead of
O(rows) - the skew answer mandated by the north_rule.

Usage::

    specs = [DDSketchSpec(on="content_bytes", name="bytes"), ...]
    acc = SketchStateAccumulator(specs, group_keys=("lang",), derive=fn)
    states = ds.map_batches(acc, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=..., concurrency=...)
    merged = merge_sketch_states(states, group_keys, specs)   # tiny shuffle

The accumulator is a callable CLASS so ``map_batches(..., concurrency=N)``
runs it as an actor pool: spec construction (mapping constants etc.) happens
once per actor in ``__init__``, per input_hint ("actor pools for stateful
stages").
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa

from ..functions.specs import SketchSpec

__all__ = ["SketchStateAccumulator", "StateBlockMerger", "group_codes", "coalesce_states"]


def group_codes(batch: pa.Table, group_keys: Sequence[str]):
    """Encode the group key column(s) into dense int codes per row.

    Returns ``(codes: int64[n_rows], first_row_index: int64[n_groups])`` where
    ``first_row_index[g]`` points at a representative row of group ``g``.
    Dictionary-encoding each key column keeps this vectorized (no Python rows).
    """
    import pyarrow.compute as pc

    combined = None
    for k in group_keys:
        col = batch.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dict_arr = col.dictionary_encode()
        # null keys form their own group (matching Dataset.groupby semantics):
        # give them the code past the dictionary end
        indices = pc.fill_null(dict_arr.indices, len(dict_arr.dictionary))
        codes = indices.to_numpy(zero_copy_only=False).astype(np.int64)
        card = len(dict_arr.dictionary) + 2
        combined = codes if combined is None else combined * card + codes
    uniq, first, inverse = np.unique(combined, return_index=True, return_inverse=True)
    return inverse, first


class SketchStateAccumulator:
    """map_batches callable: one Arrow batch -> one state row per group.

    Args:
        specs: sketches to maintain (one output struct column per spec).
        group_keys: group-by columns carried through to the output.
        derive: optional ``pa.Table -> pa.Table`` run first (fuses metric
            derivation into the same pass over the batch).
    """

    def __init__(
        self,
        specs: Sequence[SketchSpec],
        group_keys: Sequence[str] = (),
        derive: Callable[[pa.Table], pa.Table] | None = None,
    ):
        self.specs = list(specs)
        self.group_keys = tuple(group_keys)
        self.derive = derive
        self._value_cols = sorted({c for s in self.specs for c in s.columns})

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.derive is not None:
            batch = self.derive(batch)
        n = batch.num_rows
        # Native dtypes preserved: int64 columns (e.g. 60-bit content hashes)
        # must NOT round-trip through float64.  Specs cast as they need.
        arrays = {
            c: batch.column(c).to_numpy(zero_copy_only=False) for c in self._value_cols
        }

        if self.group_keys:
            inverse, first = self.group_codes(batch)
            order = np.argsort(inverse, kind="stable")
            sorted_inv = inverse[order]
            # boundaries[i]:boundaries[i+1] slices group i's rows in `order`
            boundaries = np.searchsorted(sorted_inv, np.arange(len(first) + 1))
            group_rows = [order[boundaries[g] : boundaries[g + 1]] for g in range(len(first))]
        else:
            first = np.zeros(1, dtype=np.int64) if n else np.zeros(0, dtype=np.int64)
            group_rows = [np.arange(n)] if n else []

        out_cols: dict[str, object] = {}
        for k in self.group_keys:
            out_cols[k] = batch.column(k).take(pa.array(first))

        for spec in self.specs:
            states = []
            for rows in group_rows:
                sk = spec.zero()
                spec.accumulate(sk, {c: arrays[c][rows] for c in spec.columns})
                states.append(spec.to_state(sk))
            out_cols[spec.name] = pa.array(states, type=spec.state_type())

        names = list(self.group_keys) + [s.name for s in self.specs]
        return pa.Table.from_arrays([out_cols[c] for c in names], names=names)

    def group_codes(self, batch: pa.Table):
        return group_codes(batch, self.group_keys)


def coalesce_states(states, target_blocks: int = 8, specs=None, group_keys=()):
    """Coalesce the (tiny) state table into few blocks before the groupby.

    The sort-shuffle behind ``groupby().aggregate()`` launches one map task
    per input block and one reduce task per output partition; with hundreds of
    KB-sized state blocks that is O(blocks^2) object-store traffic for no
    work.  States are orders of magnitude smaller than the input, so a cheap
    repartition first makes the wide step negligible at any scale.

    With ``specs`` the coalesced blocks are also LOCALLY pre-merged
    (:class:`StateBlockMerger`), so the downstream aggregate sorts/encodes
    O(target_blocks x groups) state rows instead of one per reader batch.
    """
    out = states.repartition(target_blocks)
    if specs is not None:
        out = out.map_batches(
            StateBlockMerger(specs, group_keys),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    return out


class StateBlockMerger:
    """map_batches callable: merge state rows per group WITHIN one block.

    The local combiner between the accumulate stage and the global state
    shuffle.  Fused read tasks emit one state row per (parquet row-group,
    group) — a 125k-row file with 8k-row row-groups yields 16x more state
    rows than blocks.  Merging them down to one row per group per coalesced
    block keeps the groupby aggregate's sort/encode work at
    O(target_blocks x groups) regardless of reader batching.  Merge
    associativity (base_sketch.rb:146-171 semantics) makes the result
    bit-identical with or without this stage.
    """

    def __init__(self, specs: Sequence[SketchSpec], group_keys: Sequence[str] = ()):
        self.specs = list(specs)
        self.group_keys = tuple(group_keys)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if self.group_keys and n:
            inverse, first = group_codes(t, self.group_keys)
            order = np.argsort(inverse, kind="stable")
            sorted_inv = inverse[order]
            boundaries = np.searchsorted(sorted_inv, np.arange(len(first) + 1))
            group_rows = [order[boundaries[g] : boundaries[g + 1]] for g in range(len(first))]
        else:
            first = np.zeros(1 if n else 0, dtype=np.int64)
            group_rows = [np.arange(n)] if n else []

        out_cols: dict[str, object] = {}
        for k in self.group_keys:
            out_cols[k] = t.column(k).take(pa.array(first))
        for spec in self.specs:
            col = t.column(spec.name).to_pylist()
            merged = []
            for rows in group_rows:
                acc = None
                for i in rows:
                    st = col[i]
                    if st is None:
                        continue
                    sk = spec.from_state(st)
                    acc = sk if acc is None else spec.merge(acc, sk)
                merged.append(None if acc is None else spec.to_state(acc))
            out_cols[spec.name] = pa.array(merged, type=spec.state_type())
        names = list(self.group_keys) + [s.name for s in self.specs]
        return pa.Table.from_arrays([out_cols[c] for c in names], names=names)
