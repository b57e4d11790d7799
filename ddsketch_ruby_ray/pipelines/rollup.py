"""GROUP BY ROLLUP over the sketch mergeability hierarchy.

The defining property of the reference sketch (base_sketch.rb:140-171: merge
is associative/commutative and lossless w.r.t. the bucket histogram) means a
multi-level rollup - per (k1, k2), per (k1), grand total - needs to read the
corpus exactly ONCE: the finest level's merged states are themselves the
input to every coarser level.  At 100 TB that turns "3 aggregation passes
over the data" into "1 pass + 2 shuffles of a KB-per-group state table".

Bit-exactness of the cascade: bin counts are float64 adds of integer weights
(exact, associative), count/min/max are exact, and sum is exact whenever the
metric is integer-valued (the same contract as ``include_sum_avg`` on the SQL
oracle) - so merging (k1,k2)-level states up to k1 is bit-identical to
building the k1 sketch from raw rows, and the UNION-ALL-of-GROUP-BYs SQL
mirror hash-matches every level.

Output: one composite ``group_key`` string column (rolled-up keys filled with
``fill``) + the spec's finalize columns, matching the single-group-column SQL
oracle template like flagship_by_lang_source does.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

__all__ = ["rollup_sketch_pipeline", "cube_sketch_pipeline", "ROLLUP_FILL"]

ROLLUP_FILL = "(all)"


def rollup_sketch_pipeline(
    ds,
    spec,
    keys: Sequence[str],
    *,
    derive=None,
    fill: str = ROLLUP_FILL,
):
    """-> Dataset[(group_key, <finalize cols>)] with one row per rollup group
    across all len(keys)+1 levels: (k1..kn), (k1..kn-1), ..., ().

    ``keys`` must be string columns (composite key join); the grand-total row
    has ``group_key == fill * n`` joined with '|'.
    """
    import ray.data as rd

    from ..functions.aggregates import SketchStateMergeAgg
    from ..stages.util import unnest_struct
    from .corpus import sketch_states

    keys = list(keys)

    def finalize_level(states, present: list[str]):
        """State rows -> (group_key, finalize...) rows; absent keys filled."""

        def fin(t: pa.Table) -> pa.Table:
            structs = [spec.finalize(spec.from_state(st)) for st in t.column(spec.name).to_pylist()]
            parts = []
            for k in keys:
                if k in present:
                    col = t.column(k).to_pylist()
                    parts.append([v if v is not None else "" for v in col])
                else:
                    parts.append([fill] * t.num_rows)
            gk = pa.array(["|".join(p) for p in zip(*parts)] if t.num_rows else [], pa.string())
            out = pa.table({"group_key": gk, spec.name: pa.array(structs)})
            return unnest_struct(out, columns=[spec.name])

        return states.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)

    # one corpus read: finest-level per-(block, group) states
    states = sketch_states(ds, [spec], keys, derive=derive)
    cur = (
        states.groupby(keys)
        .aggregate(SketchStateMergeAgg(spec, emit_state=True))
        .materialize()  # tiny: one KB state row per finest group
    )
    outs = [finalize_level(cur, keys)]
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        if sub:
            cur = (
                cur.groupby(sub)
                .aggregate(SketchStateMergeAgg(spec, emit_state=True))
                .materialize()
            )
            outs.append(finalize_level(cur, sub))
        else:
            # grand total: merge the coarsest level's handful of states on the
            # driver (bounded by the first key's cardinality)
            acc = None
            for r in cur.take_all():
                sk = spec.from_state(r[spec.name])
                acc = sk if acc is None else spec.merge(acc, sk)
            row = {"group_key": "|".join([fill] * len(keys)), spec.name: spec.finalize(acc)}
            t = pa.table({"group_key": pa.array([row["group_key"]]), spec.name: pa.array([row[spec.name]])})
            outs.append(rd.from_arrow(unnest_struct(t, columns=[spec.name])))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def cube_sketch_pipeline(
    ds,
    spec,
    keys: Sequence[str],
    *,
    derive=None,
    fill: str = ROLLUP_FILL,
):
    """GROUP BY CUBE: every subset of ``keys``, still reading the corpus ONCE.

    Unlike the rollup's chain, CUBE's groupings are not nested - but every
    subset CAN be re-merged from the same finest-level materialized states
    (merge associativity), so the cost of all 2^n groupings over 100 TB is
    one corpus pass plus 2^n - 1 shuffles of the KB-per-group state table.

    Output schema matches :func:`rollup_sketch_pipeline` (composite
    ``group_key`` with ``fill`` for absent keys).
    """
    from itertools import combinations as _combos

    import ray.data as rd

    from ..functions.aggregates import SketchStateMergeAgg
    from ..stages.util import unnest_struct
    from .corpus import sketch_states

    keys = list(keys)

    def finalize_level(states, present: list[str]):
        def fin(t: pa.Table) -> pa.Table:
            structs = [spec.finalize(spec.from_state(st)) for st in t.column(spec.name).to_pylist()]
            parts = []
            for k in keys:
                if k in present:
                    col = t.column(k).to_pylist()
                    parts.append([v if v is not None else "" for v in col])
                else:
                    parts.append([fill] * t.num_rows)
            gk = pa.array(["|".join(p) for p in zip(*parts)] if t.num_rows else [], pa.string())
            out = pa.table({"group_key": gk, spec.name: pa.array(structs)})
            return unnest_struct(out, columns=[spec.name])

        return states.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)

    states = sketch_states(ds, [spec], keys, derive=derive)
    finest = (
        states.groupby(keys)
        .aggregate(SketchStateMergeAgg(spec, emit_state=True))
        .materialize()  # tiny: one KB state row per finest group
    )
    outs = [finalize_level(finest, keys)]
    subsets = [
        list(c)
        for r in range(len(keys) - 1, 0, -1)
        for c in _combos(keys, r)
    ]
    for sub in subsets:
        lvl = finest.groupby(sub).aggregate(SketchStateMergeAgg(spec, emit_state=True))
        outs.append(finalize_level(lvl, sub))
    # grand total: merge the finest states on the driver (tiny)
    acc = None
    for r in finest.take_all():
        sk = spec.from_state(r[spec.name])
        acc = sk if acc is None else spec.merge(acc, sk)
    t = pa.table(
        {
            "group_key": pa.array(["|".join([fill] * len(keys))]),
            spec.name: pa.array([spec.finalize(acc)]),
        }
    )
    outs.append(rd.from_arrow(unnest_struct(t, columns=[spec.name])))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
