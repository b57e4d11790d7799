"""Extreme-cardinality DDSketch aggregation: the vectorized "pairs" plan.

Why: Ray's aggregate machinery (and therefore both the "states" and "rows"
strategies) iterates GROUPS in Python - fine at 10^1..10^5 groups, ~100-250us
per group beyond that.  At lang x repo cardinality (10^6..10^8 groups) the
hot path must never touch Python per group.

Plan (all group-cardinality-proportional work is numpy):

  stage A (fused into the read): block -> pre-aggregated PAIR table
      one row per distinct (group, metric, side, bucket-key) in the block,
      carrying (w_sum, vw_sum, v_min, v_max); built with ONE
      lexsort + reduceat per block.  A partition id = splitmix64(group) % P
      rides along, so every group's pairs meet in exactly one partition.
  stage B: groupby("_part") -> P map_groups calls (P ~ cpus, NOT groups);
      inside each: lexsort + reduceat re-aggregation across blocks, then a
      per-group quantile walk over its few sorted buckets (numpy slices,
      no sketch objects).

Results are bit-identical to the "states"/"rows" strategies for dense-store,
unweighted DDSketchSpecs (same keys, same rank arithmetic - the per-group
walk replicates base_sketch.rb:121-138 exactly; sums are exact for
integer-valued metrics).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa

from ..core.hashing import hash256_str
from ..functions.specs import DDSketchSpec, quantile_name

__all__ = ["ddsketch_pairs_pipeline"]


def _check_specs(specs: Sequence[DDSketchSpec]) -> None:
    for s in specs:
        if not isinstance(s, DDSketchSpec):
            raise TypeError("pairs strategy supports DDSketchSpec only")
        if s.interpolation is not None:
            raise ValueError("pairs strategy supports the logarithmic mapping only")
        if s.alpha != specs[0].alpha:
            raise ValueError("all specs must share alpha (one mapping per pipeline)")


def _clamp_keys(ks: np.ndarray, ws: np.ndarray, store: str, bin_limit: int):
    """Apply the collapsing-store clamp model to one side's sorted buckets.

    The spec's order-independent model (collapsing_lowest_dense_store_spec.rb:
    35-38 / highest :35-38): final bins == multiset of max(k, kmax-limit+1)
    (lowest) or min(k, kmin+limit-1) (highest) over the side's FINAL extent -
    which is exactly what collapse-during-accumulate + fold-merge produces.
    """
    if ks.size == 0 or store == "dense":
        return ks, ws
    if store == "collapse_lowest":
        clamped = np.maximum(ks, ks[-1] - bin_limit + 1)  # ks sorted ascending
    else:  # collapse_highest
        clamped = np.minimum(ks, ks[0] + bin_limit - 1)
    uniq, inv = np.unique(clamped, return_inverse=True)
    wsum = np.zeros(uniq.size)
    np.add.at(wsum, inv, ws)
    return uniq, wsum


def _group_composite(batch: pa.Table, group_keys: Sequence[str]):
    """Composite group string per row (partition hashing + within-partition id)."""
    parts = []
    for kcol in group_keys:
        col = batch.column(kcol)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(col.cast(pa.string()))
    import pyarrow.compute as pc

    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def ddsketch_pairs_pipeline(
    ds,
    specs: Sequence[DDSketchSpec],
    group_keys: Sequence[str],
    *,
    derive=None,
    num_partitions: int = 64,
    prefixes: dict | None = None,
    batch_size: int | None = None,
):
    """-> Dataset: one row per group with per-spec count/sum/avg/min/max/p*.

    See module docstring; ``prefixes`` as in grouped_sketch_pipeline.
    """
    _check_specs(specs)
    group_keys = list(group_keys)
    from ..core.mapping import LogarithmicKeyMapping

    mp = LogarithmicKeyMapping(specs[0].alpha)
    mult = mp.multiplier
    min_possible = mp.min_possible
    gamma = mp.gamma
    quantiles = {s.name: list(s.quantiles) for s in specs}
    include_sum_avg = {s.name: s.include_sum_avg for s in specs}
    metric_names = [s.name for s in specs]
    value_cols = [s.on for s in specs]
    weight_cols = [s.weight for s in specs]
    stores = [s.store for s in specs]
    bin_limits = [s.bin_limit for s in specs]

    def to_pairs(batch: pa.Table) -> pa.Table:
        if derive is not None:
            batch = derive(batch)
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "_part": pa.array([], pa.int32()),
                    "_g": pa.array([], pa.string()),
                    "_m": pa.array([], pa.int8()),
                    "_side": pa.array([], pa.int8()),
                    "_k": pa.array([], pa.int64()),
                    "_w": pa.array([], pa.float64()),
                    "_vw": pa.array([], pa.float64()),
                    "_vmin": pa.array([], pa.float64()),
                    "_vmax": pa.array([], pa.float64()),
                }
            )
        gcomp = _group_composite(batch, group_keys)
        dict_arr = gcomp.dictionary_encode()
        gcodes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gdict = dict_arr.dictionary  # distinct composite strings
        # deterministic partition per DISTINCT group (hash the composite string)
        part_of_group = (hash256_str(gdict, lanes=1)[0] % np.uint64(num_partitions)).astype(
            np.int32
        )

        out = {
            "_part": [],
            "_g": [],
            "_m": [],
            "_side": [],
            "_k": [],
            "_w": [],
            "_vw": [],
            "_vmin": [],
            "_vmax": [],
        }
        gdict_np = np.asarray(gdict.to_pylist(), dtype=object)
        for mi, col in enumerate(value_cols):
            v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            if weight_cols[mi] is not None:
                wt = (
                    batch.column(weight_cols[mi])
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64, copy=False)
                )
                if wt.size and float(wt.min()) <= 0.0:
                    raise ValueError("weight must be positive")
            else:
                wt = np.ones(n)
            side = np.zeros(n, dtype=np.int8)
            side[v > min_possible] = 1
            side[v < -min_possible] = -1
            k = np.zeros(n, dtype=np.int64)
            pos = side == 1
            neg = side == -1
            if pos.any():
                k[pos] = np.ceil(np.log2(v[pos]) * mult).astype(np.int64)
            if neg.any():
                k[neg] = np.ceil(np.log2(-v[neg]) * mult).astype(np.int64)
            order = np.lexsort((k, side, gcodes))
            gs, ss, ks, vs, ws = gcodes[order], side[order], k[order], v[order], wt[order]
            newgrp = np.empty(n, dtype=bool)
            newgrp[0] = True
            newgrp[1:] = (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1]) | (ks[1:] != ks[:-1])
            starts = np.flatnonzero(newgrp)
            w_sum = np.add.reduceat(ws, starts)
            vw_sum = np.add.reduceat(vs * ws, starts)
            v_min = np.minimum.reduceat(vs, starts)
            v_max = np.maximum.reduceat(vs, starts)
            gsel = gs[starts]
            out["_part"].append(part_of_group[gsel])
            out["_g"].append(gdict_np[gsel])
            out["_m"].append(np.full(starts.size, mi, dtype=np.int8))
            out["_side"].append(ss[starts])
            out["_k"].append(ks[starts])
            out["_w"].append(w_sum)
            out["_vw"].append(vw_sum)
            out["_vmin"].append(v_min)
            out["_vmax"].append(v_max)

        return pa.table(
            {
                "_part": pa.array(np.concatenate(out["_part"]), pa.int32()),
                "_g": pa.array(np.concatenate(out["_g"]).tolist(), pa.string()),
                "_m": pa.array(np.concatenate(out["_m"]), pa.int8()),
                "_side": pa.array(np.concatenate(out["_side"]), pa.int8()),
                "_k": pa.array(np.concatenate(out["_k"]), pa.int64()),
                "_w": pa.array(np.concatenate(out["_w"]), pa.float64()),
                "_vw": pa.array(np.concatenate(out["_vw"]), pa.float64()),
                "_vmin": pa.array(np.concatenate(out["_vmin"]), pa.float64()),
                "_vmax": pa.array(np.concatenate(out["_vmax"]), pa.float64()),
            }
        )

    pairs = ds.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )

    coef = 2.0 / (1.0 + gamma)

    def finalize_partition(pt: pa.Table) -> pa.Table:
        import pandas as pd

        g = pt.column("_g").to_numpy(zero_copy_only=False)
        m = pt.column("_m").to_numpy(zero_copy_only=False)
        side = pt.column("_side").to_numpy(zero_copy_only=False)
        k = pt.column("_k").to_numpy(zero_copy_only=False)
        w = pt.column("_w").to_numpy(zero_copy_only=False)
        vw = pt.column("_vw").to_numpy(zero_copy_only=False)
        vmin = pt.column("_vmin").to_numpy(zero_copy_only=False)
        vmax = pt.column("_vmax").to_numpy(zero_copy_only=False)

        gid, guniques = pd.factorize(pd.Series(g), sort=True)
        order = np.lexsort((k, side, m, gid))
        gid, m_, side_, k_ = gid[order], m[order], side[order], k[order]
        w_, vw_, vmin_, vmax_ = w[order], vw[order], vmin[order], vmax[order]
        nrows = len(gid)
        newb = np.empty(nrows, dtype=bool)
        newb[0] = True
        newb[1:] = (
            (gid[1:] != gid[:-1])
            | (m_[1:] != m_[:-1])
            | (side_[1:] != side_[:-1])
            | (k_[1:] != k_[:-1])
        )
        starts = np.flatnonzero(newb)
        # re-aggregated distinct buckets
        bg, bm, bs, bk = gid[starts], m_[starts], side_[starts], k_[starts]
        bw = np.add.reduceat(w_, starts)
        bvw = np.add.reduceat(vw_, starts)
        bvmin = np.minimum.reduceat(vmin_, starts)
        bvmax = np.maximum.reduceat(vmax_, starts)

        n_groups = len(guniques)
        result_cols: dict[str, np.ndarray] = {}
        # (group, metric) segment boundaries over the bucket arrays
        seg_id = bg * len(metric_names) + bm
        seg_new = np.empty(len(bg), dtype=bool)
        seg_new[0] = True
        seg_new[1:] = seg_id[1:] != seg_id[:-1]
        seg_starts = np.flatnonzero(seg_new)
        seg_ends = np.append(seg_starts[1:], len(bg))

        # per-spec output arrays
        outs = {
            name: {
                "count": np.zeros(n_groups),
                "sum": np.zeros(n_groups),
                "min": np.full(n_groups, np.nan),
                "max": np.full(n_groups, np.nan),
                **{quantile_name(q): np.full(n_groups, np.nan) for q in quantiles[name]},
            }
            for name in metric_names
        }

        for si in range(len(seg_starts)):
            a, b = seg_starts[si], seg_ends[si]
            gix = bg[a]
            name = metric_names[bm[a]]
            ks, ss, ws = bk[a:b], bs[a:b], bw[a:b]
            cnt = ws.sum()
            o = outs[name]
            o["count"][gix] = cnt
            o["sum"][gix] = bvw[a:b].sum()
            o["min"][gix] = bvmin[a:b].min()
            o["max"][gix] = bvmax[a:b].max()
            negm = ss == -1
            zerom = ss == 0
            posm = ss == 1
            mstore, mlimit = stores[bm[a]], bin_limits[bm[a]]
            neg_k, neg_w = _clamp_keys(ks[negm], ws[negm], mstore, mlimit)
            zero_cnt = ws[zerom].sum() if zerom.any() else 0.0
            pos_k, pos_w = _clamp_keys(ks[posm], ws[posm], mstore, mlimit)
            neg_cnt = neg_w.sum() if neg_k.size else 0.0
            pos_cum = np.cumsum(pos_w) if pos_k.size else np.zeros(0)
            # negative store: ascending key scan with UPPER rank semantics
            # (dense_store.rb:123-135 lower=false: first running >= rank+1)
            neg_cum = np.cumsum(neg_w) if neg_k.size else np.zeros(0)
            for q in quantiles[name]:
                if cnt == 0:
                    continue
                rank = q * (cnt - 1)
                if rank < neg_cnt:
                    reversed_rank = neg_cnt - rank - 1
                    idx = int(np.searchsorted(neg_cum, reversed_rank + 1, side="left"))
                    idx = min(idx, neg_k.size - 1)
                    key = float(neg_k[idx])
                    o[quantile_name(q)][gix] = -math.pow(2.0, key / mult) * coef
                elif rank < zero_cnt + neg_cnt:
                    o[quantile_name(q)][gix] = 0.0
                else:
                    target = rank - zero_cnt - neg_cnt
                    idx = int(np.searchsorted(pos_cum, target, side="right"))
                    idx = min(idx, pos_k.size - 1)
                    key = float(pos_k[idx])
                    o[quantile_name(q)][gix] = math.pow(2.0, key / mult) * coef

        # group key columns back from the composite
        gstr = np.asarray(guniques, dtype=object)
        cols: dict[str, pa.Array] = {}
        if len(group_keys) == 1:
            cols[group_keys[0]] = pa.array(gstr.tolist(), pa.string())
        else:
            split = [s.split("\x1f") for s in gstr]
            for i, kcol in enumerate(group_keys):
                cols[kcol] = pa.array([r[i] for r in split], pa.string())
        for name in metric_names:
            p = (prefixes or {}).get(name, "")
            o = outs[name]
            cols[f"{p}count"] = pa.array(o["count"], pa.float64())
            if include_sum_avg[name]:
                cols[f"{p}sum"] = pa.array(o["sum"], pa.float64())
                with np.errstate(invalid="ignore", divide="ignore"):
                    cols[f"{p}avg"] = pa.array(o["sum"] / o["count"], pa.float64())
            cols[f"{p}min"] = pa.array(o["min"], pa.float64())
            cols[f"{p}max"] = pa.array(o["max"], pa.float64())
            for q in quantiles[name]:
                cols[f"{p}{quantile_name(q)}"] = pa.array(o[quantile_name(q)], pa.float64())
        return pa.table(cols)

    return pairs.groupby("_part").map_groups(finalize_partition, batch_format="pyarrow")
