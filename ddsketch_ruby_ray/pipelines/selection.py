"""Sketch-guided EXACT quantile selection (exact median at 100 TB).

DDSketch answers quantiles within α, but its bucket COUNTS are exact - so it
can also drive an exact selection: the k-th smallest value's bucket is known
from one sketch pass (cumulative bin counts), and only the rows of that ONE
bucket (a ±α value window, typically a vanishing fraction of the corpus)
need a second, filtered scan.  Exact order statistics with two streaming
passes and no global sort - the sketch narrows, the scan finishes.

Rank convention: floor-rank k = floor(q·(n-1)), the reference's
get_quantile_value arithmetic (base_sketch.rb:125) made exact.  Positive
values only, with the zero band handled (rank inside the zero band selects
exactly 0, matching the reference's zero-band return and SQL's sort order
for non-negative data).

Scale shape: pass 1 is the flagship grouped build (KB states shuffle);
pass 2 is map-only (bucket-key equality filter against a broadcast) plus a
per-group selection over the candidate rows of a single bucket, whose size
the sketch reports EXACTLY beforehand (``bins[b]`` rows - raise if a caller
picks a quantile whose bucket is degenerate-huge rather than silently
collecting it).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = ["sketch_exact_quantile_pipeline"]


def sketch_exact_quantile_pipeline(
    ds,
    *,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    alpha: float = 0.01,
    max_candidates_per_group: int = 5_000_000,
):
    """-> Dataset[(group_col, exact_q: double)] - the EXACT floor-rank
    q-quantile value per group."""
    import ray

    from ..functions.aggregates import SketchStateMergeAgg
    from ..functions.specs import DDSketchSpec
    from .corpus import sketch_states

    spec = DDSketchSpec(on=value_col, name="s", relative_accuracy=alpha, quantiles=())
    states = sketch_states(ds, [spec], (group_col,))
    merged = states.groupby(group_col).aggregate(SketchStateMergeAgg(spec, emit_state=True))

    targets = {}  # group -> (bucket_key, local_rank)
    zero_rows = {"g": [], "v": []}  # groups whose rank falls in the zero band
    mapping = None
    for r in merged.take_all():  # one KB state row per group
        sk = spec.from_state(r["s"])
        mapping = sk.mapping
        if sk.negative_store.count:
            raise ValueError("sketch_exact_quantile_pipeline: positive values only")
        n = int(sk.count)
        if n == 0:
            continue
        k = int(math.floor(q * (n - 1)))
        zc = int(sk.zero_count)
        if k < zc:
            zero_rows["g"].append(r[group_col])
            zero_rows["v"].append(0.0)
            continue
        st = sk.store
        bins = np.asarray(st.bins)
        cum = np.cumsum(bins)
        b_idx = int(np.searchsorted(cum, k - zc, side="right"))
        if bins[b_idx] > max_candidates_per_group:
            raise ValueError(
                f"bucket for group {r[group_col]!r} holds {int(bins[b_idx])} rows"
                f" (> {max_candidates_per_group}); pick a different quantile or"
                " raise the limit"
            )
        local = (k - zc) - (int(cum[b_idx - 1]) if b_idx else 0)
        targets[r[group_col]] = (int(st.min_key) + b_idx, local)
    ref = ray.put((targets, mapping))

    def candidates(t: pa.Table) -> pa.Table:
        tg, mp = ray.get(ref)
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        groups = t.column(group_col).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(vals), dtype=bool)
        pos = vals > mp.min_possible
        if pos.any():
            keys = np.full(len(vals), np.iinfo(np.int64).min, dtype=np.int64)
            keys[pos] = np.asarray(mp.key(vals[pos]), dtype=np.int64)
            for g in np.unique(groups):  # groups-in-batch, not rows
                if g in tg:
                    keep |= (groups == g) & (keys == tg[g][0])
        return t.select([group_col, value_col]).filter(pa.array(keep))

    cand = ds.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)

    def select(pt: pa.Table) -> pa.Table:
        tg, _ = ray.get(ref)
        g = pt.column(group_col).to_numpy(zero_copy_only=False)
        out_g, out_v = [], []
        if g.size:
            v = pt.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.lexsort((v, g))
            g_s, v_s = g[order], v[order]
            new = np.empty(g_s.size, dtype=bool)
            new[0] = True
            new[1:] = g_s[1:] != g_s[:-1]
            starts = np.flatnonzero(new)
            for srt in starts:  # one iteration per GROUP (tiny)
                grp = g_s[srt]
                out_g.append(grp)
                out_v.append(float(v_s[srt + tg[grp][1]]))
        return pa.table(
            {
                group_col: pa.array(out_g),
                f"exact_{_qname(q)}": pa.array(out_v, pa.float64()),
            }
        )

    import ray.data as rd

    # the candidate table is one bucket per group: a single-partition exact
    # selection is safe by construction (size pre-checked from the sketch)
    picked = cand.repartition(1).map_batches(
        select, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    if zero_rows["g"]:
        zt = pa.table(
            {
                group_col: pa.array(zero_rows["g"]),
                f"exact_{_qname(q)}": pa.array(zero_rows["v"], pa.float64()),
            }
        )
        picked = picked.union(rd.from_arrow(zt))
    return picked


def _qname(q: float) -> str:
    from ..functions.specs import quantile_name

    return quantile_name(q)
