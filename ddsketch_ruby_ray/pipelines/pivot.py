"""Pivot (crosstab): long (group, category) counts -> one wide row per group.

The reshape every reporting layer wants after a grouped count: one row per
group with one integer column per category.  The category set must be known
and small (it becomes the output schema — same constraint every SQL PIVOT
has); the GROUP side is unbounded.

Scale shape: counts pre-aggregate per block (each block emits at most
|groups-in-block| x |categories| tiny rows), one groupby-sum shuffle of
those rows, then the widening is a per-partition vectorized scatter — rows
never shuffle, and no per-group Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import hash256_str

__all__ = ["pivot_counts_pipeline"]


def pivot_counts_pipeline(
    ds,
    *,
    group_col: str,
    pivot_col: str,
    values,
    num_partitions: int = 16,
):
    """-> Dataset[(group_col, <v>: int64 for v in values)] - counts of each
    category per group.  Rows whose ``pivot_col`` is not in ``values`` are
    ignored (they would have no output column)."""
    values = list(values)
    vsorted = np.array(sorted(values))

    def preagg(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        p = t.column(pivot_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vsorted, p)
        idx_c = np.minimum(idx, len(vsorted) - 1)
        keep = vsorted[idx_c] == p
        g, idx = g[keep], idx_c[keep]
        combo = np.char.add(np.char.add(g.astype(str), "\x1f"), idx.astype(str))
        uniq, counts = np.unique(combo, return_counts=True)
        parts = np.char.partition(uniq, "\x1f")
        return pa.table(
            {
                "g": pa.array(parts[:, 0].tolist(), pa.string()),
                "v": pa.array(parts[:, 2].astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    counted = (
        ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .sum("n")
    )

    def add_part(t: pa.Table) -> pa.Table:
        h = hash256_str(t.column("g"), lanes=1)[0]
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    names = [str(v) for v in np.sort(np.array(values))]

    def widen(pt: pa.Table) -> pa.Table:
        g = pt.column("g").to_numpy(zero_copy_only=False)
        if not g.size:
            cols = {group_col: pa.array([], pa.string())}
            for nm in names:
                cols[nm] = pa.array([], pa.int64())
            return pa.table(cols)
        v = pt.column("v").to_numpy(zero_copy_only=False)
        n = pt.column("sum(n)").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g_s, v_s, n_s = g[order], v[order], n[order]
        new = np.empty(g_s.size, dtype=bool)
        new[0] = True
        new[1:] = g_s[1:] != g_s[:-1]
        gid = np.cumsum(new) - 1
        wide = np.zeros((int(gid[-1]) + 1, len(names)), dtype=np.int64)
        wide[gid, v_s] = n_s
        cols = {group_col: pa.array(g_s[new].tolist(), pa.string())}
        for j, nm in enumerate(names):
            cols[nm] = pa.array(wide[:, j])
        return pa.table(cols)

    return (
        counted.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(widen, batch_format="pyarrow")
    )
