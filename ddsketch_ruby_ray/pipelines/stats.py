"""Sufficient-statistics aggregate: exact moments + Pearson correlation.

The oldest mergeable sketch there is: per group, the six sums
(n, Σx, Σy, Σxy, Σx², Σy²) determine mean/variance/covariance/correlation,
and they merge by ADDITION.  For INTEGER-valued inputs the partial sums are
exact in any accumulation order (the same contract as the DDSketch integer
``sum``), so the whole aggregate — including the final Pearson r — is
deterministic and bit-exact against SQL.

Scale shape: per-block vectorized pre-aggregation (one lexsort + reduceat
per block emits one 6-counter row per group-in-block), a tiny keyed shuffle
of those rows, and a per-partition finalize that accumulates in PYTHON ints
(no int64 overflow at any corpus size: Σx² at 100 TB exceeds 2^63) before
the one float conversion per group.  The per-BLOCK partials are int64, so
the pre-aggregation gates on max|x|·max|y|·block_rows < 2^63 and raises
rather than wrapping — supported value range ~|x| < 7.5e8 at the default
8k batch (rescale or shrink batches beyond that).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..core.hashing import hash256_str

__all__ = ["grouped_corr_pipeline"]


def grouped_corr_pipeline(
    ds,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    derive=None,
    num_partitions: int = 16,
):
    """-> Dataset[(group_col, n, r, slope, intercept)] - count, Pearson
    correlation and the OLS fit y ~ slope*x + intercept of two INTEGER-valued
    columns per group (r/slope = 0.0 when the relevant variance is 0).
    Every float is derived from the exact integer sums in a fixed operation
    order, so all columns are bit-exact vs SQL."""

    def preagg(t: pa.Table) -> pa.Table:
        if derive is not None:
            t = derive(t)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # Exactness gate (ADVICE r2): the per-element products and reduceat
        # block partials below are int64 and would WRAP silently past 2^63;
        # only the finalize stage accumulates in Python ints.  Bound both
        # with max|x|*max|y|*rows evaluated in Python ints (can't overflow)
        # and fail loudly instead of corrupting the statistics.
        if x.size:
            mx = max(int(x.max()), -int(x.min()))
            my = max(int(y.max()), -int(y.min()))
            if max(mx * my, mx * mx, my * my) * x.size >= 2**63:
                raise ValueError(
                    "grouped_corr_pipeline: inputs exceed the exact-int64 "
                    f"block pre-aggregation range (max|x|={mx}, max|y|={my}, "
                    f"block rows={x.size}); rescale the inputs or shrink the "
                    "batch size"
                )
        order = np.argsort(g, kind="stable")
        g_s, x_s, y_s = g[order], x[order], y[order]
        new = np.empty(g_s.size, dtype=bool)
        if g_s.size:
            new[0] = True
            new[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, g_s.size))
        return pa.table(
            {
                group_col: pa.array(g_s[starts].tolist()),
                "n": pa.array(lens.astype(np.int64)),
                "sx": pa.array(np.add.reduceat(x_s, starts) if starts.size else np.zeros(0, np.int64)),
                "sy": pa.array(np.add.reduceat(y_s, starts) if starts.size else np.zeros(0, np.int64)),
                "sxy": pa.array(np.add.reduceat(x_s * y_s, starts) if starts.size else np.zeros(0, np.int64)),
                "sxx": pa.array(np.add.reduceat(x_s * x_s, starts) if starts.size else np.zeros(0, np.int64)),
                "syy": pa.array(np.add.reduceat(y_s * y_s, starts) if starts.size else np.zeros(0, np.int64)),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        h = hash256_str(t.column(group_col).cast(pa.string()), lanes=1)[0]
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def finalize(pt: pa.Table) -> pa.Table:
        groups: dict = {}
        for row in pt.to_pylist():  # tiny: one row per (block, group)
            acc = groups.setdefault(row[group_col], [0, 0, 0, 0, 0, 0])
            for i, c in enumerate(("n", "sx", "sy", "sxy", "sxx", "syy")):
                acc[i] += int(row[c])  # python ints: exact at any scale
        gs, ns, rs, slopes, icpts = [], [], [], [], []
        for g in sorted(groups):
            n, sx, sy, sxy, sxx, syy = groups[g]
            num = n * sxy - sx * sy
            d1 = n * sxx - sx * sx
            d2 = n * syy - sy * sy
            r = (
                float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
                if d1 > 0 and d2 > 0
                else 0.0
            )
            slope = float(num) / float(d1) if d1 > 0 else 0.0
            # fixed op order, mirrored in SQL: (sy - slope*sx) / n
            icpt = (float(sy) - slope * float(sx)) / float(n) if n else 0.0
            gs.append(g)
            ns.append(float(n))
            rs.append(r)
            slopes.append(slope)
            icpts.append(icpt)
        return pa.table(
            {
                group_col: pa.array(gs),
                "n": pa.array(ns, pa.float64()),
                "r": pa.array(rs, pa.float64()),
                "slope": pa.array(slopes, pa.float64()),
                "intercept": pa.array(icpts, pa.float64()),
            }
        )

    partials = ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(finalize, batch_format="pyarrow")
    )
