"""Distribution drift between two corpus snapshots, from sketch histograms.

The production use of a mergeable quantile sketch beyond quantiles: compare
TODAY's per-group value distribution against YESTERDAY's without re-reading
either corpus' rows — each side is reduced to one DDSketch per group (KB
states over the shuffle), and the drift statistic is computed from the two
bucket histograms alone.

Statistic: total variation distance over the sketch buckets,

    TVD = 1/2 · Σ_k | c_a[k]/n_a − c_b[k]/n_b |
        = Σ_k | c_a[k]·n_b − c_b[k]·n_a | / (2·n_a·n_b)

evaluated in EXACT INTEGER arithmetic (the cross-multiplied form) so the
bucket-sum is order-independent — unlike a float Σ|p−q|, it survives any
merge order, is identical on any cluster layout, and has a bit-exact DuckDB
mirror (HUGEINT).  The numerator is carried as a Python int on the driver
(arbitrary precision; at 100 TB the products exceed int64).

Scale shape: two independent flagship builds (each side's raw rows never
shuffle), then a per-group driver pass over G pairs of bucket arrays — G is
the group cardinality, not row count.  Positive values only (the
rank/outlier/histogram contract); zero-band rows are excluded from both
histogram and n, mirroring ``WHERE v > min_possible``.

Output: one row per group PRESENT ON BOTH SIDES (drift against an absent
group is undefined; appearing/disappearing groups are a count-level check,
not a distribution one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["sketch_drift_pipeline", "sketch_ks_pipeline"]


def _group_hists(ds, spec, group_col, derive=None):
    from ..functions.aggregates import SketchStateMergeAgg
    from .corpus import sketch_states

    states = sketch_states(ds, [spec], (group_col,), derive=derive)
    merged = states.groupby(group_col).aggregate(SketchStateMergeAgg(spec, emit_state=True))
    out = {}
    for r in merged.take_all():  # one KB state row per group
        store = spec.from_state(r["s"]).store
        bins = np.asarray(store.bins, dtype=np.float64)
        nz = np.nonzero(bins)[0]
        keys = nz + (int(store.min_key) if nz.size else 0)
        out[r[group_col]] = dict(zip(keys.tolist(), bins[nz].astype(np.int64).tolist()))
    return out


def sketch_drift_pipeline(
    ds_a,
    ds_b,
    *,
    group_col: str,
    value_col: str,
    alpha: float = 0.01,
    derive=None,
):
    """-> Dataset[(group_col, n_a, n_b, buckets, l1_num, tvd)] for groups on
    both sides.  ``l1_num`` is Σ|c_a·n_b − c_b·n_a| (exact integer, emitted
    as double); ``tvd = l1_num / (2·n_a·n_b)`` in [0, 1].

    Unweighted integer-count histograms only (the exact-arithmetic
    contract; fractional weights would reintroduce order-dependent float
    sums)."""
    import ray.data as rd

    from ..functions.specs import DDSketchSpec

    spec = DDSketchSpec(on=value_col, name="s", relative_accuracy=alpha, quantiles=())
    ha = _group_hists(ds_a, spec, group_col, derive=derive)
    hb = _group_hists(ds_b, spec, group_col, derive=derive)
    rows = {"g": [], "n_a": [], "n_b": [], "buckets": [], "l1_num": [], "tvd": []}
    for g in sorted(set(ha) & set(hb)):
        ca, cb = ha[g], hb[g]
        n_a = sum(ca.values())  # positive-store mass (exact ints)
        n_b = sum(cb.values())
        keys = set(ca) | set(cb)
        l1 = sum(abs(ca.get(k, 0) * n_b - cb.get(k, 0) * n_a) for k in keys)
        rows["g"].append(g)
        rows["n_a"].append(float(n_a))
        rows["n_b"].append(float(n_b))
        rows["buckets"].append(len(keys))
        rows["l1_num"].append(float(l1))
        rows["tvd"].append(float(l1) / float(2 * n_a * n_b))
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(rows["g"]),
                "n_a": pa.array(rows["n_a"], pa.float64()),
                "n_b": pa.array(rows["n_b"], pa.float64()),
                "buckets": pa.array(rows["buckets"], pa.int64()),
                "l1_num": pa.array(rows["l1_num"], pa.float64()),
                "tvd": pa.array(rows["tvd"], pa.float64()),
            }
        )
    )


def sketch_ks_pipeline(
    ds_a,
    ds_b,
    *,
    group_col: str,
    value_col: str,
    alpha: float = 0.01,
    derive=None,
):
    """-> Dataset[(group_col, n_a, n_b, ks_num, ks)]: the Kolmogorov-Smirnov
    statistic between the two snapshots' per-group distributions, from the
    sketch bucket histograms alone.

        KS = max_k | CumA(k)/n_a - CumB(k)/n_b |
           = max_k | CumA(k)*n_b - CumB(k)*n_a | / (n_a*n_b)

    with the cumulative sums taken over ascending bucket keys; the max of
    the cross-multiplied integers (``ks_num``) is exact at any scale, so
    the statistic is one float division — the same order-independence
    contract as the TVD pipeline above (KS resolves the distribution shape
    the L1 statistic sums away: WHERE the mass shifted, not just how much).
    """
    import ray.data as rd

    from ..functions.specs import DDSketchSpec

    spec = DDSketchSpec(on=value_col, name="s", relative_accuracy=alpha, quantiles=())
    ha = _group_hists(ds_a, spec, group_col, derive=derive)
    hb = _group_hists(ds_b, spec, group_col, derive=derive)
    rows = {"g": [], "n_a": [], "n_b": [], "ks_num": [], "ks": []}
    for g in sorted(set(ha) & set(hb)):
        ca, cb = ha[g], hb[g]
        n_a = sum(ca.values())
        n_b = sum(cb.values())
        cum_a = cum_b = 0
        best = 0
        for k in sorted(set(ca) | set(cb)):  # ascending bucket keys
            cum_a += ca.get(k, 0)
            cum_b += cb.get(k, 0)
            gap = abs(cum_a * n_b - cum_b * n_a)  # exact python ints
            if gap > best:
                best = gap
        rows["g"].append(g)
        rows["n_a"].append(float(n_a))
        rows["n_b"].append(float(n_b))
        rows["ks_num"].append(float(best))
        rows["ks"].append(float(best) / float(n_a * n_b))
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(rows["g"]),
                "n_a": pa.array(rows["n_a"], pa.float64()),
                "n_b": pa.array(rows["n_b"], pa.float64()),
                "ks_num": pa.array(rows["ks_num"], pa.float64()),
                "ks": pa.array(rows["ks"], pa.float64()),
            }
        )
    )
