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

__all__ = [
    "grouped_corr_pipeline",
    "grouped_zscore_pipeline",
    "chi2_contingency_pipeline",
    "grouped_gini_pipeline",
]


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


def grouped_zscore_pipeline(
    ds,
    *,
    group_col: str,
    value_col: str,
    carry_cols=(),
):
    """Per-group z-score normalization of an INTEGER-valued column, emitted
    as exact milli-units: ``z_e3 = round_half_away(1000 * (n·x − S) /
    sqrt(n·Q − S²))`` with per-group exact integer sums S = Σx, Q = Σx²
    (the feature-standardization staple).

    Two streaming passes: (1) per-block vectorized (group, n, S, Q)
    partials — a KB-sized take_all (G groups × blocks rows, NOT data) merged
    in Python ints on the driver; (2) a stateless per-row map with the tiny
    stats table captured in the closure.  Nothing shuffles.

    Exactness: the identity (x − S/n)/σ = (n·x − S)/sqrt(n·Q − S²) uses one
    integer numerator and one integer radicand, each converted to float64
    ONCE, so the divide/sqrt/round chain is bit-identical to the SQL mirror.
    Gates (raise, never wrap/round silently): per-block int64 pre-agg needs
    max(x)²·block_rows < 2^63; the float conversions need |n·x − S| and
    n·Q − S² below 2^53.  Groups with n < 2 or zero variance emit NULL.
    """
    carry_cols = list(carry_cols)

    def preagg(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if x.size:
            mx = max(int(x.max()), -int(x.min()), 1)
            if mx * mx * x.size >= 2**63:
                raise OverflowError(
                    f"zscore preagg would overflow int64: max|x|={mx}, rows={x.size}"
                )
        order = np.argsort(g, kind="stable")
        g_s, x_s = g[order], x[order]
        first = np.empty(x_s.size, dtype=bool)
        if x_s.size:
            first[0] = True
            first[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(first)
        return pa.table(
            {
                group_col: pa.array(g_s[starts]),
                "n": pa.array(np.diff(np.append(starts, x_s.size)).astype(np.int64)),
                "s": pa.array(np.add.reduceat(x_s, starts) if x_s.size else np.array([], np.int64)),
                "q": pa.array(
                    np.add.reduceat(x_s * x_s, starts) if x_s.size else np.array([], np.int64)
                ),
            }
        )

    # G × num_blocks tiny rows — a broadcast-table materialization, not data
    parts = ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True).take_all()
    stats: dict = {}
    for r in parts:
        n0, s0, q0 = stats.get(r[group_col], (0, 0, 0))
        stats[r[group_col]] = (n0 + int(r["n"]), s0 + int(r["s"]), q0 + int(r["q"]))
    for gname, (n, s, q) in stats.items():
        rad = n * q - s * s
        if rad >= 2**53 or n * max(abs(s), 1) >= 2**62:
            raise OverflowError(f"zscore stats for group {gname!r} exceed float64 exactness")

    den = {g: (math.sqrt(float(n * q - s * s)) if n >= 2 and n * q - s * s > 0 else 0.0)
           for g, (n, s, q) in stats.items()}
    ns = {g: n for g, (n, s, q) in stats.items()}
    ss = {g: s for g, (n, s, q) in stats.items()}

    from ..core.numeric import round_half_away

    def zmap(t: pa.Table) -> pa.Table:
        col = t.column(group_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        de = col.dictionary_encode()
        dvals = de.dictionary.to_pylist()
        idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_arr = np.array([ns.get(v, 0) for v in dvals], dtype=np.int64)[idx]
        s_arr = np.array([ss.get(v, 0) for v in dvals], dtype=np.int64)[idx]
        d_arr = np.array([den.get(v, 0.0) for v in dvals], dtype=np.float64)[idx]
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ok = d_arr > 0.0
        num = (n_arr * x - s_arr).astype(np.float64)
        z = np.divide(num, d_arr, out=np.zeros_like(num), where=ok)
        ze3 = round_half_away(1000.0 * z).astype(np.int64)
        out = {c: t.column(c) for c in carry_cols}
        out[group_col] = t.column(group_col)
        out[value_col] = t.column(value_col)
        out["z_e3"] = pa.array(ze3, pa.int64(), mask=~ok)
        return pa.table(out)

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)


def chi2_contingency_pipeline(ds, *, a_col: str, b_col: str):
    """Pearson chi-square independence cells over two categorical columns.

    The corpus-composition drift test ("is source mix independent of
    language?"): one row per OBSERVED (a, b) cell with its count ``obs``,
    row/column totals ``rt``/``ct``, grand total ``n`` and the cell's
    chi-square contribution.  ``chi2_cell = (obs - E)^2 / E`` with
    ``E = rt*ct/n`` is evaluated in the overflow-free rational form
    ``(obs*n - rt*ct)^2 / (rt*ct*n)`` — exact Python-int numerator and
    denominator, ONE correctly-rounded double conversion each and ONE float
    divide, in the same op order as the SQL mirror (which needs HUGEINT:
    the numerator exceeds int64 beyond ~1e5 rows; int128 carries it to
    ~1e9 rows, past which the SQL mirror — not the engine — saturates).

    Scale shape: per-block Arrow group_by pre-agg (one (a, b, count) row
    per cell-in-block), a tiny keyed shuffle of those partials, and a
    driver-side finalize over the G-cell table (KB-sized — cells are
    category pairs, never data rows).
    """

    def preagg(t: pa.Table) -> pa.Table:
        g = t.group_by([a_col, b_col]).aggregate([([], "count_all")])
        return g.rename_columns([a_col, b_col, "cnt"])

    cells = (
        ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([a_col, b_col])
        .sum("cnt")
        .take_all()
    )  # one row per observed (a, b) category pair — KB-sized, not data rows

    a_vals = [r[a_col] for r in cells]
    b_vals = [r[b_col] for r in cells]
    obs = [int(r["sum(cnt)"]) for r in cells]
    n = sum(obs)
    rt_map: dict = {}
    ct_map: dict = {}
    for a, b, o in zip(a_vals, b_vals, obs):
        rt_map[a] = rt_map.get(a, 0) + o
        ct_map[b] = ct_map.get(b, 0) + o

    chi2 = []
    rts, cts = [], []
    for a, b, o in zip(a_vals, b_vals, obs):
        rt, ct = rt_map[a], ct_map[b]
        rts.append(rt)
        cts.append(ct)
        num = (o * n - rt * ct) ** 2  # exact Python ints, any corpus size
        den = rt * ct * n
        chi2.append(float(num) / float(den))

    return pa.table(
        {
            a_col: pa.array(a_vals),
            b_col: pa.array(b_vals),
            "obs": pa.array(obs, pa.int64()),
            "rt": pa.array(rts, pa.int64()),
            "ct": pa.array(cts, pa.int64()),
            "n": pa.array([n] * len(obs), pa.int64()),
            "chi2_cell": pa.array(chi2, pa.float64()),
        }
    )


def grouped_gini_pipeline(ds, *, group_col: str, value_col: str):
    """Per-group Gini DIVERSITY of a categorical column:
    ``gini = 1 - sum_v (c_v / n)^2 = (n^2 - sum c_v^2) / n^2``.

    The exact-rational surrogate for entropy ("how varied is each user's
    event mix / each language's source mix"): unlike Shannon entropy, whose
    sum-of-c*ln(c) is float-accumulation-order-dependent, the Gini
    numerator and denominator are exact integers, so the score is ONE
    correctly-rounded division — bit-exact against SQL at any layout.

    Plan: per-block Arrow group_by pre-agg -> (group, value, count)
    partial shuffle -> per-(group, value) exact counts -> a second tiny
    keyed sum of (c^2, c) per group -> vectorized finalize.  Both shuffles
    carry counts, never rows.  int64 gates: c^2 needs group-category
    counts < 3e9; raises rather than wrapping.
    """
    import pyarrow.compute as pc

    def preagg(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    # the (group, value) and group domains scale with the group key (e.g.
    # users) -> bounded-partition folds (pipelines/fold.py)
    from ddsketch_ruby_ray.pipelines.fold import partitioned_group_sum

    counted = partitioned_group_sum(
        ds.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, value_col],
        "c",
    )

    def square(t: pa.Table) -> pa.Table:
        c = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        if c.size and int(c.max()) >= 3_000_000_000:
            raise OverflowError("gini preagg: per-category count >= 3e9 would overflow c^2")
        return pa.table(
            {
                group_col: t.column(group_col),
                "sq": pa.array(c * c),
                "c": pa.array(c),
            }
        )

    summed = partitioned_group_sum(
        counted.map_batches(square, batch_format="pyarrow", zero_copy_batch=True),
        group_col,
        ["sq", "c"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        s2 = t.column("sum(sq)").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        if n.size and int(n.max()) >= 3_000_000_000:
            raise OverflowError("gini finalize: group size >= 3e9 would overflow n^2")
        nn = n * n
        return pa.table(
            {
                group_col: t.column(group_col),
                "n": pa.array(n),
                "sum_sq": pa.array(s2),
                "gini": pa.array(
                    (nn - s2).astype(np.float64) / nn.astype(np.float64), pa.float64()
                ),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")
