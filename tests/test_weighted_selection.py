"""Weighted exact quantile selection vs expand-by-weight brute force."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.selection import (
    sketch_exact_weighted_quantile_pipeline,
)


def _brute(groups, vals, wts, q):
    out = {}
    by_g: dict = {}
    for g, v, w in zip(groups, vals, wts):
        by_g.setdefault(g, []).append((v, w))
    for g, rows in by_g.items():
        expanded = sorted(v for v, w in rows for _ in range(w))
        k = int(math.floor(q * (len(expanded) - 1)))
        out[g] = float(expanded[k])
    return out


def _run(groups, vals, wts, q=0.5):
    import ray.data as rd

    tbl = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "v": pa.array(np.asarray(vals, np.float64)),
            "w": pa.array(np.asarray(wts, np.int64)),
        }
    )
    df = sketch_exact_weighted_quantile_pipeline(
        rd.from_arrow(tbl).repartition(4),
        group_col="g",
        value_col="v",
        weight_col="w",
        q=q,
    ).to_pandas()
    return dict(zip(df.g, df[df.columns[1]]))


class TestWeightedQuantile:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(6)
        n = 3000
        groups = rng.choice(["a", "b", "c"], n).tolist()
        vals = (rng.random(n) * 1000 + 1).round(2)
        wts = rng.integers(1, 8, n)
        for q in (0.1, 0.5, 0.9):
            assert _run(groups, vals, wts, q) == _brute(groups, vals, wts, q)

    def test_weight_one_equals_unweighted_median(self, ray_session):
        vals = [5.0, 1.0, 9.0, 3.0, 7.0]
        got = _run(["g"] * 5, vals, [1] * 5, 0.5)
        assert got == {"g": 5.0}

    def test_heavy_weight_dominates(self, ray_session):
        # one value carries 90% of the mass: it IS the median
        got = _run(["g"] * 3, [1.0, 100.0, 2.0], [1, 50, 1], 0.5)
        assert got == {"g": 100.0}
