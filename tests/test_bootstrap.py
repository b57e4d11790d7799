"""Poisson bootstrap CI (pipelines/bootstrap.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.core.hashing import hash64_int
from ddsketch_ruby_ray.pipelines.bootstrap import (
    poisson_bootstrap_ci_pipeline,
    poisson_thresholds,
)


def _run(groups, values, ids, parts=4, B=64):
    import ray.data as rd

    tbl = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "x": pa.array(np.asarray(values, np.int64)),
            "id": pa.array(np.asarray(ids, np.int64)),
        }
    )
    df = (
        poisson_bootstrap_ci_pipeline(
            rd.from_arrow(tbl).repartition(parts),
            group_col="g",
            value_col="x",
            id_col="id",
            n_resamples=B,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    return df


class TestPoissonThresholds:
    def test_cdf_values(self):
        th = poisson_thresholds()
        # P(X<=0) = e^-1; P(X<=1) = 2e^-1
        assert th[0] == math.exp(-1.0)
        assert abs(th[1] - 2 * math.exp(-1.0)) < 1e-15
        assert th[-1] > 1.0 - 1e-9  # nearly all mass covered
        assert all(b > a for a, b in zip(th, th[1:]))

    def test_weights_mean_one(self):
        # empirical mean of the derived weights ~ Poisson(1) mean
        ids = np.arange(200_000, dtype=np.int64)
        th = np.array(poisson_thresholds())
        u = hash64_int(ids).astype(np.float64) / float(2**64)
        w = np.searchsorted(th, u, side="right")
        assert abs(w.mean() - 1.0) < 0.01
        assert abs((w == 0).mean() - math.exp(-1.0)) < 0.01


class TestBootstrapCi:
    def test_ci_brackets_mean_and_shrinks(self, ray_session):
        rng = np.random.default_rng(8)
        n = 4000
        x = rng.integers(50, 150, n)
        df = _run(["a"] * n, x, np.arange(n))
        row = df.iloc[0]
        assert row.n == n
        assert row["mean"] == float(int(x.sum())) / float(n)
        assert row.ci_lo <= row["mean"] <= row.ci_hi
        # width ~ O(sd/sqrt(n)): generous 5x bound
        sd = float(np.std(x))
        assert (row.ci_hi - row.ci_lo) < 5.0 * sd / math.sqrt(n)

        small = _run(["a"] * 100, x[:100], np.arange(100))
        assert (small.iloc[0].ci_hi - small.iloc[0].ci_lo) > (
            row.ci_hi - row.ci_lo
        )

    def test_partitioning_invariant(self, ray_session):
        rng = np.random.default_rng(5)
        n = 2000
        g = rng.choice(["a", "b", "c"], n).tolist()
        x = rng.integers(0, 1000, n)
        a = _run(g, x, np.arange(n), parts=2)
        b = _run(g, x, np.arange(n), parts=9)
        assert a.equals(b)  # bit-identical: exact-int partials, same weights

    def test_constant_data_degenerate_ci(self, ray_session):
        df = _run(["g"] * 500, [42] * 500, np.arange(500))
        row = df.iloc[0]
        assert (row["mean"], row.ci_lo, row.ci_hi) == (42.0, 42.0, 42.0)
