"""Sufficient-statistics correlation aggregate (pipelines/stats.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(t, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.stats import grouped_corr_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        grouped_corr_pipeline(ds, group_col="g", x_col="x", y_col="y")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )


class TestGroupedCorr:
    def test_matches_numpy_and_layout(self, ray_session):
        rng = np.random.default_rng(2)
        n = 3000
        g = rng.choice(["a", "b"], n)
        x = rng.integers(1, 1000, n)
        y = (x * 3 + rng.integers(0, 500, n)).astype(np.int64)  # correlated
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x, pa.int64()), "y": pa.array(y)})
        df = _run(t).set_index("g")
        for grp in ("a", "b"):
            m = g == grp
            want = np.corrcoef(x[m].astype(float), y[m].astype(float))[0, 1]
            assert abs(df.loc[grp].r - want) < 1e-12
            assert df.loc[grp].n == m.sum()
        df2 = _run(t, repartition=9).set_index("g")
        assert (df.values == df2.loc[df.index].values).all()  # bit-identical

    def test_degenerate_variance_is_zero(self, ray_session):
        t = pa.table(
            {
                "g": pa.array(["c"] * 10),
                "x": pa.array([7] * 10, pa.int64()),  # zero variance
                "y": pa.array(list(range(10)), pa.int64()),
            }
        )
        df = _run(t)
        assert df.r.tolist() == [0.0]

    def test_perfect_correlation_and_ols(self, ray_session):
        x = np.arange(1, 101, dtype=np.int64)
        t = pa.table(
            {"g": pa.array(["p"] * 100), "x": pa.array(x), "y": pa.array(x * 5 + 7)}
        )
        df = _run(t, repartition=4)
        assert abs(df.r.iloc[0] - 1.0) < 1e-15
        assert df.slope.iloc[0] == 5.0
        assert abs(df.intercept.iloc[0] - 7.0) < 1e-9


class TestChi2Contingency:
    def _run(self, a, b, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import chi2_contingency_pipeline

        t = pa.table({"a": pa.array(a), "b": pa.array(b)})
        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        out = chi2_contingency_pipeline(ds, a_col="a", b_col="b").to_pandas()
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        a = rng.choice(["x", "y", "z"], 500).tolist()
        b = rng.choice(["p", "q"], 500).tolist()
        df = self._run(a, b, repartition=6)
        from collections import Counter

        obs = Counter(zip(a, b))
        ra, cb, n = Counter(a), Counter(b), len(a)
        assert len(df) == len(obs)
        for row in df.itertuples(index=False):
            o = obs[(row.a, row.b)]
            assert (row.obs, row.rt, row.ct, row.n) == (o, ra[row.a], cb[row.b], n)
            num = (o * n - ra[row.a] * cb[row.b]) ** 2
            den = ra[row.a] * cb[row.b] * n
            assert row.chi2_cell == float(num) / float(den)
        # total chi2 sanity: independent-ish draws give a small statistic
        # (df = (3-1)*(2-1) = 2; anything < 30 is emphatically not extreme)
        assert 0.0 <= df.chi2_cell.sum() < 30.0

    def test_layout_invariance(self, ray_session):
        a = ["x"] * 30 + ["y"] * 70
        b = (["p", "q"] * 50)[:100]
        d1 = self._run(a, b, repartition=1)
        d2 = self._run(a, b, repartition=9)
        assert d1.equals(d2)

    def test_independent_uniform_is_exact_zero(self, ray_session):
        # perfectly balanced table: obs*n == rt*ct in every cell
        a = ["x", "x", "y", "y"] * 25
        b = ["p", "q", "p", "q"] * 25
        df = self._run(a, b)
        assert (df.chi2_cell == 0.0).all()


class TestGroupedGini:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd
        from collections import Counter

        from ddsketch_ruby_ray.pipelines.stats import grouped_gini_pipeline

        rng = np.random.default_rng(29)
        g = rng.integers(0, 8, 400)
        v = rng.choice(["x", "y", "z"], 400)
        t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v)})
        df = (
            grouped_gini_pipeline(rd.from_arrow(t).repartition(5), group_col="g", value_col="v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for row in df.itertuples(index=False):
            counts = Counter(v[g == row.g])
            n = sum(counts.values())
            s2 = sum(c * c for c in counts.values())
            assert (row.n, row.sum_sq) == (n, s2)
            assert row.gini == float(n * n - s2) / float(n * n)

    def test_extremes(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import grouped_gini_pipeline

        # uniform over 4 values -> gini = 1 - 4*(1/4)^2 = 0.75; constant -> 0
        t = pa.table(
            {
                "g": pa.array(["u"] * 40 + ["k"] * 10),
                "v": pa.array((["a", "b", "c", "d"] * 10) + ["only"] * 10),
            }
        )
        df = (
            grouped_gini_pipeline(rd.from_arrow(t), group_col="g", value_col="v")
            .to_pandas()
            .set_index("g")
        )
        assert df.loc["u", "gini"] == 0.75
        assert df.loc["k", "gini"] == 0.0
