"""Exact higher moments + Mann-Whitney U + winsorized mean + degree histogram."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _moments(t, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.stats import grouped_moments_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        grouped_moments_pipeline(ds, group_col="g", value_col="x")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )


def _ref_moments(x: np.ndarray):
    """Ground truth via Python-int power sums (the pipeline's own contract)."""
    xs = [int(v) for v in x]
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(v * v for v in xs)
    s3 = sum(v**3 for v in xs)
    s4 = sum(v**4 for v in xs)
    m2n = n * s2 - s1 * s1
    m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    m4n = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
    mean = float(s1) / float(n)
    m2 = float(m2n) / float(n * n)
    if m2n > 0:
        m3 = float(m3n) / float(n**3)
        m4 = float(m4n) / float(n**4)
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
    else:
        skew = kurt = 0.0
    return mean, m2, skew, kurt


class TestGroupedMoments:
    def test_bit_exact_vs_int_reference_and_layout(self, ray_session):
        rng = np.random.default_rng(7)
        g = rng.choice(["a", "b", "c"], 4000)
        x = rng.integers(-500, 2000, 4000).astype(np.int64)
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
        df = _moments(t).set_index("g")
        for grp in ("a", "b", "c"):
            mean, var, skew, kurt = _ref_moments(x[g == grp])
            row = df.loc[grp]
            assert row["mean"] == mean and row["var_pop"] == var
            assert row["skewness"] == skew and row["kurtosis"] == kurt
        df2 = _moments(t, repartition=11).set_index("g")
        assert (df.values == df2.loc[df.index].values).all()

    def test_limb_sums_exact_past_int64(self, ray_session):
        # values ~1e9: a single block's Σx⁴ ≈ 1e39 overflows int64 ~1e20× —
        # the 16-bit limb lanes must still reassemble the EXACT integer sums
        rng = np.random.default_rng(11)
        x = rng.integers(900_000_000, 1_100_000_000, 3000).astype(np.int64)
        t = pa.table({"g": pa.array(["big"] * 3000), "x": pa.array(x)})
        df = _moments(t, repartition=7)
        mean, var, skew, kurt = _ref_moments(x)
        assert df["mean"].iloc[0] == mean and df["var_pop"].iloc[0] == var
        assert df["skewness"].iloc[0] == skew and df["kurtosis"].iloc[0] == kurt

    def test_constant_group_zeroes(self, ray_session):
        t = pa.table({"g": pa.array(["c"] * 9), "x": pa.array([42] * 9, pa.int64())})
        df = _moments(t)
        assert df["var_pop"].iloc[0] == 0.0
        assert df["skewness"].iloc[0] == 0.0 and df["kurtosis"].iloc[0] == 0.0


def _mwu(t, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.stats import mannwhitney_u_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return mannwhitney_u_pipeline(
        ds, group_col="g", value_col="x", group_a="A", group_b="B"
    ).to_pandas()


def _ref_mwu(xa: np.ndarray, xb: np.ndarray):
    """Midrank U + tie-corrected z via direct rank computation."""
    allv = np.concatenate([xa, xb]).astype(np.float64)
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(allv.size, dtype=np.float64)
    sv = allv[order]
    i = 0
    r = 1
    while i < sv.size:
        j = i
        while j + 1 < sv.size and sv[j + 1] == sv[i]:
            j += 1
        mid = (r + (r + (j - i))) / 2.0
        ranks[order[i : j + 1]] = mid
        r += j - i + 1
        i = j + 1
    n1, n2 = xa.size, xb.size
    n = n1 + n2
    r1 = ranks[: xa.size].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    _, counts = np.unique(allv, return_counts=True)
    tt = float((counts.astype(object) ** 3 - counts.astype(object)).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - tt / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else 0.0
    return u1, z


class TestMannWhitney:
    def test_matches_rank_reference_with_ties(self, ray_session):
        rng = np.random.default_rng(3)
        xa = rng.integers(0, 50, 400).astype(np.int64)  # heavy ties
        xb = (rng.integers(0, 50, 300) + 5).astype(np.int64)  # shifted
        g = ["A"] * 400 + ["B"] * 300
        t = pa.table({"g": pa.array(g), "x": pa.array(np.concatenate([xa, xb]))})
        df = _mwu(t, repartition=6)
        u1, z = _ref_mwu(xa, xb)
        assert df.n1.iloc[0] == 400 and df.n2.iloc[0] == 300
        assert df.u1_x2.iloc[0] == int(round(2 * u1))
        assert abs(df.z_stat.iloc[0] - z) < 1e-12

    def test_other_groups_ignored_and_layout_invariant(self, ray_session):
        rng = np.random.default_rng(5)
        g = rng.choice(["A", "B", "C"], 900)
        x = rng.integers(0, 30, 900).astype(np.int64)
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
        a, b = _mwu(t), _mwu(t, repartition=13)
        assert (a.values == b.values).all()
        u1, z = _ref_mwu(x[g == "A"], x[g == "B"])
        assert a.u1_x2.iloc[0] == int(round(2 * u1))
        assert abs(a.z_stat.iloc[0] - z) < 1e-12

    def test_constant_values_zero_z(self, ray_session):
        t = pa.table(
            {"g": pa.array(["A"] * 5 + ["B"] * 5), "x": pa.array([7] * 10, pa.int64())}
        )
        df = _mwu(t)
        assert df.z_stat.iloc[0] == 0.0


class TestWinsorizedMean:
    def test_matches_floor_rank_reference(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.robust import winsorized_mean_pipeline

        rng = np.random.default_rng(9)
        g = rng.choice(["a", "b"], 2500)
        x = rng.integers(1, 10_000, 2500).astype(np.int64)
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
        df = (
            winsorized_mean_pipeline(
                rd.from_arrow(t).repartition(8), group_col="g", value_col="x"
            )
            .to_pandas()
            .set_index("g")
        )
        for grp in ("a", "b"):
            v = np.sort(x[g == grp])
            lo = v[int(math.floor(0.1 * (v.size - 1)))]
            hi = v[int(math.floor(0.9 * (v.size - 1)))]
            w = np.clip(x[g == grp], lo, hi)
            assert df.loc[grp].n == v.size
            assert df.loc[grp].win_sum == int(w.sum())
            assert df.loc[grp].win_mean == float(int(w.sum())) / float(v.size)


class TestDegreeHistogram:
    def test_distinct_neighbor_counts(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.graph import degree_histogram_pipeline

        # 0->{1,2} (dup edge collapses), 1->{2}, 3->{0,1,2}
        src = [0, 0, 0, 1, 3, 3, 3]
        dst = [1, 2, 2, 2, 0, 1, 2]
        t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        df = (
            degree_histogram_pipeline(rd.from_arrow(t).repartition(3))
            .to_pandas()
            .sort_values("degree")
            .reset_index(drop=True)
        )
        # degrees: node0=2, node1=1, node3=3 -> hist {1:1, 2:1, 3:1}
        assert df.degree.tolist() == [1, 2, 3]
        assert df.n_nodes.tolist() == [1, 1, 1]

    def test_random_vs_python_reference(self, ray_session):
        import ray.data as rd
        from collections import Counter

        from ddsketch_ruby_ray.pipelines.graph import degree_histogram_pipeline

        rng = np.random.default_rng(4)
        src = rng.integers(0, 200, 5000).astype(np.int64)
        dst = rng.integers(0, 200, 5000).astype(np.int64)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        df = (
            degree_histogram_pipeline(rd.from_arrow(t).repartition(9))
            .to_pandas()
            .sort_values("degree")
            .reset_index(drop=True)
        )
        deg = Counter(s for s, _ in {(s, d) for s, d in zip(src.tolist(), dst.tolist())})
        hist = Counter(deg.values())
        assert df.degree.tolist() == sorted(hist)
        assert df.n_nodes.tolist() == [hist[d] for d in sorted(hist)]
