"""Spearman rho, exact KS, gaps-and-islands streaks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _midranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    ranks = np.empty(v.size, dtype=np.float64)
    sv = v[order]
    i, r = 0, 1
    while i < sv.size:
        j = i
        while j + 1 < sv.size and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (r + r + (j - i)) / 2.0
        r += j - i + 1
        i = j + 1
    return ranks


class TestSpearman:
    def _run(self, x, y, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import spearman_rho_pipeline

        t = pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return spearman_rho_pipeline(ds, x_col="x", y_col="y").to_pandas()

    def test_matches_rank_pearson_with_ties(self, ray_session):
        rng = np.random.default_rng(17)
        x = rng.integers(0, 40, 1200).astype(np.int64)  # heavy ties
        y = (x * 2 + rng.integers(0, 30, 1200)).astype(np.int64)
        df = self._run(x, y, repartition=7)
        rx, ry = _midranks(x), _midranks(y)
        want = np.corrcoef(rx, ry)[0, 1]
        assert df.n.iloc[0] == 1200
        assert abs(df.rho.iloc[0] - want) < 1e-12
        df2 = self._run(x, y, repartition=3)
        assert df.rho.iloc[0] == df2.rho.iloc[0]  # bit-identical across layouts

    def test_perfect_monotone_is_one(self, ray_session):
        x = np.arange(500, dtype=np.int64)
        y = (x * x).astype(np.int64)  # nonlinear but monotone
        df = self._run(x, y)
        assert abs(df.rho.iloc[0] - 1.0) < 1e-14

    def test_constant_column_zero(self, ray_session):
        x = np.arange(100, dtype=np.int64)
        y = np.full(100, 5, dtype=np.int64)
        assert self._run(x, y).rho.iloc[0] == 0.0


class TestKSExact:
    def _run(self, xa, xb, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import ks_exact_pipeline

        g = ["A"] * len(xa) + ["B"] * len(xb)
        t = pa.table(
            {"g": pa.array(g), "x": pa.array(np.concatenate([xa, xb]), pa.int64())}
        )
        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return ks_exact_pipeline(
            ds, group_col="g", value_col="x", group_a="A", group_b="B"
        ).to_pandas()

    def test_matches_cdf_reference(self, ray_session):
        rng = np.random.default_rng(23)
        xa = rng.integers(0, 100, 700).astype(np.int64)
        xb = (rng.integers(0, 100, 450) + 18).astype(np.int64)
        df = self._run(xa, xb, repartition=9)
        vs = np.unique(np.concatenate([xa, xb]))
        c1 = np.searchsorted(np.sort(xa), vs, side="right")
        c2 = np.searchsorted(np.sort(xb), vs, side="right")
        dn = np.abs(c1 * len(xb) - c2 * len(xa)).max()
        assert df.d_num.iloc[0] == dn
        assert df.d_stat.iloc[0] == float(dn) / float(len(xa) * len(xb))

    def test_disjoint_supports_give_one(self, ray_session):
        xa = np.arange(0, 50, dtype=np.int64)
        xb = np.arange(100, 160, dtype=np.int64)
        df = self._run(xa, xb)
        assert df.d_stat.iloc[0] == 1.0

    def test_identical_samples_give_zero(self, ray_session):
        xa = np.arange(0, 80, dtype=np.int64)
        df = self._run(xa, xa.copy())
        assert df.d_stat.iloc[0] == 0.0


class TestLongestStreak:
    def _run(self, keys, days, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import longest_streak_pipeline

        t = pa.table(
            {"k": pa.array(keys, pa.int64()), "day": pa.array(days, pa.int64())}
        )
        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return (
            longest_streak_pipeline(ds, key_col="k", day_col="day")
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )

    def test_handcrafted_islands(self, ray_session):
        # user 1: days 1,2,3,7,8 -> longest 3, active 5 (dup day 2 collapses)
        # user 2: days 10 -> longest 1, active 1
        keys = [1, 1, 1, 1, 1, 1, 2]
        days = [1, 2, 2, 3, 7, 8, 10]
        df = self._run(keys, days, repartition=4)
        assert df.key.tolist() == [1, 2]
        assert df.n_active_days.tolist() == [5, 1]
        assert df.longest_streak.tolist() == [3, 1]

    def test_random_vs_python_reference(self, ray_session):
        rng = np.random.default_rng(31)
        keys = rng.integers(0, 40, 3000).astype(np.int64)
        days = rng.integers(0, 60, 3000).astype(np.int64)
        df = self._run(keys, days, repartition=11)
        ref = {}
        for k in np.unique(keys):
            ds_ = np.unique(days[keys == k])
            runs, cur = [], 1
            for a, b in zip(ds_[:-1], ds_[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            ref[int(k)] = (len(ds_), max(runs))
        assert df.key.tolist() == sorted(ref)
        for _, row in df.iterrows():
            na, ls = ref[int(row.key)]
            assert row.n_active_days == na and row.longest_streak == ls


class TestGroupedGini:
    def _run(self, g, v, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.inequality import grouped_value_gini_pipeline

        t = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return (
            grouped_value_gini_pipeline(ds, group_col="g", value_col="v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    @staticmethod
    def _ref(v):
        xs = sorted(int(x) for x in v)
        n = len(xs)
        total = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        return (
            float(2 * six - (n + 1) * total) / float(n * total)
            if n and total
            else 0.0
        )

    def test_matches_reference_and_layout(self, ray_session):
        rng = np.random.default_rng(13)
        g = rng.choice(["a", "b", "c"], 3000).tolist()
        v = rng.integers(0, 5000, 3000).astype(np.int64)
        df = self._run(g, v, repartition=9).set_index("g")
        ga = np.array(g)
        for grp in ("a", "b", "c"):
            assert df.loc[grp].gini == self._ref(v[ga == grp])
        df2 = self._run(g, v, repartition=2).set_index("g")
        assert (df.values == df2.loc[df.index].values).all()

    def test_equality_and_concentration_extremes(self, ray_session):
        g = ["eq"] * 50 + ["conc"] * 50
        v = [7] * 50 + [0] * 49 + [1000]
        df = self._run(g, v).set_index("g")
        assert df.loc["eq"].gini == 0.0
        assert abs(df.loc["conc"].gini - (1.0 - 1.0 / 50)) < 1e-12


class TestWelchAnova:
    def test_welch_matches_reference(self, ray_session):
        import math

        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import welch_t_pipeline

        rng = np.random.default_rng(19)
        xa = rng.integers(0, 200, 300).astype(np.int64)
        xb = (rng.integers(0, 120, 500) + 40).astype(np.int64)
        g = ["A"] * 300 + ["B"] * 500 + ["C"] * 10
        x = np.concatenate([xa, xb, np.zeros(10, np.int64)])
        t = pa.table({"g": pa.array(g), "x": pa.array(x)})
        df = welch_t_pipeline(
            rd.from_arrow(t).repartition(6),
            group_col="g",
            value_col="x",
            group_a="A",
            group_b="B",
        ).to_pandas()
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        qa, qb = va / xa.size, vb / xb.size
        t_ref = (xa.mean() - xb.mean()) / math.sqrt(qa + qb)
        df_ref = (qa + qb) ** 2 / (qa**2 / (xa.size - 1) + qb**2 / (xb.size - 1))
        assert df.n1.iloc[0] == 300 and df.n2.iloc[0] == 500
        assert abs(df.t_stat.iloc[0] - t_ref) < 1e-10
        assert abs(df["df"].iloc[0] - df_ref) < 1e-7

    def test_anova_matches_reference(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import anova_f_pipeline

        rng = np.random.default_rng(29)
        groups = {g: rng.integers(0, 100, 150 + 30 * i).astype(np.int64) + 10 * i
                  for i, g in enumerate(["a", "b", "c", "d"])}
        g = sum(([k] * len(v) for k, v in groups.items()), [])
        x = np.concatenate(list(groups.values()))
        t = pa.table({"g": pa.array(g), "x": pa.array(x)})
        df = anova_f_pipeline(
            rd.from_arrow(t).repartition(5), group_col="g", value_col="x"
        ).to_pandas()
        grand = x.mean()
        ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
        ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
        f_ref = (ssb / 3) / (ssw / (x.size - 4))
        assert df.k.iloc[0] == 4 and df.n.iloc[0] == x.size
        assert abs(df.f_stat.iloc[0] - f_ref) < 1e-9

    def test_welch_degenerate_zero(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import welch_t_pipeline

        t = pa.table({"g": pa.array(["A", "B"]), "x": pa.array([1, 2], pa.int64())})
        df = welch_t_pipeline(
            rd.from_arrow(t), group_col="g", value_col="x", group_a="A", group_b="B"
        ).to_pandas()
        assert df.t_stat.iloc[0] == 0.0 and df["df"].iloc[0] == 0.0


class TestGroupCountCosine:
    def test_matches_numpy_reference(self, ray_session):
        import math

        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.setsim import group_count_cosine_pipeline

        rng = np.random.default_rng(37)
        vocab = [f"t{i}" for i in range(60)]
        rows_g, rows_t = [], []
        for g, bias in (("a", 0), ("b", 20), ("c", 40)):
            for _ in range(2000):
                rows_g.append(g)
                rows_t.append(vocab[(int(rng.integers(0, 30)) + bias) % 60])
        t = pa.table({"g": pa.array(rows_g), "tok": pa.array(rows_t)})
        df = (
            group_count_cosine_pipeline(
                rd.from_arrow(t).repartition(7), group_col="g", token_col="tok"
            )
            .to_pandas()
            .sort_values(["g_a", "g_b"])
            .reset_index(drop=True)
        )
        import collections

        vecs = {}
        for g in ("a", "b", "c"):
            cnt = collections.Counter(
                tt for gg, tt in zip(rows_g, rows_t) if gg == g
            )
            vecs[g] = np.array([cnt.get(v, 0) for v in vocab], dtype=np.int64)
        got = {(r.g_a, r.g_b): (r.dot, r.cos) for r in df.itertuples()}
        for a, b in (("a", "b"), ("a", "c"), ("b", "c")):
            dot = int(vecs[a] @ vecs[b])
            cos = float(dot) / (
                math.sqrt(float(vecs[a] @ vecs[a]))
                * math.sqrt(float(vecs[b] @ vecs[b]))
            )
            assert got[(a, b)][0] == dot
            assert got[(a, b)][1] == cos

    def test_disjoint_vocabularies_zero(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.setsim import group_count_cosine_pipeline

        t = pa.table(
            {
                "g": pa.array(["a"] * 5 + ["b"] * 5),
                "tok": pa.array([f"x{i}" for i in range(5)] + [f"y{i}" for i in range(5)]),
            }
        )
        df = group_count_cosine_pipeline(
            rd.from_arrow(t), group_col="g", token_col="tok"
        ).to_pandas()
        assert df.empty or df["dot"].tolist() == [0] or df["cos"].tolist() == [0.0]


class TestPSI:
    def _run(self, ref, cur):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.drift import psi_pipeline

        rt = pa.table({"x": pa.array(ref, pa.int64())})
        ct = pa.table({"x": pa.array(cur, pa.int64())})
        return psi_pipeline(
            rd.from_arrow(rt).repartition(4),
            rd.from_arrow(ct).repartition(3),
            value_col="x",
        ).to_pandas()

    def test_identical_distribution_is_zero(self, ray_session):
        rng = np.random.default_rng(43)
        x = rng.integers(0, 1000, 4000).astype(np.int64)
        df = self._run(x, x.copy())
        assert df.psi.iloc[0] == 0.0

    def test_shift_positive_and_matches_reference(self, ray_session):
        import math

        rng = np.random.default_rng(47)
        ref = rng.integers(0, 1000, 5000).astype(np.int64)
        cur = (rng.integers(0, 1000, 3000) + 250).astype(np.int64)
        df = self._run(ref, cur)
        edges = np.sort(ref)[
            [int(math.floor(q / 10 * (ref.size - 1))) for q in range(1, 10)]
        ]
        rb = np.searchsorted(edges, ref, side="left")
        cb = np.searchsorted(edges, cur, side="left")
        psi = 0.0
        for i in range(10):
            cr, cc = int((rb == i).sum()), int((cb == i).sum())
            if cr == 0 or cc == 0:
                continue
            p = float(cr) / float(ref.size)
            q = float(cc) / float(cur.size)
            psi += (p - q) * math.log(p / q)
        assert df.psi.iloc[0] == psi
        assert psi > 0.1


class TestActivitySeries:
    def test_rolling_median_vs_pandas(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.timeseries import (
            US_PER_DAY,
            rolling_median_daily_pipeline,
        )

        rng = np.random.default_rng(53)
        days = rng.choice(np.arange(100, 140), 2000, replace=True)
        ts = days.astype(np.int64) * US_PER_DAY + rng.integers(
            0, US_PER_DAY, 2000
        )
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
        df = (
            rolling_median_daily_pipeline(
                rd.from_arrow(t).repartition(6), ts_col="ts"
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        import pandas as pd

        cnt = pd.Series(0, index=np.arange(100, 140))
        vc = pd.Series(days).value_counts()
        cnt.loc[vc.index] = vc.values
        ref = cnt.rolling(7, min_periods=1).median()
        assert df.day.tolist() == list(range(100, 140))
        assert df.med.tolist() == ref.tolist()

    def test_new_vs_returning_and_cumulative_shapes(self, ray_session):
        # relies on the gate for value-exactness; pin the invariants here:
        # sum(n_new) over days == total distinct users == last cum_users
        import duckdb

        import ddsketch_ruby_ray.queries as q

        sf = "/root/testdata/sf0.001"
        nvr = q.QUERIES["new_vs_returning_daily"](sf).to_pandas()
        cum = q.QUERIES["cumulative_unique_users_daily"](sf).to_pandas()
        con = duckdb.connect()
        users = con.execute(
            f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
        ).fetchone()[0]
        assert nvr.n_new.sum() == users
        assert cum.cum_users.iloc[-1] == users
        assert (cum.n_new.cumsum() == cum.cum_users).all()


class TestSessionTable:
    def test_handcrafted_and_layout(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import session_table_pipeline

        US = 1_000_000
        rows = [
            (1, 0), (1, 100 * US), (1, 4000 * US), (1, 4100 * US),
            (2, 50 * US), (2, 50 * US),  # equal-ts tie: one 2-event session
        ]
        k, us = zip(*rows)
        t = pa.table({"k": pa.array(k, pa.int64()), "ts": pa.array(us, pa.int64())})

        def run(rep):
            return (
                session_table_pipeline(
                    rd.from_arrow(t).repartition(rep), key_col="k", ts_col="ts"
                )
                .to_pandas()
                .sort_values(["k", "session_idx"])
                .reset_index(drop=True)
            )

        df = run(3)
        assert list(map(tuple, df.values)) == [
            (1, 1, 2, 100 * US),
            (1, 2, 2, 100 * US),
            (2, 1, 2, 0),
        ]
        df2 = run(1)
        assert (df.values == df2.values).all()

    def test_random_vs_pandas_reference(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import session_table_pipeline

        rng = np.random.default_rng(61)
        k = rng.integers(0, 20, 1500).astype(np.int64)
        us = rng.integers(0, 10**10, 1500).astype(np.int64)
        t = pa.table({"k": pa.array(k), "ts": pa.array(us)})
        df = (
            session_table_pipeline(
                rd.from_arrow(t).repartition(7), key_col="k", ts_col="ts",
                gap_us=10**8,
            )
            .to_pandas()
            .sort_values(["k", "session_idx"])
            .reset_index(drop=True)
        )
        ref = []
        for kk in np.unique(k):
            ts = np.sort(us[k == kk])
            sid, start, prev, cnt = 1, ts[0], ts[0], 1
            for x in ts[1:]:
                if x - prev > 10**8:
                    ref.append((kk, sid, cnt, prev - start))
                    sid += 1
                    start, cnt = x, 1
                else:
                    cnt += 1
                prev = x
            ref.append((kk, sid, cnt, prev - start))
        assert list(map(tuple, df.values)) == ref


class TestInterpQuantile:
    def test_matches_numpy_type7(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.selection import (
            sketch_exact_interp_quantile_pipeline,
        )

        rng = np.random.default_rng(67)
        g = rng.choice(["a", "b"], 3000)
        x = rng.integers(1, 100_000, 3000).astype(np.int64)
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
        df = (
            sketch_exact_interp_quantile_pipeline(
                rd.from_arrow(t).repartition(6), group_col="g", value_col="x", q=0.9
            )
            .to_pandas()
            .set_index("g")
        )
        for grp in ("a", "b"):
            want = np.percentile(x[g == grp], 90)  # numpy default = type 7
            assert abs(df.loc[grp].interp - want) < 1e-9
            v = np.sort(x[g == grp])
            h = 0.9 * (v.size - 1)
            assert df.loc[grp].lo == float(v[int(np.floor(h))])
            assert df.loc[grp].hi == float(v[min(int(np.floor(h)) + 1, v.size - 1)])

    def test_exact_rank_boundary(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.selection import (
            sketch_exact_interp_quantile_pipeline,
        )

        # n=11, q=0.5 -> h=5.0 exactly: interp == the median value itself
        x = np.arange(1, 12, dtype=np.int64) * 10
        t = pa.table({"g": pa.array(["m"] * 11), "x": pa.array(x)})
        df = sketch_exact_interp_quantile_pipeline(
            rd.from_arrow(t), group_col="g", value_col="x", q=0.5
        ).to_pandas()
        assert df.interp.iloc[0] == 60.0


class TestGroupedKS:
    def test_matches_per_group_reference(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import grouped_ks_exact_pipeline

        rng = np.random.default_rng(71)
        n = 3000
        g = rng.choice(["x", "y", "z"], n)
        sp = rng.choice(["a", "b", "c"], n)  # third split must be ignored
        v = rng.integers(0, 200, n).astype(np.int64)
        v[sp == "b"] += rng.integers(0, 40, (sp == "b").sum())
        t = pa.table(
            {"g": pa.array(g.tolist()), "sp": pa.array(sp.tolist()), "v": pa.array(v)}
        )
        df = (
            grouped_ks_exact_pipeline(
                rd.from_arrow(t).repartition(8),
                group_col="g",
                value_col="v",
                split_col="sp",
                split_a="a",
                split_b="b",
            )
            .to_pandas()
            .set_index("g")
        )
        for grp in ("x", "y", "z"):
            xa = np.sort(v[(g == grp) & (sp == "a")])
            xb = np.sort(v[(g == grp) & (sp == "b")])
            vs = np.unique(np.concatenate([xa, xb]))
            ca = np.searchsorted(xa, vs, side="right")
            cb = np.searchsorted(xb, vs, side="right")
            dn = int(np.abs(ca * xb.size - cb * xa.size).max())
            row = df.loc[grp]
            assert row.n1 == xa.size and row.n2 == xb.size
            assert row.d_num == dn
            assert row.d_stat == float(dn) / float(xa.size * xb.size)
