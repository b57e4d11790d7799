"""Regressions for the round-4 code-review findings."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TestFoldNullKeys:
    def test_null_bearing_blocks_route_big_keys_consistently(self, ray_session):
        """A null in one block must not flip other keys' partition (the
        float64 fallback rounded keys >= 2^53)."""
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.fold import partitioned_group_sum

        big = (1 << 53) + 1
        t1 = pa.table(
            {"k": pa.array([big, 7], pa.int64()), "v": pa.array([1, 1], pa.int64())}
        )
        t2 = pa.table(
            {"k": pa.array([big, None], pa.int64()), "v": pa.array([2, 5], pa.int64())}
        )
        ds = rd.from_arrow([t1, t2])  # two blocks: null-free and null-bearing
        df = (
            partitioned_group_sum(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        row = df[df.k == big]
        assert len(row) == 1, f"key {big} split across partitions: {df}"
        assert row["sum(v)"].iloc[0] == 3


class TestMWUHeavyTies:
    def test_tie_cube_past_int64(self, ray_session):
        """2.5M-fold tie: c^3 > 2^63 — the tie correction must not wrap."""
        import math

        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.stats import mannwhitney_u_pipeline

        n_tie = 2_500_000
        g = np.array(["A"] * (n_tie // 2) + ["B"] * (n_tie - n_tie // 2 + 50))
        x = np.concatenate(
            [np.full(n_tie, 5, np.int64), np.arange(50, dtype=np.int64) + 100]
        )
        t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
        df = mannwhitney_u_pipeline(
            rd.from_arrow(t).repartition(4),
            group_col="g",
            value_col="x",
            group_a="A",
            group_b="B",
        ).to_pandas()
        n1 = n_tie // 2
        n2 = n_tie - n1 + 50
        n = n1 + n2
        # exact reference in python ints
        c_tie, c_each = n_tie, 1
        t_ties = (c_tie**3 - c_tie) + 50 * (c_each**3 - c_each)
        r1x2 = n1 * (2 * 0 + c_tie + 1)  # all of A sits in the tie block
        u1x2 = r1x2 - n1 * (n1 + 1)
        var = float(n1 * n2) / 12.0 * (
            float(n + 1) - float(t_ties) / float(n * (n - 1))
        )
        z = float(u1x2 - n1 * n2) / 2.0 / math.sqrt(var)
        assert df.u1_x2.iloc[0] == u1x2
        assert df.z_stat.iloc[0] == z


class TestCosinePairKeyCollision:
    def test_unequal_length_group_names(self, ray_session):
        """('a','bb') and ('ab','b') must remain DISTINCT pairs (the old
        numpy string-join key collided on trailing-NUL padding)."""
        import math

        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.setsim import group_count_cosine_pipeline

        rows_g, rows_t = [], []
        for g, toks in (
            ("a", ["t1"] * 3 + ["t2"]),
            ("ab", ["t1"] * 2 + ["t3"]),
            ("b", ["t1"] * 5),
            ("bb", ["t1", "t2", "t2"]),
        ):
            rows_g += [g] * len(toks)
            rows_t += toks
        t = pa.table({"g": pa.array(rows_g), "tok": pa.array(rows_t)})
        df = group_count_cosine_pipeline(
            rd.from_arrow(t).repartition(3), group_col="g", token_col="tok"
        ).to_pandas()
        got = {(r.g_a, r.g_b): r.dot for r in df.itertuples()}
        assert len(got) == 6  # all C(4,2) pairs present
        # python reference dots
        import collections

        vecs = {}
        for g in ("a", "ab", "b", "bb"):
            cnt = collections.Counter(
                tt for gg, tt in zip(rows_g, rows_t) if gg == g
            )
            vecs[g] = cnt
        for (ga, gb), dot in got.items():
            want = sum(vecs[ga][tok] * vecs[gb][tok] for tok in vecs[ga])
            assert dot == want, (ga, gb, dot, want)
