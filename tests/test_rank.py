"""DDSketch rank-transform tests (pipelines/rank.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TestRankTransform:
    def _run(self, t, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.rank import ddsketch_rank_pipeline

        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return (
            ddsketch_rank_pipeline(
                ds, group_col="g", value_col="v", carry_cols=["rid"], alpha=0.01
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )

    def test_matches_bucket_bruteforce_and_layout(self, ray_session):
        rng = np.random.default_rng(23)
        n = 2000
        t = pa.table(
            {
                "rid": pa.array(np.arange(n), pa.int64()),
                "g": pa.array(rng.choice(["x", "y"], n).tolist()),
                "v": pa.array(rng.lognormal(5, 2, n)),
            }
        )
        df = self._run(t)
        # brute-force: same-group values in strictly lower buckets
        from ddsketch_ruby_ray.core.mapping import LogarithmicKeyMapping

        mp = LogarithmicKeyMapping(0.01)
        g = t["g"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        k = np.asarray(mp.key(v), dtype=np.int64)
        for grp in ("x", "y"):
            mask = g == grp
            kk = k[mask]
            want = (kk[None, :] < kk[:, None]).sum(axis=1)
            got = df[df.g == grp].sort_values("rid")["rank_lt"].to_numpy()
            order = np.argsort(t["rid"].to_numpy(zero_copy_only=False)[mask])
            assert (got == want[order]).all()
        df2 = self._run(t, repartition=7)
        assert (df.values == df2.values).all()

    def test_rank_is_monotone_in_value(self, ray_session):
        t = pa.table(
            {
                "rid": pa.array([0, 1, 2, 3], pa.int64()),
                "g": pa.array(["a"] * 4),
                "v": pa.array([1.0, 10.0, 100.0, 1000.0]),
            }
        )
        df = self._run(t)
        assert df.rank_lt.tolist() == [0, 1, 2, 3]
