"""Histogram export (pipelines/histogram.py) + bottom-k sample (stages/sampling.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.core.hashing import hash64_int
from ddsketch_ruby_ray.core.mapping import LogarithmicKeyMapping


def _table(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "rid": pa.array(np.arange(n), pa.int64()),
            "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "v": pa.array(np.round(rng.lognormal(4, 1, n)) + 1.0),
        }
    )


class TestHistogramExport:
    def _run(self, t, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.histogram import sketch_histogram_pipeline

        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return (
            sketch_histogram_pipeline(ds, group_col="g", value_col="v", alpha=0.01)
            .to_pandas()
            .sort_values(["g", "k"])
            .reset_index(drop=True)
        )

    def test_matches_direct_bucketing_and_layout(self, ray_session):
        t = _table()
        df = self._run(t)
        mp = LogarithmicKeyMapping(0.01)
        g = t["g"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        k = np.asarray(mp.key(v), dtype=np.int64)
        for grp in ("a", "b", "c"):
            kk = k[g == grp]
            keys, counts = np.unique(kk, return_counts=True)
            sel = df[df.g == grp]
            assert sel.k.tolist() == keys.tolist()
            assert sel.cnt.tolist() == counts.astype(float).tolist()
        # total mass is preserved: sum of bins == row count
        assert df.cnt.sum() == t.num_rows
        df2 = self._run(t, repartition=11)
        assert (df.values == df2.values).all()


class TestBottomKSample:
    def _run(self, t, group_col=None, k=16, repartition=None):
        import ray.data as rd

        from ddsketch_ruby_ray.stages.sampling import bottomk_sample

        ds = rd.from_arrow(t)
        if repartition:
            ds = ds.repartition(repartition)
        return (
            bottomk_sample(ds, id_col="rid", k=k, seed=3, group_col=group_col)
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )

    def test_global_bottomk_and_layout(self, ray_session):
        t = _table(n=1200, seed=9)
        df = self._run(t, k=16)
        h = hash64_int(t["rid"].to_numpy(zero_copy_only=False), 3)
        want = t["rid"].to_numpy(zero_copy_only=False)[np.argsort(h)[:16]]
        assert sorted(df.rid.tolist()) == sorted(want.tolist())
        assert list(df.columns) == ["rid", "g", "v"]  # helper column dropped
        df2 = self._run(t, k=16, repartition=13)
        assert (df.values == df2.values).all()

    def test_per_group_bottomk(self, ray_session):
        t = _table(n=1500, seed=2)
        df = self._run(t, group_col="g", k=5, repartition=7)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        g = t["g"].to_numpy(zero_copy_only=False)
        h = hash64_int(rid, 3)
        for grp in ("a", "b", "c"):
            mask = g == grp
            want = rid[mask][np.argsort(h[mask])[:5]]
            got = df[df.g == grp].rid.tolist()
            assert sorted(got) == sorted(want.tolist())

    def test_k_larger_than_group(self, ray_session):
        t = pa.table(
            {
                "rid": pa.array([0, 1, 2], pa.int64()),
                "g": pa.array(["a", "a", "b"]),
                "v": pa.array([1.0, 2.0, 3.0]),
            }
        )
        df = self._run(t, group_col="g", k=10)
        assert len(df) == 3  # every row survives when k exceeds group size
