"""Weighted sampling without replacement (stages/sampling.py::weighted_sample)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.core.hashing import hash64_int

_TWO64_F = 18446744073709551616.0


def _pri(ids, w, seed):
    h = hash64_int(ids, seed).astype(np.float64)
    return np.log2((h + 1.0) / _TWO64_F) / np.maximum(w.astype(np.float64), 1.0)


def _run(t, k, group_col=None, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.stages.sampling import weighted_sample

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        weighted_sample(ds, id_col="rid", weight_col="w", k=k, seed=9, group_col=group_col)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )


class TestWeightedSample:
    def test_global_matches_bruteforce_and_layout(self, ray_session):
        rng = np.random.default_rng(12)
        n = 2000
        t = pa.table(
            {
                "rid": pa.array(np.arange(n), pa.int64()),
                "g": pa.array(rng.choice(["a", "b"], n).tolist()),
                "w": pa.array(rng.integers(1, 1000, n), pa.int64()),
            }
        )
        df = _run(t, k=25)
        pri = _pri(
            t["rid"].to_numpy(zero_copy_only=False), t["w"].to_numpy(zero_copy_only=False), 9
        )
        want = t["rid"].to_numpy(zero_copy_only=False)[np.argsort(-pri)[:25]]
        assert sorted(df.rid.tolist()) == sorted(want.tolist())
        df2 = _run(t, k=25, repartition=9)
        assert (df.values == df2.values).all()

    def test_per_group_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(5)
        n = 1200
        t = pa.table(
            {
                "rid": pa.array(np.arange(n), pa.int64()),
                "g": pa.array(rng.choice(["x", "y", "z"], n).tolist()),
                "w": pa.array(rng.integers(1, 500, n), pa.int64()),
            }
        )
        df = _run(t, k=7, group_col="g", repartition=6)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        g = t["g"].to_numpy(zero_copy_only=False)
        pri = _pri(rid, t["w"].to_numpy(zero_copy_only=False), 9)
        for grp in ("x", "y", "z"):
            mask = g == grp
            want = rid[mask][np.argsort(-pri[mask])[:7]]
            assert sorted(df[df.g == grp].rid.tolist()) == sorted(want.tolist())

    def test_weights_bias_inclusion(self, ray_session):
        # heavy rows must be sampled far more often than light rows
        n = 4000
        w = np.where(np.arange(n) < n // 2, 1000, 1)  # first half heavy
        t = pa.table(
            {
                "rid": pa.array(np.arange(n), pa.int64()),
                "g": pa.array(["c"] * n),
                "w": pa.array(w, pa.int64()),
            }
        )
        df = _run(t, k=200)
        heavy = (df.rid < n // 2).sum()
        assert heavy > 180  # ~1000:1 weight ratio -> nearly all picks heavy
