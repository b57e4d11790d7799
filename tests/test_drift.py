"""Sketch-histogram drift detection (pipelines/drift.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.core.mapping import LogarithmicKeyMapping


def _side(vals_by_group):
    gs, vs = [], []
    for g, vals in vals_by_group.items():
        gs.extend([g] * len(vals))
        vs.extend(vals)
    return pa.table({"g": pa.array(gs), "v": pa.array(np.asarray(vs, dtype=np.float64))})


def _run(ta, tb, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.drift import sketch_drift_pipeline

    a, b = rd.from_arrow(ta), rd.from_arrow(tb)
    if repartition:
        a, b = a.repartition(repartition), b.repartition(repartition)
    return (
        sketch_drift_pipeline(a, b, group_col="g", value_col="v", alpha=0.01)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )


class TestSketchDrift:
    def test_identical_sides_zero_drift(self, ray_session):
        rng = np.random.default_rng(1)
        t = _side({"x": np.round(rng.lognormal(3, 1, 500)) + 1})
        df = _run(t, t)
        assert df.tvd.tolist() == [0.0]
        assert df.l1_num.tolist() == [0.0]
        assert (df.n_a == df.n_b).all()

    def test_disjoint_ranges_full_drift(self, ray_session):
        ta = _side({"x": np.arange(1.0, 101.0)})
        tb = _side({"x": np.arange(1e6, 1e6 + 100.0)})
        df = _run(ta, tb)
        assert df.tvd.tolist() == [1.0]

    def test_matches_bruteforce_and_layout(self, ray_session):
        rng = np.random.default_rng(8)
        ta = _side(
            {
                "x": np.round(rng.lognormal(3, 1, 800)) + 1,
                "y": np.round(rng.lognormal(4, 0.5, 600)) + 1,
                "only_a": np.arange(1.0, 50.0),
            }
        )
        tb = _side(
            {
                "x": np.round(rng.lognormal(3.2, 1, 700)) + 1,
                "y": np.round(rng.lognormal(4, 0.5, 900)) + 1,
            }
        )
        df = _run(ta, tb)
        assert df.g.tolist() == ["x", "y"]  # both-sides groups only
        mp = LogarithmicKeyMapping(0.01)

        def hist(t, grp):
            g = t["g"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)[g == grp]
            k = np.asarray(mp.key(v), dtype=np.int64)
            keys, counts = np.unique(k, return_counts=True)
            return dict(zip(keys.tolist(), counts.tolist()))

        for grp in ("x", "y"):
            ca, cb = hist(ta, grp), hist(tb, grp)
            n_a, n_b = sum(ca.values()), sum(cb.values())
            l1 = sum(
                abs(ca.get(k, 0) * n_b - cb.get(k, 0) * n_a) for k in set(ca) | set(cb)
            )
            row = df[df.g == grp].iloc[0]
            assert row.l1_num == float(l1)
            assert row.tvd == float(l1) / float(2 * n_a * n_b)
            # TVD really tracks the normalized L1 between the histograms
            brute = 0.5 * sum(
                abs(ca.get(k, 0) / n_a - cb.get(k, 0) / n_b)
                for k in set(ca) | set(cb)
            )
            assert abs(row.tvd - brute) < 1e-12
        df2 = _run(ta, tb, repartition=7)
        assert (df.values == df2.values).all()
