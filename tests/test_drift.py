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


class TestSketchKS:
    def test_matches_brute_force_on_bucketed_data(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.core.mapping import LogarithmicKeyMapping
        from ddsketch_ruby_ray.pipelines.drift import sketch_ks_pipeline

        rng = np.random.default_rng(3)
        va = rng.lognormal(3.0, 1.0, 4000)
        vb = rng.lognormal(3.4, 1.0, 3000)  # shifted -> real drift
        ta = pa.table({"g": pa.array(["x"] * len(va)), "v": pa.array(va)})
        tb = pa.table({"g": pa.array(["x"] * len(vb)), "v": pa.array(vb)})
        df = (
            sketch_ks_pipeline(
                rd.from_arrow(ta), rd.from_arrow(tb), group_col="g", value_col="v"
            )
            .to_pandas()
        )
        # brute force over the same sketch bucket keys
        m = LogarithmicKeyMapping(relative_accuracy=0.01)
        ka = np.asarray(m.key(va), dtype=np.int64)
        kb = np.asarray(m.key(vb), dtype=np.int64)
        import collections

        ca = collections.Counter(ka.tolist())
        cb = collections.Counter(kb.tolist())
        na, nb = len(va), len(vb)
        cum_a = cum_b = 0
        best = 0
        for k in sorted(set(ca) | set(cb)):
            cum_a += ca.get(k, 0)
            cum_b += cb.get(k, 0)
            best = max(best, abs(cum_a * nb - cum_b * na))
        assert df.ks_num[0] == float(best)
        assert df.ks[0] == float(best) / float(na * nb)
        assert 0.1 < df.ks[0] < 0.4  # a 0.4-sigma lognormal shift is visible

    def test_identical_sides_zero(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.drift import sketch_ks_pipeline

        v = np.arange(1.0, 500.0)
        t = pa.table({"g": pa.array(["k"] * len(v)), "v": pa.array(v)})
        df = sketch_ks_pipeline(
            rd.from_arrow(t), rd.from_arrow(t), group_col="g", value_col="v"
        ).to_pandas()
        assert df.ks.tolist() == [0.0]
