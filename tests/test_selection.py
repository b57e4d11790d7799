"""Sketch-guided exact quantile selection (pipelines/selection.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def _run(t, q=0.5, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.selection import sketch_exact_quantile_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        sketch_exact_quantile_pipeline(ds, group_col="g", value_col="v", q=q)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )


def _floor_rank(vals, q):
    s = np.sort(vals)
    return float(s[int(math.floor(q * (len(s) - 1)))])


class TestSketchExactQuantile:
    @pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 0.99, 1.0])
    def test_exact_at_many_quantiles(self, ray_session, q):
        rng = np.random.default_rng(int(q * 100) + 1)
        n = 4000
        t = pa.table(
            {
                "g": pa.array(rng.choice(["x", "y"], n).tolist()),
                "v": pa.array(rng.lognormal(4, 2, n)),  # continuous: all distinct
            }
        )
        df = _run(t, q=q).set_index("g")
        g = t["g"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        col = df.columns[0]
        for grp in ("x", "y"):
            assert df.loc[grp, col] == _floor_rank(v[g == grp], q)  # EXACT

    def test_zero_band_and_layout(self, ray_session):
        # majority zeros: the median rank falls inside the zero band
        v = np.concatenate([np.zeros(60), np.arange(1.0, 41.0)])
        t = pa.table({"g": pa.array(["z"] * 100), "v": pa.array(v)})
        df = _run(t)
        assert df.iloc[0]["exact_p50"] == 0.0
        t2 = pa.table(
            {
                "g": pa.array(["a"] * 101),
                "v": pa.array(np.arange(1.0, 102.0)),
            }
        )
        a = _run(t2)
        b = _run(t2, repartition=7)
        assert a.iloc[0]["exact_p50"] == 51.0  # floor-rank median of 1..101
        assert (a.values == b.values).all()

    def test_rejects_negative_values(self, ray_session):
        t = pa.table({"g": pa.array(["n"] * 4), "v": pa.array([-1.0, 2.0, 3.0, 4.0])})
        with pytest.raises(ValueError, match="positive values only"):
            _run(t)
