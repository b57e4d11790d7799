"""Pivot / crosstab (pipelines/pivot.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(t, values, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.pivot import pivot_counts_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        pivot_counts_pipeline(ds, group_col="g", pivot_col="c", values=values)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )


class TestPivot:
    def test_matches_bruteforce_and_layout(self, ray_session):
        rng = np.random.default_rng(3)
        n = 5000
        t = pa.table(
            {
                "g": pa.array(rng.choice(["a", "b", "c", "d"], n).tolist()),
                "c": pa.array(rng.choice(["x", "y", "z"], n, p=[0.6, 0.3, 0.1]).tolist()),
            }
        )
        df = _run(t, ["x", "y", "z"]).set_index("g")
        g = t["g"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        for grp in "abcd":
            for cat in "xyz":
                assert df.loc[grp, cat] == int(((g == grp) & (c == cat)).sum())
        df2 = _run(t, ["x", "y", "z"], repartition=11).set_index("g")
        assert (df.values == df2.loc[df.index].values).all()

    def test_unlisted_categories_ignored_and_zero_fill(self, ray_session):
        t = pa.table(
            {
                "g": pa.array(["a", "a", "b", "b"]),
                "c": pa.array(["x", "other", "x", "x"]),
            }
        )
        df = _run(t, ["x", "y"]).set_index("g")
        assert df.loc["a", "x"] == 1 and df.loc["a", "y"] == 0  # 'other' dropped
        assert df.loc["b", "x"] == 2 and df.loc["b", "y"] == 0
