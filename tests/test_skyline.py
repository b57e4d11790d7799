"""Pareto skyline (pipelines/skyline.py) vs O(n^2) brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.skyline import skyline_pipeline


def _brute(rows):
    """rows: list of (id, x, y); keep rows not dominated (min x, max y)."""
    out = []
    for rid, x, y in rows:
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for _, x2, y2 in rows
        )
        if not dominated:
            out.append((rid, x, y))
    return sorted(out)


def _run(rows):
    import ray.data as rd

    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "x": pa.array([r[1] for r in rows], pa.float64()),
            "y": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    df = skyline_pipeline(
        rd.from_arrow(tbl).repartition(5), minimize_col="x", maximize_col="y"
    ).to_pandas()
    if df.empty:
        return []
    return sorted(zip(df.id, df.x, df.y))


class TestSkyline:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(3)
        n = 3000
        # few distinct values -> plenty of ties on both dimensions
        rows = [
            (i, float(x), int(y))
            for i, (x, y) in enumerate(
                zip(rng.integers(0, 50, n), rng.integers(0, 50, n))
            )
        ]
        assert _run(rows) == _brute(rows)

    def test_equal_twins_both_kept(self, ray_session):
        rows = [(1, 1.0, 10), (2, 1.0, 10), (3, 5.0, 5)]
        assert _run(rows) == [(1, 1.0, 10), (2, 1.0, 10)]

    def test_strict_dominance_on_one_axis(self, ray_session):
        # same x, higher y dominates; same y, lower x dominates
        rows = [(1, 1.0, 10), (2, 1.0, 9), (3, 2.0, 10)]
        assert _run(rows) == [(1, 1.0, 10)]

    def test_empty(self, ray_session):
        assert _run([]) == []
