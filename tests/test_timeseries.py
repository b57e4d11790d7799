"""Daily-count autocorrelation (pipelines/timeseries.py) vs brute force."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.timeseries import (
    US_PER_DAY,
    daily_count_autocorr_pipeline,
)


def _brute(days, lag):
    vals, cnt = np.unique(np.asarray(days, np.int64), return_counts=True)
    lut = dict(zip(vals.tolist(), cnt.tolist()))
    pairs = [(lut[d], lut[d + lag]) for d in vals.tolist() if d + lag in lut]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    r = (
        float(n * sxy - sx * sy) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
        if d1 > 0 and d2 > 0
        else 0.0
    )
    return n, r


def _run(days, lag=1):
    import ray.data as rd

    us = np.asarray(days, np.int64) * US_PER_DAY + 12345
    tbl = pa.table({"ts": pa.array(us, pa.int64())})
    df = daily_count_autocorr_pipeline(
        rd.from_arrow(tbl).repartition(4), ts_col="ts", lag=lag
    ).to_pandas()
    return int(df.n_pairs[0]), float(df.r[0])


class TestDailyAutocorr:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(4)
        days = rng.integers(0, 60, 5000)
        assert _run(days) == _brute(days, 1)

    def test_gap_days_drop_pairs(self, ray_session):
        # days 0,1,2 then 10,11: pairs (0,1),(1,2),(10,11) only
        days = [0] * 3 + [1] * 5 + [2] * 2 + [10] * 4 + [11] * 4
        n, r = _run(days)
        assert n == 3
        assert r == _brute(days, 1)[1]

    def test_constant_series_r_zero(self, ray_session):
        days = [0, 1, 2, 3] * 7  # every day the same count
        n, r = _run(days)
        assert (n, r) == (3, 0.0)
