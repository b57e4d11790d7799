"""MAD outlier pipeline tests (pipelines/robust.py).

The sf0.01 oracle pins the full composition; these pin the floor-rank
median convention, the MAD=0 edge case, and a brute-force random fuzz.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(groups, values, k=3, blocks=1):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.robust import mad_outlier_pipeline

    t = pa.table(
        {
            "rid": pa.array(range(len(values)), pa.int64()),
            "g": pa.array(groups),
            "x": pa.array(np.asarray(values, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    df = mad_outlier_pipeline(
        ds, group_col="g", value_col="x", k=k, carry_cols=["rid"]
    ).to_pandas()
    if df.empty:
        return df
    return df.sort_values("rid").reset_index(drop=True)


def _brute(groups, values, k=3):
    """floor-rank median convention: sorted[floor((n-1)/2)]."""
    import collections

    by_g = collections.defaultdict(list)
    for i, (g, v) in enumerate(zip(groups, values)):
        by_g[g].append((i, int(v)))
    flagged = {}
    for g, rows in by_g.items():
        xs = sorted(v for _, v in rows)
        med = xs[(len(xs) - 1) // 2]
        devs = sorted(abs(v - med) for _, v in rows)
        mad = devs[(len(devs) - 1) // 2]
        for i, v in rows:
            d = abs(v - med)
            if d > k * mad:
                flagged[i] = (d, mad)
    return flagged


def test_matches_bruteforce_fuzz(ray_session):
    rng = np.random.default_rng(17)
    for trial in range(3):
        n = int(rng.integers(50, 400))
        groups = [f"g{int(x)}" for x in rng.integers(0, 4, size=n)]
        # lognormal-ish ints with injected outliers
        vals = np.exp(rng.normal(5, 1, size=n)).astype(np.int64) + 1
        out_idx = rng.choice(n, size=max(1, n // 30), replace=False)
        vals[out_idx] *= 50
        df = _run(groups, vals, blocks=1 + trial * 3)
        want = _brute(groups, vals)
        got = {int(r.rid): (int(r.dev), int(r.mad)) for r in df.itertuples()}
        assert got == want


def test_mad_zero_flags_any_deviation(ray_session):
    # >half the rows share the median -> MAD 0 -> every off-median row flags
    groups = ["a"] * 7
    vals = [10, 10, 10, 10, 11, 9, 42]
    df = _run(groups, vals, k=3)
    assert sorted(df["rid"].tolist()) == [4, 5, 6]
    assert (df["mad"] == 0).all()


def test_no_outliers_empty_result(ray_session):
    groups = ["a"] * 5
    vals = [10, 11, 12, 13, 14]
    df = _run(groups, vals, k=3)
    assert len(df) == 0


class TestTrimmedMean:
    def _run(self, groups, vals, lo=0.1, hi=0.9, blocks=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.robust import trimmed_mean_pipeline

        t = pa.table(
            {"g": pa.array(groups), "v": pa.array(np.asarray(vals, np.int64))}
        )
        ds = rd.from_arrow(t)
        if blocks:
            ds = ds.repartition(blocks)
        out = trimmed_mean_pipeline(ds, group_col="g", value_col="v", lo_q=lo, hi_q=hi)
        return out.to_pandas().sort_values("g").reset_index(drop=True)

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(19)
        groups = rng.choice(["a", "b"], 400).tolist()
        vals = rng.integers(1, 10_000, 400)
        df = self._run(groups, vals, blocks=5)
        garr = np.array(groups)
        for row in df.itertuples(index=False):
            v = np.sort(vals[garr == row.g])
            lo = v[int(np.floor(0.1 * (len(v) - 1)))]
            hi = v[int(np.floor(0.9 * (len(v) - 1)))]
            kept = v[(v >= lo) & (v <= hi)]
            assert row.n_kept == len(kept)
            assert row.kept_sum == int(kept.sum())
            assert row.trimmed_mean == float(int(kept.sum())) / float(len(kept))

    def test_outlier_resistant(self, ray_session):
        # 98 sane values + 2 huge outliers: the trimmed mean ignores them
        vals = list(range(100, 198)) + [10**9, 10**9]
        df = self._run(["x"] * 100, vals)
        assert df.trimmed_mean[0] < 200

    def test_layout_invariance(self, ray_session):
        vals = np.arange(1, 201)
        a = self._run(["g"] * 200, vals, blocks=1)
        b = self._run(["g"] * 200, vals, blocks=9)
        assert a.equals(b)
