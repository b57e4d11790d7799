"""As-of / range join pipeline tests (pipelines/joins.py).

Edge cases the sf0.01 oracle queries can't isolate: exact timestamp ties
(inclusive match + tie-break), unmatched keys, window-boundary inclusivity,
empty sides, and a brute-force cross-check on random data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _us(seconds):
    return pa.array(np.asarray(seconds, dtype=np.int64) * 1_000_000, pa.timestamp("us"))


def _left(keys, ts_s):
    return pa.table(
        {
            "lid": pa.array(range(len(keys)), pa.int64()),
            "k": pa.array(keys, pa.int64()),
            "ts": _us(ts_s),
        }
    )


def _right(keys, ts_s, payload):
    return pa.table(
        {
            "k2": pa.array(keys, pa.int64()),
            "ts2": _us(ts_s),
            "pay": pa.array(payload, pa.int64()),
        }
    )


def _asof(lt, rt, **kw):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.joins import asof_join_pipeline

    out = asof_join_pipeline(
        rd.from_arrow(lt),
        rd.from_arrow(rt),
        left_key="k",
        left_ts="ts",
        right_key="k2",
        right_ts="ts2",
        left_cols=["lid", "k"],
        right_payload=["pay"],
        tiebreak="pay",
        **kw,
    )
    return out.to_pandas().sort_values("lid").reset_index(drop=True)


class TestAsofJoin:
    def test_basic_ties_and_unmatched(self, ray_session):
        lt = _left([1, 1, 2, 3], [100, 50, 100, 100])
        # key 1: rows at ts 40, 100 (tie pair payloads 7, 9), 200(after)
        rt = _right([1, 1, 1, 1, 2], [40, 100, 100, 200, 150], [5, 7, 9, 11, 13])
        df = _asof(lt, rt)
        assert df["pay"].tolist()[:2] == [9, 5]  # ts=100: tie -> max payload; ts=50 -> 40
        assert np.isnan(df["pay"][2])  # key 2: only right at 150 > 100
        assert np.isnan(df["pay"][3])  # key 3: absent from right

    def test_empty_right(self, ray_session):
        df = _asof(_left([1], [10]), _right([], [], []))
        assert len(df) == 1 and np.isnan(df["pay"][0])

    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(11)
        n, m = 300, 400
        lt = _left(rng.integers(0, 20, n), rng.integers(0, 1000, n))
        rt = _right(rng.integers(0, 20, m), rng.integers(0, 1000, m), rng.permutation(m))
        df = _asof(lt, rt, num_partitions=7)
        lk = lt["k"].to_numpy()
        lts = lt["ts"].cast(pa.int64()).to_numpy() // 1_000_000
        rk = rt["k2"].to_numpy()
        rts = rt["ts2"].cast(pa.int64()).to_numpy() // 1_000_000
        pay = rt["pay"].to_numpy()
        for i in range(n):
            mask = (rk == lk[i]) & (rts <= lts[i])
            got = df["pay"][i]
            if not mask.any():
                assert np.isnan(got), i
            else:
                best_ts = rts[mask].max()
                want = pay[mask & (rts == best_ts)].max()
                assert got == want, (i, got, want)


class TestRangeJoin:
    def _range(self, lt, rt, window_s, **kw):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.joins import range_join_pipeline

        out = range_join_pipeline(
            rd.from_arrow(lt),
            rd.from_arrow(rt),
            left_key="k",
            left_ts="ts",
            right_key="k2",
            right_ts="ts2",
            left_cols=["lid", "k"],
            right_payload=["pay"],
            window_s=window_s,
            **kw,
        )
        return out.to_pandas()

    def test_boundaries_inclusive_both_ends(self, ray_session):
        lt = _left([1], [100])
        rt = _right([1, 1, 1, 1, 1], [39, 40, 70, 100, 101], [0, 1, 2, 3, 4])
        df = self._range(lt, rt, window_s=60)
        # [100-60, 100] = [40, 100]: includes 40 and 100, excludes 39 and 101
        assert sorted(df["pay"]) == [1, 2, 3]

    def test_key_isolation_and_empty(self, ray_session):
        lt = _left([1, 2], [100, 100])
        rt = _right([1, 3], [100, 100], [1, 2])
        df = self._range(lt, rt, window_s=60)
        assert df["pay"].tolist() == [1] and df["k"].tolist() == [1]

    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(12)
        n, m = 200, 300
        lt = _left(rng.integers(0, 10, n), rng.integers(0, 500, n))
        rt = _right(rng.integers(0, 10, m), rng.integers(0, 500, m), np.arange(m))
        df = self._range(lt, rt, window_s=50, num_partitions=5)
        lk = lt["k"].to_numpy()
        lts = lt["ts"].cast(pa.int64()).to_numpy() // 1_000_000
        rk = rt["k2"].to_numpy()
        rts = rt["ts2"].cast(pa.int64()).to_numpy() // 1_000_000
        expect = sorted(
            (int(i), int(p))
            for i in range(n)
            for p, (k2, t2) in enumerate(zip(rk, rts))
            if k2 == lk[i] and lts[i] - 50 <= t2 <= lts[i]
        )
        got = sorted(zip(df["lid"].astype(int), df["pay"].astype(int)))
        assert got == expect
