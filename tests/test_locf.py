"""LOCF daily densification (pipelines/timeseries.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _run(t, repartition=None, **kw):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.timeseries import locf_daily_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        locf_daily_pipeline(
            ds, key_col="u", ts_col="ts", value_col="v", id_col="eid", **kw
        )
        .to_pandas()
        .sort_values(["key", "day"])
        .reset_index(drop=True)
    )


US_DAY = 86_400_000_000


def _t(rows):
    u, day, off, eid, v = zip(*rows)
    return pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "ts": pa.array(
                [d * US_DAY + o for d, o in zip(day, off)], pa.timestamp("us")
            ),
            "eid": pa.array(eid, pa.int64()),
            "v": pa.array(v, pa.float64()),
        }
    )


class TestLocf:
    def test_gap_fill_and_close_selection(self, ray_session):
        rows = [
            # user 1: day 10 has two events -> close is the later ts (v=2.5);
            # gap 11-12 carries 2.5; day 13 observed v=7.0
            (1, 10, 100, 1, 1.5),
            (1, 10, 200, 2, 2.5),
            (1, 13, 50, 3, 7.0),
            # user 2: single day
            (2, 20, 0, 4, 9.0),
        ]
        df = _run(_t(rows), repartition=3)
        got = list(map(tuple, df.values))
        assert got == [
            (1, 10, 2.5),
            (1, 11, 2.5),
            (1, 12, 2.5),
            (1, 13, 7.0),
            (2, 20, 9.0),
        ]

    def test_ts_tie_breaks_by_id(self, ray_session):
        rows = [(1, 5, 100, 9, 4.0), (1, 5, 100, 10, 6.0)]
        df = _run(_t(rows))
        assert df.value.tolist() == [6.0]  # higher event id wins the tie

    def test_random_vs_pandas_reference(self, ray_session):
        rng = np.random.default_rng(41)
        n = 2000
        rows = [
            (
                int(rng.integers(0, 25)),
                int(rng.integers(0, 40)),
                int(rng.integers(0, US_DAY)),
                i,
                float(np.round(rng.random() * 100, 2)),
            )
            for i in range(n)
        ]
        df = _run(_t(rows), repartition=7)
        import pandas as pd

        raw = pd.DataFrame(rows, columns=["u", "day", "off", "eid", "v"])
        ref_rows = []
        for u, g in raw.groupby("u"):
            close = (
                g.sort_values(["day", "off", "eid"]).groupby("day").last()["v"]
            )
            days = np.arange(close.index.min(), close.index.max() + 1)
            filled = close.reindex(days).ffill()
            ref_rows += [(u, int(d), float(v)) for d, v in filled.items()]
        assert list(map(tuple, df.values)) == sorted(ref_rows)

    def test_span_guard_raises(self, ray_session):
        rows = [(1, 0, 0, 1, 1.0), (1, 500_000, 0, 2, 2.0)]
        with pytest.raises(Exception, match="calendar"):
            _run(_t(rows))
