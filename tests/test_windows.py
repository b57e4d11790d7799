"""Stream-shaped operator tests: sliding windows, sessionization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _events(ts_seconds, users=None):
    n = len(ts_seconds)
    return pa.table(
        {
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "ts": pa.array(
                (np.asarray(ts_seconds, dtype=np.int64) * 1_000_000), pa.timestamp("us")
            ),
            "value": pa.array([1.0] * n),
        }
    )


class TestSlidingWindows:
    def test_each_row_in_window_span_over_slide_windows(self, ray_session):
        from ddsketch_ruby_ray.pipelines.windows import assign_sliding_windows

        t = _events([0, 1800, 3599, 3600])
        out = assign_sliding_windows(t, ts_col="ts", window_s=3600, slide_s=1800)
        assert out.num_rows == 8  # 2 windows per row
        df = out.to_pandas()
        # row at t=3599 belongs to windows starting 1800 and 3600? 3599//1800=1
        starts = sorted(df[df.ts == pa.scalar(3599 * 1_000_000, pa.timestamp("us")).as_py()][
            "window_start"
        ])
        assert starts == [0, 1800]
        starts0 = sorted(df[df.ts == pa.scalar(0, pa.timestamp("us")).as_py()]["window_start"])
        assert starts0 == [-1800, 0]

    def test_window_counts_double_rows(self, ray_session, sf_dir):
        from ddsketch_ruby_ray.queries import dd_sliding_window_quantiles

        out = dd_sliding_window_quantiles(sf_dir).to_pandas()
        import pyarrow.parquet as pq

        n_events = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        assert out["count"].sum() == 2 * n_events  # every event in 2 windows


class TestSessions:
    def test_gap_sessionization(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import sessionize_pipeline

        # user 1: events at 0, 100, 5000 (gap>1800 splits) -> 2 sessions,
        # longest 100s; user 2: single event -> 1 session of 0s
        t = _events([0, 100, 5000, 7], users=[1, 1, 1, 2])
        out = (
            sessionize_pipeline(rd.from_arrow(t), key_col="user_id", ts_col="ts", gap_s=1800)
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        assert out.loc[1, "n_sessions"] == 2
        assert out.loc[1, "longest_s"] == 100.0
        assert out.loc[1, "total_events"] == 3
        assert out.loc[2, "n_sessions"] == 1
        assert out.loc[2, "longest_s"] == 0.0

    def test_out_of_order_input_is_sorted(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import sessionize_pipeline

        t = _events([5000, 0, 100], users=[1, 1, 1])
        out = sessionize_pipeline(
            rd.from_arrow(t).repartition(3), key_col="user_id", ts_col="ts", gap_s=1800
        ).to_pandas()
        assert out.iloc[0]["n_sessions"] == 2  # sorting inside the group fixes order
