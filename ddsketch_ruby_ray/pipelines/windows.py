"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time window/watermark machinery; per the standard
recipe these are expressed as batch transforms:

* tumbling windows  - window id is a derived group key (see
  queries.dd_windowed_quantiles);
* sliding windows   - each row is REPLICATED into the windows it belongs to
  inside ``map_batches`` (vectorized np.repeat), then the usual grouped
  sketch pipeline;
* session windows   - ``groupby(key).map_groups``: each group arrives
  complete, is sorted by ts, and gap-based session ids are a cumsum over
  (delta > gap).  Ordering assumption: within one call we sort; ACROSS
  calls nothing is needed because grouping is by user.

All are deterministic and SQL-mirrorable (lag/cumsum window functions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["assign_sliding_windows", "sessionize_pipeline"]


def assign_sliding_windows(
    batch: pa.Table,
    *,
    ts_col: str,
    window_s: int,
    slide_s: int,
    out_col: str = "window_start",
) -> pa.Table:
    """Replicate each row into every sliding window containing its timestamp.

    Windows start at multiples of ``slide_s``; a row at epoch second t
    belongs to starts in (t - window_s, t], i.e. ``window_s // slide_s``
    windows.  Vectorized: one np.repeat + arange per batch.
    """
    assert window_s % slide_s == 0
    per_row = window_s // slide_s
    us = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    sec = us // 1_000_000
    last_start = (sec // slide_s) * slide_s  # latest window containing the row
    n = batch.num_rows
    idx = np.repeat(np.arange(n), per_row)
    offsets = np.tile(np.arange(per_row) * slide_s, n)
    starts = last_start[idx] - offsets
    out = batch.take(pa.array(idx))
    return out.append_column(out_col, pa.array(starts, pa.int64()))


def sessionize_pipeline(
    ds,
    *,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
):
    """-> Dataset[(key, n_sessions, longest_s, total_events)].

    Gap-based sessions per key: events sorted by ts; a new session starts
    when the gap to the previous event exceeds ``gap_s`` seconds.
    """

    def per_key(group: pa.Table) -> pa.Table:
        key = group.column(key_col)[0].as_py()
        us = np.sort(group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False))
        sec = us / 1_000_000.0
        if sec.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "longest_s": pa.array([], pa.float64()),
                    "total_events": pa.array([], pa.int64()),
                }
            )
        new_session = np.empty(sec.size, dtype=bool)
        new_session[0] = True
        new_session[1:] = (sec[1:] - sec[:-1]) > gap_s
        session_id = np.cumsum(new_session) - 1
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], sec.size)
        lengths = sec[ends - 1] - sec[starts]
        return pa.table(
            {
                key_col: pa.array([key], pa.int64()),
                "n_sessions": pa.array([int(session_id[-1] + 1)], pa.int64()),
                "longest_s": pa.array([float(lengths.max())], pa.float64()),
                "total_events": pa.array([int(sec.size)], pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
