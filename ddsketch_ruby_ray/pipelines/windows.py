"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time window/watermark machinery; per the standard
recipe these are expressed as batch transforms:

* tumbling windows  - window id is a derived group key (see
  queries.dd_windowed_quantiles);
* sliding windows   - each row is REPLICATED into the windows it belongs to
  inside ``map_batches`` (vectorized np.repeat), then the usual grouped
  sketch pipeline;
* session windows   - hash-PARTITIONED ``groupby("_part").map_groups``
  (~num_partitions reduce calls, never one per key); inside a partition
  one lexsort(ts, key) + boundary reduceat yields every key's gap-based
  session stats.  Ordering assumption: within one call we sort; ACROSS
  calls nothing is needed because partitioning is by key hash.

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
    num_partitions: int = 64,
):
    """-> Dataset[(key, n_sessions, longest_s, total_events)].

    Gap-based sessions per key: events sorted by ts; a new session starts
    when the gap to the previous event exceeds ``gap_s`` seconds.

    Keys are co-located by a hash PARTITION (~cpus reduce calls, not one
    Python map_groups call per key - at 10^9 users Ray's ~250us/group
    overhead would dominate); inside each partition ONE lexsort + boundary
    reduceat computes every key's session stats.
    """
    from ..core.hashing import hash64_int

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = (hash64_int(keys) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def per_partition(pt: pa.Table) -> pa.Table:
        keys = pt.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        us = pt.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, keys))
        k_s = keys[order]
        sec = us[order] / 1_000_000.0
        n = len(order)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (sec[1:] - sec[:-1]) > gap_s
        sess_starts = np.flatnonzero(new_sess)
        sess_ends = np.append(sess_starts[1:], n)
        sess_len = sec[sess_ends - 1] - sec[sess_starts]
        key_starts = np.flatnonzero(new_key)
        uk = k_s[key_starts]
        total = np.diff(np.append(key_starts, n))
        sess_new_key = new_key[sess_starts]  # session opens a new key run
        n_sessions = np.diff(
            np.append(np.flatnonzero(sess_new_key), len(sess_starts))
        )
        longest = np.maximum.reduceat(sess_len, np.flatnonzero(sess_new_key))
        return pa.table(
            {
                key_col: pa.array(uk, pa.int64()),
                "n_sessions": pa.array(n_sessions.astype(np.int64)),
                "longest_s": pa.array(longest, pa.float64()),
                "total_events": pa.array(total.astype(np.int64)),
            }
        )

    return parted.groupby("_part").map_groups(per_partition, batch_format="pyarrow")
