"""Per-group top-k: grouped heavy hitters without per-group Python.

Ray Data's ``sort().limit()`` gives a GLOBAL top-k; per-group top-k (top
tokens per language, top products per region, ...) needs a rank within each
group.  The scale shape mirrors `pipelines/windows.py` sessionization:

  1. candidate rows co-locate by ``hash(group) % num_partitions`` - one
     shuffle of the (already pre-aggregated) candidate rows, never raw data;
  2. inside each partition ONE lexsort (group, -value, tiebreak) plus a
     boundary cummax computes every group's rank vector; rows with
     rank >= k are dropped.

Works on any candidate table (group, item, value).  Determinism: ties on
the value order by the tiebreak column ascending, mirroring SQL's
``row_number() OVER (PARTITION BY g ORDER BY v DESC, t ASC) <= k``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import hash64_int

__all__ = ["per_group_topk"]


def per_group_topk(
    ds,
    *,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    k: int,
    num_partitions: int = 64,
    ascending: bool = False,
):
    """Keep the k rows with the largest (``ascending=False``, default) or
    smallest (``ascending=True``) ``value_col`` per group (ties -> smallest
    ``tiebreak_col`` first).  Group keys may be strings or ints.  The
    ascending mode over an unsigned hash column is the per-group bottom-k
    uniform sample (stages/sampling.py)."""

    def add_part(t: pa.Table) -> pa.Table:
        col = t.column(group_col)
        if pa.types.is_integer(col.type):
            h = hash64_int(col.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            from ..core.hashing import hash256_str

            h = hash256_str(col, lanes=1)[0]
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def per_partition(pt: pa.Table) -> pa.Table:
        g = pt.column(group_col).to_numpy(zero_copy_only=False)
        v = pt.column(value_col).to_numpy(zero_copy_only=False)
        tb = pt.column(tiebreak_col).to_numpy(zero_copy_only=False)
        # descending: lexsort on -v (ints negate exactly; uint64 value columns
        # are only supported in ascending mode, where no negation happens)
        order = np.lexsort((tb, v if ascending else -v, g))
        g_s = g[order]
        n = len(order)
        pos = np.arange(n)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = g_s[1:] != g_s[:-1]
        seg_start = np.maximum.accumulate(np.where(new_g, pos, -1))
        keep = (pos - seg_start) < k
        idx = pa.array(order[keep])
        cols = {
            c: pt.column(c).take(idx)
            for c in pt.column_names
            if c != "_part"
        }
        return pa.table(cols)

    return parted.groupby("_part").map_groups(per_partition, batch_format="pyarrow")
