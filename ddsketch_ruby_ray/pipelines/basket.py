"""Market-basket mining: frequent co-occurring item PAIRS with lift.

The association-rule staple (Agrawal/Srikant A-priori, restricted to the
2-itemset level that dominates practice): which items appear together in
the same basket more often than chance.  No reference counterpart — this
is one of the "operations a large-scale data pipeline needs" additions.

Plan (all vectorized, one keyed shuffle of PACKED pair counts):

  1. hash-partition rows by basket id -> every basket is whole inside one
     partition; per-partition lexsort dedups (basket, item) and yields the
     sorted item list of each basket as segments.
  2. per-block pair generation over segments: each basket of size L emits
     its L*(L-1)/2 ordered pairs (a < b) via repeat/arange index algebra —
     no Python loop.  Baskets are naturally BOUNDED (a purchase order has
     a handful of lines), so the blowup is a small constant; a caller with
     unbounded baskets should cap them upstream (the classic guard).
  3. pairs pack into ONE int64 key (a << 32 | b; item ids < 2^31) and
     pre-aggregate per block BEFORE the shuffle, so the all-to-all carries
     (key, count) partials, not raw pairs.
  4. global groupby-sum -> support filter -> lift from the broadcast item
     support table: lift = (n_baskets * c_ab) / (c_a * c_b) — numerator
     and denominator are exact int64 (< 2^53), ONE float divide, so the
     SQL mirror is bit-exact.

Scale: the shuffle carries <= distinct-pair partials per block (16 B
each); item supports are a dimension-sized table (broadcast, documented);
nothing materializes the fact table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import hash64_int

__all__ = ["frequent_pairs_pipeline"]


def frequent_pairs_pipeline(
    ds,
    *,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    num_partitions: int = 64,
):
    """Dataset[(basket, item)] -> Dataset[(item_a, item_b, support, lift)]
    over DISTINCT basket membership, support >= min_support, item_a <
    item_b.  Item ids must be non-negative and < 2^31 (packed pair keys)."""

    def norm(t: pa.Table) -> pa.Table:
        b = t.column(basket_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = (hash64_int(b) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "b": pa.array(b),
                "i": t.column(item_col).cast(pa.int64()),
                "_part": pa.array(part),
            }
        )

    def basket_dedup(g: pa.Table) -> pa.Table:
        b = g.column("b").to_numpy(zero_copy_only=False)
        i = g.column("i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, b))
        b_s, i_s = b[order], i[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (b_s[1:] != b_s[:-1]) | (i_s[1:] != i_s[:-1])
        return pa.table({"b": pa.array(b_s[keep]), "i": pa.array(i_s[keep])})

    baskets = (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(basket_dedup, batch_format="pyarrow")
        .materialize()  # thin (basket, item) rows, baskets whole per block
    )

    # driver scalar: number of distinct baskets (baskets are whole per block)
    def block_nb(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = int((np.diff(b) != 0).sum()) + 1 if b.size else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    n_baskets = int(
        baskets.map_batches(
            block_nb, batch_format="pyarrow", zero_copy_batch=True
        ).sum("n")
    )

    # item supports: per-block partials -> tiny keyed sum -> broadcast dict.
    # Dimension-sized by construction (one row per distinct item).
    def item_partials(t: pa.Table) -> pa.Table:
        i = t.column("i").to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(i, return_counts=True)
        return pa.table({"item": pa.array(vals), "c": pa.array(cnt.astype(np.int64))})

    item_rows = (
        baskets.map_batches(
            item_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("item")
        .sum("c")
        .take_all()
    )
    item_support = {int(r["item"]): int(r["sum(c)"]) for r in item_rows}

    def pair_partials(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        if not b.size:
            return pa.table(
                {"pk": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        # rows arrive lexsorted by (basket, item); segment = one basket
        new = np.empty(b.size, dtype=bool)
        new[0] = True
        new[1:] = b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        seg_len = np.diff(np.append(starts, b.size))
        pos = np.arange(b.size) - starts[seg]
        # row r (position p, basket size L) is FIRST element of L-1-p pairs
        cnt = (seg_len[seg] - 1 - pos).astype(np.int64)
        first = np.repeat(np.arange(b.size), cnt)
        excl = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        second = np.arange(int(cnt.sum())) - np.repeat(excl, cnt) + first + 1
        a_i, b_i = i[first], i[second]  # a < b: items sorted within basket
        pk = (a_i << np.int64(32)) | b_i
        vals, c = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(vals), "c": pa.array(c.astype(np.int64))})

    pair_counts = (
        baskets.map_batches(
            pair_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pk")
        .sum("c")
    )

    nb = n_baskets
    s_items = np.array(sorted(item_support), dtype=np.int64)
    s_counts = np.array([item_support[int(k)] for k in s_items], dtype=np.int64)

    def finalize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        m = c >= min_support
        pk, c = pk[m], c[m]
        a = pk >> np.int64(32)
        b = pk & np.int64(0xFFFFFFFF)
        ca = s_counts[np.searchsorted(s_items, a)]
        cb = s_counts[np.searchsorted(s_items, b)]
        lift = (nb * c).astype(np.float64) / (ca * cb).astype(np.float64)
        return pa.table(
            {
                "item_a": pa.array(a),
                "item_b": pa.array(b),
                "support": pa.array(c),
                "lift": pa.array(lift),
            }
        )

    return pair_counts.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )
