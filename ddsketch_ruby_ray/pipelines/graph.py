"""Iterative graph algorithms as Dataset shuffles: PageRank + k-hop BFS.

The reference (ddsketch-ruby) has no graph surface at all; these cover the
two iterative-message-passing shapes a 100-TB corpus pipeline actually
needs — link-importance scoring (PageRank over, e.g., a web/click graph)
and seed-expansion (multi-source BFS: "everything within k hops of a
trusted set").  Ray Data has no iterative primitive, so both reuse the
partition-vectorized message-passing formulation proven in cc.py: the
static edge table is hash-partitioned ONCE and pinned; each iteration
unions the KB-per-node state rows into the edge partitions (groupby the
precomputed ``_part`` — one keyed shuffle of state, never of edges),
propagates along the co-located edges with lexsort + segment fills, and
folds messages per destination with reduceat.  The driver reads ONE scalar
per iteration (the dangling mass / frontier size), exactly like cc.py's
changed-count.

PageRank is EXACT fixed-point integer arithmetic, so any execution order
gives bit-identical ranks and the SQL mirror is plain unrolled CTEs:

  SCALE = 10^12;  r0(v) = SCALE // N
  r_{t+1}(v) = ((SCALE // N) * 15) // 100
             + (85 * (sum_{u->v} (r_t(u) // outdeg(u)) + dang_t // N)) // 100

with ``dang_t`` the summed rank of out-degree-0 nodes (standard dangling
redistribution) and ``//`` floor division of non-negative int64 — no
floats anywhere, no accumulation-order sensitivity.  All masses are
<= SCALE so ``85 * x`` stays far from int64 overflow.

BFS labels are min-hop counts; min is order-free, so it is deterministic
for the same reason cc.py's min-label propagation is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.hashing import hash64_int

__all__ = [
    "pagerank_pipeline",
    "bfs_hops_pipeline",
    "sssp_pipeline",
    "triangle_count_pipeline",
    "degree_histogram_pipeline",
]

PR_SCALE = 10**12

# auto-mode broadcast cap, MEASURED (tools/graph_crossover.py, 32M edges,
# 16 cpus, best-of-2 fresh children): broadcast beats the shuffle plan at
# EVERY swept node count — 2.89x at 1M nodes decaying ~0.2x per doubling to
# 1.91x at 16M with the round-4 build; the round-5 fused-meta build WIDENS
# it (re-measured endpoints: 3.5x at 1M, 2.10x at 16M) — so the wall-time
# crossover extrapolates to ~300M nodes and
# the binding constraint is DRIVER MEMORY for the O(nodes) rank state
# (~32 B/node of arrays + an O(nodes) broadcast per iteration).  16M nodes
# ~ 0.5 GB driver state: comfortable; past that the shuffle plan keeps
# state distributed.  Sweep table in BASELINE.md.
_MAX_BROADCAST_NODES = 16_000_000

# Partition count for the PageRank build exchanges.  This is also a LEVER on
# the outdeg meta exchange's volume: deg partials exist per (dst-partition,
# src), so a src with outdeg d lands in ~P·(1−(1−1/P)^d) partitions — fewer,
# larger partitions mean fewer partials per src.  GRAFT_PR_PARTS overrides
# for measurement (tools / BASELINE.md); the default must stay >= 2× the
# benched cpu level so no fold task starves the pool.
import os as _os

_PR_REDUCE_PARTS = int(_os.environ.get("GRAFT_PR_PARTS", "64"))


def _with_part(t: pa.Table, col: str, num_partitions: int) -> pa.Table:
    k = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    part = (hash64_int(k) % np.uint64(num_partitions)).astype(np.int32)
    return t.append_column("_part", pa.array(part))


class PackedIdOverflow(Exception):
    """An id fell outside [0, 2^31) — the packed edge exchange cannot run."""


def _pack_pair(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) int64 pair -> one int64 key, after validating both ids fit
    [0, 2^31).  Packing HALVES every edge exchange's bytes and turns the
    reduce's lexsort into one single-key sort; ids wider than 31 bits raise
    :class:`PackedIdOverflow` loudly (callers fall back to the two-column
    plan) instead of silently colliding."""
    if hi.size:
        m = min(int(hi.min()), int(lo.min()))
        M = max(int(hi.max()), int(lo.max()))
        if m < 0 or M >= 1 << 31:
            raise PackedIdOverflow(
                f"edge ids outside [0, 2^31): min={m} max={M}"
            )
    return (hi << np.int64(32)) | lo


def _distinct_edges(edges, *, src_col: str, dst_col: str, num_partitions: int, packed="auto"):
    """-> materialized Dataset[(src, dst, _part)] with exact (src, dst)
    dedup; partitioned by hash(src) so a src's whole adjacency list is one
    partition (dedup is therefore global, and propagation needs no second
    shuffle of edges — ever).

    ``packed`` (True / False / "auto"): ship one (src<<32|dst) int64 per
    edge instead of two int64 columns — half the exchange bytes, one
    single-key sort in the fold, bit-identical output (packed ascending ==
    lexsort((dst, src))).  Needs ids in [0, 2^31); "auto" probes the packed
    plan and falls back to the two-column plan on
    :class:`PackedIdOverflow` (one aborted exchange — graphs with wide ids
    should pass ``packed=False``)."""

    def norm_packed(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = (hash64_int(s) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {"pk": pa.array(_pack_pair(s, d)), "_part": pa.array(part)}
        )

    def dedup_packed(g: pa.Table) -> pa.Table:
        pk = np.sort(g.column("pk").to_numpy(zero_copy_only=False))
        keep = np.empty(pk.size, dtype=bool)
        if pk.size:
            keep[0] = True
            keep[1:] = pk[1:] != pk[:-1]
        pk = pk[keep]
        part = g.column("_part")[0].as_py() if g.num_rows else 0
        return pa.table(
            {
                "src": pa.array(pk >> np.int64(32)),
                "dst": pa.array(pk & np.int64(0x7FFFFFFF)),
                "_part": pa.array(np.full(pk.size, part, dtype=np.int32)),
            }
        )

    def norm(t: pa.Table) -> pa.Table:
        return _with_part(
            pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            ),
            "src",
            num_partitions,
        )

    def dedup(g: pa.Table) -> pa.Table:
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s_s, d_s = s[order], d[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (s_s[1:] != s_s[:-1]) | (d_s[1:] != d_s[:-1])
        part = g.column("_part")[0].as_py() if g.num_rows else 0
        return pa.table(
            {
                "src": pa.array(s_s[keep]),
                "dst": pa.array(d_s[keep]),
                "_part": pa.array(
                    np.full(int(keep.sum()), part, dtype=np.int32)
                ),
            }
        )

    if packed is True or packed == "auto":
        try:
            return (
                edges.map_batches(
                    norm_packed, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("_part")
                .map_groups(dedup_packed, batch_format="pyarrow")
                .materialize()
            )
        except Exception as e:  # RayTaskError wraps the original
            if packed is True or "PackedIdOverflow" not in repr(e) + str(e):
                raise
    return (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(dedup, batch_format="pyarrow")
        .materialize()
    )


def _node_states(dedup_edges, *, num_partitions: int):
    """-> (materialized Dataset[(node, outdeg, _part)] over ALL endpoint
    nodes, node count N).  outdeg = distinct-dst out-degree, 0 for sinks."""

    def endpoints(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return _with_part(
            pa.table(
                {
                    "node": pa.array(np.concatenate([s, d])),
                    # src endpoints each carry 1 unit of out-degree (edges
                    # are already distinct), dst endpoints carry 0
                    "deg1": pa.array(
                        np.concatenate(
                            [
                                np.ones(s.size, np.int64),
                                np.zeros(d.size, np.int64),
                            ]
                        )
                    ),
                }
            ),
            "node",
            num_partitions,
        )

    def fold(g: pa.Table) -> pa.Table:
        n = g.column("node").to_numpy(zero_copy_only=False)
        d1 = g.column("deg1").to_numpy(zero_copy_only=False)
        order = np.argsort(n, kind="stable")
        n_s, d_s = n[order], d1[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = n_s[1:] != n_s[:-1]
        starts = np.flatnonzero(new)
        part = g.column("_part")[0].as_py()
        return pa.table(
            {
                "node": pa.array(n_s[starts]),
                "outdeg": pa.array(np.add.reduceat(d_s, starts)),
                "_part": pa.array(np.full(len(starts), part, dtype=np.int32)),
            }
        )

    states = (
        dedup_edges.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .materialize()
    )
    return states, states.count()


def _pin_edge_slices(
    part_ds, columns: tuple, sort_col: str = "dst", num_partitions: int | None = None
) -> dict:
    """Split a materialized ``_part``-partitioned edge Dataset into
    per-partition object-store tables sorted by ``sort_col`` —
    ``{part: [ObjectRef, ...]}``.

    Iterative shuffle-mode algorithms gather these slices BY REF inside
    their per-partition group tasks, so each iteration exchanges only the
    O(nodes) state rows; the edge bytes never ride a shuffle again (the
    previous shape unioned the full edge table into every iteration's
    groupby and re-sorted it each round).  On a multi-node cluster the
    first gather pulls a slice to the consuming node and the object store
    retains the secondary copy, so later rounds read locally.  Driver
    memory is O(partitions) refs, never edge rows.
    Ownership: the slices come back as task RETURN VALUES (one return
    slot per partition), so every ref is owned by the CALLER.  The
    previous shape did ``ray.put`` INSIDE the task, which pinned each
    slice to the transient worker that created it — an idle-reaped or
    OOM-killed worker would take its slices down with it mid-iteration
    (OwnerDiedError) on a long-running cluster.
    """
    import ray

    if num_partitions is None:
        # fallback: derive the dense [0, P) id space from the data
        num_partitions = 1 + int(
            part_ds.map_batches(
                lambda t: pa.table(
                    {
                        "m": pa.array(
                            [int(t.column("_part").to_numpy(zero_copy_only=False).max())]
                            if t.num_rows
                            else [],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).max("m")
        )

    @ray.remote
    def split(tbl: pa.Table, P: int):
        if tbl.num_rows == 0 or "_part" not in tbl.schema.names:
            # Ray's sort shuffle emits SCHEMA-LESS blocks for empty output
            # partitions — type them here (edge-slice lanes are int64 at
            # every call site) instead of KeyError-ing mid-build
            empty = pa.table({c: pa.array([], pa.int64()) for c in columns})
            return empty if P == 1 else tuple([empty] * P)
        prt = tbl.column("_part").to_numpy(zero_copy_only=False)
        cols = {c: tbl.column(c).to_numpy(zero_copy_only=False) for c in columns}
        empty = pa.table({c: pa.array(v[:0]) for c, v in cols.items()})
        out = [empty] * P
        for p in np.unique(prt):
            m = prt == p
            sl = {c: v[m] for c, v in cols.items()}
            o = np.argsort(sl[sort_col], kind="stable")
            out[int(p)] = pa.table({c: pa.array(v[o]) for c, v in sl.items()})
        return out[0] if P == 1 else tuple(out)

    refs: dict[int, list] = {}
    for r in part_ds.to_arrow_refs():
        slot_refs = split.options(num_returns=num_partitions).remote(r, num_partitions)
        if num_partitions == 1:
            slot_refs = [slot_refs]
        for p, ref in enumerate(slot_refs):
            refs.setdefault(p, []).append(ref)
    return refs


def pagerank_pipeline(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    num_partitions: int = 64,
    mode: str = "auto",
    max_broadcast_nodes: int = _MAX_BROADCAST_NODES,
):
    """Dataset[(src, dst)] -> Dataset[(node, rank_fp)]: ``iters`` exact
    fixed-point PageRank iterations (damping 0.85, SCALE=1e12, dangling
    mass redistributed uniformly) over the DISTINCT directed edge set.

    Two physical plans with BIT-IDENTICAL output (exact integers):

    * ``"broadcast"`` — the Spark-classic shape: the (node, rank//outdeg)
      table broadcasts each iteration, the PINNED edge blocks emit
      block-pre-aggregated (dst, contribution) partials, and one thin
      keyed sum folds them.  The edge table is NEVER re-shuffled.  Rank
      state is O(nodes) on the driver — right while the node table fits
      (a 2M-node rank array is 48 MB).
    * ``"shuffle"`` — fully distributed state: rank rows co-partition
      with the PINNED per-partition edge slices (object-store tables
      gathered by ref inside the group task — edges never re-shuffle),
      and every iteration exchanges only the O(nodes) state rows plus
      block-pre-aggregated message partials.  No per-node driver state —
      the >max_broadcast_nodes path.

    ``"auto"`` picks broadcast iff the node count fits."""
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"mode must be auto|broadcast|shuffle, got {mode!r}")
    if mode in ("auto", "broadcast"):
        try:
            # fused build: dedup + dst-pinning in ONE full-edge exchange
            # (no _distinct_edges pass) — the fallback below rebuilds from
            # the raw edges, an acceptable cost for the exceptional path
            return _pagerank_broadcast(
                edges,
                src_col=src_col,
                dst_col=dst_col,
                iters=iters,
                max_nodes=(
                    max_broadcast_nodes if mode == "auto" else (1 << 62)
                ),
            )
        except _TooManyNodes:
            pass  # auto: node table too large to broadcast -> shuffle plan

    dedup = _distinct_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=num_partitions
    )
    n_edges = dedup.count()
    if n_edges == 0:
        return dedup.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank_fp": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    states, n_nodes = _node_states(dedup, num_partitions=num_partitions)
    base_share = PR_SCALE // n_nodes  # SCALE // N, reused everywhere

    # attach the initial rank
    ranks = states.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, base_share, dtype=np.int64))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # Pin the edge table ONCE as per-partition dst-sorted object-store
    # tables: iterations shuffle ONLY the O(nodes) state rows (see
    # _pin_edge_slices).
    import ray

    edge_refs = _pin_edge_slices(dedup, ("src", "dst"), num_partitions=num_partitions)

    def propagate(g: pa.Table) -> pa.Table:
        """One src-partition's STATE rows -> per-dst partial contributions
        over that partition's pinned edge slices (fetched by ref, never
        shuffled)."""
        part = int(g.column("_part")[0].as_py()) if g.num_rows else -1
        refs = edge_refs.get(part, [])
        node = g.column("node").to_numpy(zero_copy_only=False)
        r = g.column("r").to_numpy(zero_copy_only=False)
        deg = g.column("outdeg").to_numpy(zero_copy_only=False)
        o = np.argsort(node, kind="stable")
        node_s, r_s, deg_s = node[o], r[o], deg[o]
        outs = []
        for ref in refs:
            et = ray.get(ref)
            src = et.column("src").to_numpy(zero_copy_only=False)
            dst = et.column("dst").to_numpy(zero_copy_only=False)
            if not src.size:
                continue
            # every src hashes to this partition, so it has a state row;
            # outdeg >= 1 for any src with edges
            idx = np.searchsorted(node_s, src)
            contrib = r_s[idx] // deg_s[idx]
            new = np.empty(dst.size, dtype=bool)
            new[0] = True
            new[1:] = dst[1:] != dst[:-1]
            starts = np.flatnonzero(new)
            # pre-aggregate per dst within the slice: the message exchange
            # carries min(E, dsts-per-slice) partial rows, not E rows
            outs.append(
                pa.table(
                    {
                        "node": pa.array(dst[starts]),
                        "contrib": pa.array(np.add.reduceat(contrib, starts)),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "contrib": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    def make_fold(dang_share: int, base: int):
        def fold(g: pa.Table) -> pa.Table:
            node = g.column("node").to_numpy(zero_copy_only=False)
            contrib = g.column("contrib").to_numpy(zero_copy_only=False)
            is_state = g.column("is_state").to_numpy(zero_copy_only=False)
            deg = g.column("outdeg").to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            n_s, c_s, is_s, d_s = (
                node[order],
                contrib[order],
                is_state[order],
                deg[order],
            )
            new = np.empty(len(order), dtype=bool)
            new[0] = True
            new[1:] = n_s[1:] != n_s[:-1]
            starts = np.flatnonzero(new)
            in_sum = np.add.reduceat(c_s, starts)  # state rows carry 0
            seg = np.cumsum(new) - 1
            outdeg = np.zeros(len(starts), dtype=np.int64)
            sm = is_s == 1
            outdeg[seg[sm]] = d_s[sm]
            r_new = base + (85 * (in_sum + dang_share)) // 100
            part = g.column("_part")[0].as_py()
            return pa.table(
                {
                    "node": pa.array(n_s[starts]),
                    "outdeg": pa.array(outdeg),
                    "_part": pa.array(
                        np.full(len(starts), part, dtype=np.int32)
                    ),
                    "r": pa.array(r_new),
                }
            )

        return fold

    base = (base_share * 15) // 100
    for _ in range(iters):
        # one driver scalar per iteration: the dangling mass (cf. cc.py's
        # changed-count) — a single pass over the KB-per-node state table
        dang = ranks.map_batches(
            lambda t: pa.table(
                {
                    "d": pa.array(
                        [
                            int(
                                t.column("r")
                                .to_numpy(zero_copy_only=False)[
                                    t.column("outdeg").to_numpy(
                                        zero_copy_only=False
                                    )
                                    == 0
                                ]
                                .sum()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("d")
        dang_share = int(dang) // n_nodes

        # ONE keyed exchange of the O(nodes) state table; the edges stay
        # pinned in the object store and are gathered by ref inside
        # propagate — never shuffled after the build
        msgs = ranks.groupby("_part").map_groups(
            propagate, batch_format="pyarrow"
        )
        msg_rows = msgs.map_batches(
            lambda t: _with_part(
                pa.table(
                    {
                        "node": t.column("node"),
                        "contrib": t.column("contrib"),
                        "is_state": pa.array(
                            np.zeros(t.num_rows, dtype=np.int8)
                        ),
                        "outdeg": pa.array(
                            np.zeros(t.num_rows, dtype=np.int64)
                        ),
                    }
                ),
                "node",
                num_partitions,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        old_rows = ranks.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "contrib": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                    "is_state": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                    "outdeg": t.column("outdeg"),
                    "_part": t.column("_part"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # the repartition cap is LOAD-BEARING: without it the next
        # iteration's union/groupby lineage fans out over the groupby's
        # many small output blocks (measured 23.5 s -> 183 s at 16M edges)
        ranks = (
            msg_rows.union(old_rows)
            .groupby("_part")
            .map_groups(
                make_fold(dang_share, base), batch_format="pyarrow"
            )
            .repartition(min(num_partitions, 16))
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "rank_fp": t.column("r")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class _TooManyNodes(Exception):
    """Broadcast PageRank found more nodes than the caller's cap."""


def _pagerank_broadcast(
    edges, *, src_col: str, dst_col: str, iters: int, max_nodes: int
):
    """Broadcast-rank PageRank (see pagerank_pipeline docstring).

    ONE full-edge exchange total, then shuffle-free iterations:

      build: dedup and dst-pinning are FUSED into a single all-to-all —
      identical (src, dst) pairs share their dst, so hash(dst)
      co-partitioning makes in-group adjacent dedup global, and the
      in-group lexsort (dst primary) doubles as the per-block dst sort
      the iterations need.  Each group also appends its post-dedup
      per-src degree PARTIALS as carrier rows (is_deg=1; a src's edges
      span blocks, so these are partial counts).  A second, far thinner
      keyed fold (O(min(E, nodes x parts)) small rows vs the 3-column
      edge table) sums the partials and yields one (node, outdeg) row
      per node; the driver collects only that O(nodes) table.  (The
      previous shape ran TWO full-edge exchanges — a src-partitioned
      dedup, then a dst re-pin — and measured build-exchange-bound at
      eff 0.67; fusing removed half the shuffled bytes and one of the
      two full-edge sorts.)

      iterate: one map over the pinned blocks — contribution lookup via a
      single searchsorted against the broadcast node array + reduceat
      over the presorted dst runs; each block's output IS the final
      per-dst in-sum for its partition; thin (node, sum) blocks collect
      via arrow refs and the exact-integer update runs vectorized on the
      driver.  No shuffle, no sort, ever again.

    (History: the first formulation shuffled per-block partials through a
    keyed fold every iteration — the three partial exchanges were the
    measured wall floor at 16M edges; the native groupby().sum() variant
    before it spent 60 s finalizing 1.7M groups; a separate node-states
    shuffle and an int32-index rewrite pass each added a barrier that
    cost more than it saved.)

    Raises :class:`_TooManyNodes` if the node table exceeds ``max_nodes``
    (rank state is O(nodes) on the driver and broadcast per iteration).
    """
    import os
    import time

    import ray
    import ray.data as rd

    _prof = bool(os.environ.get("GRAFT_PR_PROFILE"))
    _t0 = time.perf_counter()

    def _mark(label: str) -> None:
        if _prof:
            print(f"[pr-profile] {label}: {time.perf_counter() - _t0:.2f}s")

    def norm_dst_part(t: pa.Table) -> pa.Table:
        return _with_part(
            pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            ),
            "dst",
            _PR_REDUCE_PARTS,
        )

    def dedup_sort(g: pa.Table) -> pa.Table:
        """One dst-partition: global dedup + dst sort + deg partials."""
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        o = np.lexsort((src, dst))  # dst primary: the iteration sort order
        src, dst = src[o], dst[o]
        keep = np.empty(src.size, dtype=bool)
        if src.size:
            keep[0] = True
            keep[1:] = (dst[1:] != dst[:-1]) | (src[1:] != src[:-1])
        src, dst = src[keep], dst[keep]
        deg_node, deg_val = np.unique(src, return_counts=True)
        return pa.table(
            {
                "dst": pa.array(np.concatenate([dst, deg_node])),
                "src": pa.array(np.concatenate([src, deg_val])),
                "is_deg": pa.array(
                    np.concatenate(
                        [
                            np.zeros(dst.size, dtype=np.int8),
                            np.ones(deg_node.size, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    _LO31 = np.int64(0x7FFFFFFF)

    def norm_dst_packed(t: pa.Table) -> pa.Table:
        """Packed fast path, ROUND-5 FUSED SHAPE: one exchange carries BOTH
        the block-deduped edges (pk = dst<<32|src, routed hash(dst)) AND the
        block's per-src distinct-dst deg PARTIALS (top-bit-marked
        pk = 2^63 | src<<31 | cnt, routed hash(src)).  The separate outdeg
        meta exchange — a second 29M-row sort-shuffle plus a full reread of
        the pinned blocks to feed it — disappears: every fact about node n
        (its deg partials AND its appearances as dst) lands in partition
        hash(n) of THIS exchange.  Raises :class:`PackedIdOverflow` for ids
        outside [0, 2^31); cnt < 2^31 because it counts distinct dst ids."""
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(_pack_pair(d, s))  # block-local dedup (sorted)
        dd = u >> np.int64(32)
        ss = u & _LO31
        part_e = (hash64_int(dd) % np.uint64(_PR_REDUCE_PARTS)).astype(np.int32)
        sn, cnt = np.unique(ss, return_counts=True)
        ppk = (
            (np.uint64(1) << np.uint64(63))
            | (sn.astype(np.uint64) << np.uint64(31))
            | cnt.astype(np.uint64)
        ).view(np.int64)
        part_p = (hash64_int(sn) % np.uint64(_PR_REDUCE_PARTS)).astype(np.int32)
        return pa.table(
            {
                "pk": pa.array(np.concatenate([u, ppk])),
                "_part": pa.array(np.concatenate([part_e, part_p])),
            }
        )

    def dedup_sort_packed(g: pa.Table) -> pa.Table:
        """One partition of the fused exchange -> dst-sorted deduped edges
        (is_deg=0) + ONE complete (node, outdeg) row per node hashed here
        (is_deg=1; partial sums MINUS nothing yet) + rare cross-block
        duplicate-pair corrections (is_deg=2, applied on the driver): a
        pair present in b blocks contributed b partial units, and exactly
        b-1 copies are dropped here, so deg = partial_sum - drops is EXACT."""
        pk_all = g.column("pk").to_numpy(zero_copy_only=False)
        is_partial = pk_all < 0  # top-bit-marked partial rows
        pk = np.sort(pk_all[~is_partial])
        keep = np.empty(pk.size, dtype=bool)
        if pk.size:
            keep[0] = True
            keep[1:] = pk[1:] != pk[:-1]
        dropped_src = pk[~keep] & _LO31  # cross-block duplicate copies
        pk = pk[keep]
        dst = pk >> np.int64(32)
        src = pk & _LO31
        # per-node outdeg from the partial rows routed to this partition
        ppk = pk_all[is_partial].view(np.uint64)
        psrc = ((ppk >> np.uint64(31)) & np.uint64(0x7FFFFFFF)).astype(np.int64)
        pcnt = (ppk & np.uint64(0x7FFFFFFF)).astype(np.int64)
        o = np.argsort(psrc, kind="stable")
        psrc, pcnt = psrc[o], pcnt[o]
        new = np.empty(psrc.size, dtype=bool)
        if psrc.size:
            new[0] = True
            new[1:] = psrc[1:] != psrc[:-1]
        starts = np.flatnonzero(new)
        deg_src = psrc[starts]
        deg_sum = (
            np.add.reduceat(pcnt, starts) if starts.size else pcnt[:0]
        )
        # node enumeration: srcs routed here UNION distinct dst landed here
        if dst.size:
            dnew = np.empty(dst.size, dtype=bool)
            dnew[0] = True
            dnew[1:] = dst[1:] != dst[:-1]
            uniq_dst = dst[np.flatnonzero(dnew)]
        else:
            uniq_dst = dst
        nodes = np.union1d(deg_src, uniq_dst)
        deg = np.zeros(nodes.size, dtype=np.int64)
        if deg_src.size:
            deg[np.searchsorted(nodes, deg_src)] = deg_sum
        # corrections, pre-summed per src (empty unless cross-block dups)
        cu, cc = np.unique(dropped_src, return_counts=True)
        return pa.table(
            {
                "dst": pa.array(np.concatenate([dst, nodes, cu])),
                "src": pa.array(np.concatenate([src, deg, cc.astype(np.int64)])),
                "is_deg": pa.array(
                    np.concatenate(
                        [
                            np.zeros(dst.size, dtype=np.int8),
                            np.ones(nodes.size, dtype=np.int8),
                            np.full(cu.size, 2, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    by_dst = None
    try:
        by_dst = (
            edges.map_batches(
                norm_dst_packed, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_part")
            .map_groups(dedup_sort_packed, batch_format="pyarrow")
            .materialize()  # pinned for every iteration
        )
    except Exception as e:  # wide ids: fall back to the two-column exchange
        if "PackedIdOverflow" not in repr(e) + str(e):
            raise
    packed_build = by_dst is not None
    if by_dst is None:
        by_dst = (
            edges.map_batches(
                norm_dst_part, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_part")
            .map_groups(dedup_sort, batch_format="pyarrow")
            .materialize()  # pinned for every iteration
        )
    _mark("fused edge exchange (dedup+pin) materialized")

    if packed_build:
        # ROUND-5 FUSED META: the per-node outdeg rows (is_deg=1) and the
        # rare duplicate corrections (is_deg=2) were computed INSIDE the
        # edge exchange's fold (each node's facts co-located by the same
        # hash there) — extract them with one shuffle-free pass over the
        # pinned blocks and finish on the driver.  The previous shape ran
        # a SECOND full sort-shuffle of ~1 partial row per (partition,
        # src) here, the worst-retention phase of the whole job.
        def extract_meta(t: pa.Table) -> pa.Table:
            isd = t.column("is_deg").to_numpy(zero_copy_only=False)
            m = isd != 0
            return pa.table(
                {
                    "node": pa.array(
                        t.column("dst").to_numpy(zero_copy_only=False)[m]
                    ),
                    "deg": pa.array(
                        t.column("src").to_numpy(zero_copy_only=False)[m]
                    ),
                    "kind": pa.array(isd[m]),
                }
            )

        meta_tabs = ray.get(
            by_dst.map_batches(
                extract_meta, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )  # one batched get: refs resolve in parallel, not one RTT each
        _mark("meta extracted (no exchange)")
        meta_tabs = [t for t in meta_tabs if t.num_rows]
        if not meta_tabs:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "rank_fp": pa.array([], pa.int64()),
                    }
                )
            )
        meta = pa.concat_tables(meta_tabs)
        kind = meta.column("kind").to_numpy(zero_copy_only=False)
        is_node = kind == 1
        m_node = meta.column("node").to_numpy(zero_copy_only=False)[is_node]
        m_deg = meta.column("deg").to_numpy(zero_copy_only=False)[is_node]
        n_nodes = int(m_node.size)  # each node emitted by exactly one fold
        if n_nodes > max_nodes:
            raise _TooManyNodes(n_nodes)
        order = np.argsort(m_node, kind="stable")
        nodes_arr = m_node[order]
        outdeg_arr = m_deg[order].astype(np.int64).copy()
        if not np.all(is_node):  # cross-block duplicate-pair corrections
            c_node = meta.column("node").to_numpy(zero_copy_only=False)[~is_node]
            c_cnt = meta.column("deg").to_numpy(zero_copy_only=False)[~is_node]
            np.subtract.at(
                outdeg_arr, np.searchsorted(nodes_arr, c_node), c_cnt
            )
    else:
        # fallback (wide ids): the classic second keyed fold over per-
        # partition deg partials routed by hash(node)
        def meta_map(t: pa.Table) -> pa.Table:
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            src = t.column("src").to_numpy(zero_copy_only=False)
            isd = t.column("is_deg").to_numpy(zero_copy_only=False)
            e = isd == 0
            d_e = dst[e]
            if d_e.size:
                new = np.empty(d_e.size, dtype=bool)
                new[0] = True
                new[1:] = d_e[1:] != d_e[:-1]
                uniq = d_e[np.flatnonzero(new)]
            else:
                uniq = d_e
            m = isd == 1
            node = np.concatenate([uniq, dst[m]])
            deg = np.concatenate([np.zeros(uniq.size, dtype=np.int64), src[m]])
            return _with_part(
                pa.table({"node": pa.array(node), "deg": pa.array(deg)}),
                "node",
                _PR_REDUCE_PARTS,
            )

        def meta_fold(g: pa.Table) -> pa.Table:
            node = g.column("node").to_numpy(zero_copy_only=False)
            deg = g.column("deg").to_numpy(zero_copy_only=False)
            o = np.argsort(node, kind="stable")
            node, deg = node[o], deg[o]
            new = np.empty(node.size, dtype=bool)
            if node.size:
                new[0] = True
                new[1:] = node[1:] != node[:-1]
            starts = np.flatnonzero(new)
            return pa.table(
                {
                    "node": pa.array(node[starts]),
                    "deg": pa.array(
                        np.add.reduceat(deg, starts) if starts.size else deg[:0]
                    ),
                }
            )

        meta_tabs = [
            ray.get(r)
            for r in by_dst.map_batches(
                meta_map, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_part")
            .map_groups(meta_fold, batch_format="pyarrow")
            .to_arrow_refs()
        ]
        _mark("meta fold collected")
        meta_tabs = [t for t in meta_tabs if t.num_rows]
        if not meta_tabs:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "rank_fp": pa.array([], pa.int64()),
                    }
                )
            )
        meta = pa.concat_tables(meta_tabs)
        m_node = meta.column("node").to_numpy(zero_copy_only=False)
        m_deg = meta.column("deg").to_numpy(zero_copy_only=False)
        n_nodes = int(m_node.size)  # fold emits each node exactly once
        if n_nodes > max_nodes:
            raise _TooManyNodes(n_nodes)
        order = np.argsort(m_node, kind="stable")
        nodes_arr = m_node[order]
        outdeg_arr = m_deg[order].astype(np.int64)
    nodes_ref = ray.put(nodes_arr)

    base_share = PR_SCALE // n_nodes
    dangling = outdeg_arr == 0
    r_arr = np.full(n_nodes, base_share, dtype=np.int64)
    base = (base_share * 15) // 100
    safe_deg = np.where(dangling, 1, outdeg_arr)

    # ONE shuffle-free reindex pass: rewrite the pinned blocks to int32
    # (src_idx, dst_idx) positions in the sorted node array, dropping the
    # carrier rows.  Every iteration is then a pure gather + reduceat —
    # no per-iteration searchsorted over the node table (was ~70% of each
    # iteration's CPU at 32M edges) — and the pinned bytes drop from
    # 17 B/edge (2x int64 + int8) to 8 B/edge, halving the block-read
    # bandwidth the iterations consume.  int32 is safe: indices are
    # positions in nodes_arr, and n_nodes <= max_nodes << 2^31.
    def reindex(t: pa.Table) -> pa.Table:
        ns = ray.get(nodes_ref)
        isd = t.column("is_deg").to_numpy(zero_copy_only=False)
        e = isd == 0
        dst = t.column("dst").to_numpy(zero_copy_only=False)[e]
        src = t.column("src").to_numpy(zero_copy_only=False)[e]
        return pa.table(
            {
                "src_idx": pa.array(np.searchsorted(ns, src).astype(np.int32)),
                "dst_idx": pa.array(np.searchsorted(ns, dst).astype(np.int32)),
            }
        )

    pinned = by_dst.map_batches(
        reindex, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    del by_dst  # release the pre-index blocks
    _mark("int32 reindex pass materialized")

    for _ in range(iters):
        dang_share = int(r_arr[dangling].sum()) // n_nodes
        contrib_arr = np.where(dangling, 0, r_arr // safe_deg)
        ref = ray.put(contrib_arr)

        def in_sums(t: pa.Table) -> pa.Table:
            ca = ray.get(ref)
            si = t.column("src_idx").to_numpy(zero_copy_only=False)
            di = t.column("dst_idx").to_numpy(zero_copy_only=False)
            if not di.size:
                return pa.table(
                    {"idx": pa.array([], pa.int32()), "s": pa.array([], pa.int64())}
                )
            c = ca[si]
            new = np.empty(di.size, dtype=bool)
            new[0] = True
            new[1:] = di[1:] != di[:-1]  # dst_idx inherits the dst sort
            starts = np.flatnonzero(new)
            return pa.table(
                {
                    "idx": pa.array(di[starts]),
                    "s": pa.array(np.add.reduceat(c, starts)),
                }
            )

        in_sum = np.zeros(n_nodes, dtype=np.int64)
        reduced = pinned.map_batches(
            in_sums, batch_format="pyarrow", zero_copy_batch=True
        )
        # one batched get (parallel resolve), then a single scatter-add —
        # add, don't assign: correct even if a dst's rows ever split across
        # output blocks (whole-block batches make each dst appear once
        # today, but the fold must not depend on that)
        tabs = [t for t in ray.get(reduced.to_arrow_refs()) if t.num_rows]
        if tabs:
            cat = pa.concat_tables(tabs)
            np.add.at(
                in_sum,
                cat.column("idx").to_numpy(zero_copy_only=False),
                cat.column("s").to_numpy(zero_copy_only=False),
            )
        r_arr = base + (85 * (in_sum + dang_share)) // 100
        _mark("iteration")

    return rd.from_arrow(
        pa.table({"node": pa.array(nodes_arr), "rank_fp": pa.array(r_arr)})
    )


def _bfs_broadcast(dedup, seeds, *, seed_col: str, max_hops: int, max_nodes: int):
    """Broadcast-frontier BFS over the pinned src-partitioned edge table:
    per hop, ONE map (mask edges whose src is in the broadcast frontier —
    searchsorted over the sorted frontier — emit block-distinct dsts) and
    one arrow-ref collect; the driver keeps the visited set (O(reached
    nodes) — the same fits-in-memory contract as the PageRank broadcast
    plan) and diffs the next frontier.  No shuffle after the one-time
    edge build."""
    import ray
    import ray.data as rd

    seed_tabs = [
        ray.get(r)
        for r in seeds.map_batches(
            lambda t: pa.table(
                {"node": t.column(seed_col).cast(pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_arrow_refs()
    ]
    seed_tabs = [t for t in seed_tabs if t.num_rows]
    if seed_tabs:
        frontier = np.unique(
            pa.concat_tables(seed_tabs).column("node").to_numpy(zero_copy_only=False)
        )
    else:
        frontier = np.empty(0, dtype=np.int64)
    visited_nodes = [frontier]
    visited_hops = [np.zeros(frontier.size, dtype=np.int64)]
    visited_sorted = frontier.copy()

    for hop in range(1, max_hops + 1):
        if not frontier.size:
            break
        if visited_sorted.size > max_nodes:
            raise _TooManyNodes(int(visited_sorted.size))
        ref = ray.put(frontier)  # sorted

        def neighbors(t: pa.Table) -> pa.Table:
            fr = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(fr, src)
            pos_c = np.minimum(pos, max(fr.size - 1, 0))
            hit = fr.size and (fr[pos_c] == src)
            cand = np.unique(dst[hit]) if np.any(hit) else dst[:0]
            return pa.table({"node": pa.array(cand)})

        tabs = [
            ray.get(r)
            for r in dedup.map_batches(
                neighbors, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            break
        cand = np.unique(
            pa.concat_tables(tabs).column("node").to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(visited_sorted, cand)
        pos_c = np.minimum(pos, max(visited_sorted.size - 1, 0))
        fresh = cand[~((visited_sorted.size > 0) & (visited_sorted[pos_c] == cand))]
        if not fresh.size:
            break
        visited_nodes.append(fresh)
        visited_hops.append(np.full(fresh.size, hop, dtype=np.int64))
        visited_sorted = np.union1d(visited_sorted, fresh)
        frontier = fresh  # already sorted (np.unique / boolean filter)

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.concatenate(visited_nodes)),
                "hops": pa.array(np.concatenate(visited_hops)),
            }
        )
    )


def bfs_hops_pipeline(
    edges,
    seeds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_hops: int = 4,
    num_partitions: int = 64,
    mode: str = "auto",
    max_broadcast_nodes: int = _MAX_BROADCAST_NODES,
):
    """Dataset[(src, dst)] x Dataset[seed nodes] -> Dataset[(node, hops)]:
    minimum hop count (<= max_hops) from ANY seed over the UNDIRECTED edge
    set; unreachable nodes are absent.

    ``mode="broadcast"`` (and ``"auto"`` while the reached set fits):
    broadcast-frontier expansion over the pinned edge table — one shuffle
    total (the edge build), one map + collect per hop.  ``"shuffle"``:
    fully distributed frontier-style min-propagation (only nodes whose hop
    improved message their neighbors) — the unbounded-reach path."""
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"mode must be auto|broadcast|shuffle, got {mode!r}")

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    both = edges.map_batches(
        undirect, batch_format="pyarrow", zero_copy_batch=True
    )
    dedup = _distinct_edges(
        both, src_col="src", dst_col="dst", num_partitions=num_partitions
    )
    if mode in ("auto", "broadcast"):
        try:
            return _bfs_broadcast(
                dedup,
                seeds,
                seed_col=seed_col,
                max_hops=max_hops,
                max_nodes=(
                    max_broadcast_nodes if mode == "auto" else (1 << 62)
                ),
            )
        except _TooManyNodes:
            pass  # auto: reached set outgrew the driver -> shuffle plan

    import ray

    # per-partition dst-sorted edge slices, gathered by ref inside the
    # frontier group tasks — per hop, only the O(frontier) state rows and
    # the per-dst candidate partials ride a shuffle, never the edges
    edge_refs = _pin_edge_slices(dedup, ("src", "dst"), num_partitions=num_partitions)

    def seed_states(t: pa.Table) -> pa.Table:
        n = t.column(seed_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.unique(n)
        return _with_part(
            pa.table(
                {
                    "node": pa.array(n),
                    "hop": pa.array(np.zeros(n.size, dtype=np.int64)),
                    "fresh": pa.array(np.ones(n.size, dtype=np.int8)),
                }
            ),
            "node",
            num_partitions,
        )

    hops = seeds.map_batches(
        seed_states, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def propagate(g: pa.Table) -> pa.Table:
        """One partition's FRONTIER state rows -> per-dst min candidate
        hops over that partition's pinned edge slices (fetched by ref)."""
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())}
        )
        if not g.num_rows:
            return empty
        part = int(g.column("_part")[0].as_py())
        node = g.column("node").to_numpy(zero_copy_only=False)
        hop = g.column("hop").to_numpy(zero_copy_only=False)
        o = np.argsort(node, kind="stable")
        node_s, hop_s = node[o], hop[o]
        outs = []
        for ref in edge_refs.get(part, []):
            et = ray.get(ref)
            src = et.column("src").to_numpy(zero_copy_only=False)
            dst = et.column("dst").to_numpy(zero_copy_only=False)
            if not src.size:
                continue
            pos = np.searchsorted(node_s, src)
            pc_ = np.minimum(pos, node_s.size - 1)
            valid = node_s[pc_] == src  # src in the frontier
            if not valid.any():
                continue
            dv = dst[valid]  # dst-sorted slice: order survives the mask
            cv = hop_s[pc_[valid]] + 1
            new = np.empty(dv.size, dtype=bool)
            new[0] = True
            new[1:] = dv[1:] != dv[:-1]
            starts = np.flatnonzero(new)
            # per-dst min within the slice: min is idempotent, so the
            # candidate exchange carries one row per (slice, dst)
            outs.append(
                pa.table(
                    {
                        "node": pa.array(dv[starts]),
                        "cand": pa.array(np.minimum.reduceat(cv, starts)),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    def fold(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        cand = g.column("cand").to_numpy(zero_copy_only=False)
        is_old = g.column("is_old").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        n_s, c_s, io_s = node[order], cand[order], is_old[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = n_s[1:] != n_s[:-1]
        starts = np.flatnonzero(new)
        mins = np.minimum.reduceat(c_s, starts)
        seg = np.cumsum(new) - 1
        old = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
        old[seg[io_s == 1]] = c_s[io_s == 1]
        part = g.column("_part")[0].as_py()
        return pa.table(
            {
                "node": pa.array(n_s[starts]),
                "hop": pa.array(mins),
                "fresh": pa.array((mins < old).astype(np.int8)),
                "_part": pa.array(np.full(len(starts), part, dtype=np.int32)),
            }
        )

    for _ in range(max_hops):
        # only improved nodes message their neighbors (frontier); the
        # frontier is O(reached) rows — materialize once, reuse for the
        # empty-check and the exchange
        frontier = hops.map_batches(
            lambda t: t.filter(
                pa.compute.equal(t.column("fresh"), pa.scalar(1, pa.int8()))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if frontier.count() == 0:
            break  # fixed point: no node improved last hop
        msgs = frontier.groupby("_part").map_groups(
            propagate, batch_format="pyarrow"
        )
        msg_rows = msgs.map_batches(
            lambda t: _with_part(
                pa.table(
                    {
                        "node": t.column("node"),
                        "cand": t.column("cand"),
                        "is_old": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                    }
                ),
                "node",
                num_partitions,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        old_rows = hops.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "cand": t.column("hop"),
                    "is_old": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                    "_part": t.column("_part"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        hops = (
            msg_rows.union(old_rows)
            .groupby("_part")
            .map_groups(fold, batch_format="pyarrow")
            .repartition(min(num_partitions, 16))
            .materialize()
        )

    return hops.map_batches(
        lambda t: pa.table({"node": t.column("node"), "hops": t.column("hop")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def triangle_count_pipeline(
    edges,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 64,
):
    """Dataset[(a, b)] (undirected simple edges, a < b, distinct) ->
    Dataset[(n_triangles, n_wedges, transitivity)] — one row.

    Node ids must be non-negative and < 2^32: wedge/edge candidate keys
    pack as ``(x << 32) | y`` and larger or negative ids would silently
    collide; the first map stage validates the bound and raises loudly.

    Degree-ordered orientation (Chiba–Nishizeki / "rank by (degree, id)"):
    every edge points from its lower-(deg, id) endpoint to the higher one,
    so each triangle is generated EXACTLY ONCE as a wedge at its
    lowest-rank vertex, and the heaviest adjacency list any single task
    owns is O(sqrt(E)) out-neighbors — the classic hub-skew bound.  The
    wedge set (candidate pairs at each center) then semi-joins the
    oriented edge set; the match count is the triangle count.  Wedge
    generation and the closure check run in ONE execution: the wedge
    stage passes the partition's oriented edges through alongside its
    wedge candidates, both keyed by ``hash(x)`` (a wedge (x, y) can only
    close via the oriented edge x -> y, which lives in edge partition
    ``hash(u=x)``), so the closure probe is the very next keyed exchange
    — no separate join pipeline, no extra materialization.

    n_wedges is the standard open+closed 2-path count sum(d*(d-1)/2)
    (exact python ints over the dimension-sized degree table), and
    transitivity = 3*T / W with one float divide — bit-exact in SQL.
    """
    import ray
    import ray.data as rd

    _bound = np.int64(1) << np.int64(32)

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if a.size:
            lo = min(a.min(), b.min())
            hi = max(a.max(), b.max())
            if lo < 0 or hi >= _bound:
                raise ValueError(
                    f"triangle_count_pipeline: node ids must be in [0, 2^32)"
                    f" for packed wedge keys; got range [{lo}, {hi}]"
                )
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    e = edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # degree table: dimension-sized (one row per node) — broadcast
    def deg_partials(t: pa.Table) -> pa.Table:
        ab = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        vals, cnt = np.unique(ab, return_counts=True)
        return pa.table({"node": pa.array(vals), "d": pa.array(cnt.astype(np.int64))})

    # node domain is open-ended -> bounded-partition fold for the exchange;
    # the take_all stays: this plan's documented contract is that the NODE
    # table (not the edges) fits the driver
    from ddsketch_ruby_ray.pipelines.fold import partitioned_group_sum

    deg_tabs = [
        ray.get(r)
        for r in partitioned_group_sum(
            e.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True),
            "node",
            "d",
        ).to_arrow_refs()  # arrow refs, not take_all: O(nodes) rows stay columnar
    ]
    deg_tabs = [t for t in deg_tabs if t.num_rows]
    if not deg_tabs:
        return rd.from_arrow(
            pa.table(
                {
                    "n_triangles": pa.array([0], pa.int64()),
                    "n_wedges": pa.array([0], pa.int64()),
                    "transitivity": pa.array([0.0], pa.float64()),
                }
            )
        )
    deg_tbl = pa.concat_tables(deg_tabs)
    nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    degs = deg_tbl.column("sum(d)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]
    # orientation rank: position in the (degree, node) total order
    rank = np.empty(nodes.size, dtype=np.int64)
    rank[np.lexsort((nodes, degs))] = np.arange(nodes.size)
    # vectorized exact wedge count with a loud int64 guard (float64 upper
    # bound first: per-node d^2/2 and the total must stay under 2^63)
    est = float((degs.astype(np.float64) ** 2).sum()) / 2.0
    if est >= 2**62:
        raise OverflowError("triangle_count_pipeline: wedge count exceeds int64")
    n_wedges = int((degs * (degs - 1) // 2).sum())
    ref = ray.put((nodes, rank))

    def orient(t: pa.Table) -> pa.Table:
        ns, rk = ray.get(ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        ra = rk[np.searchsorted(ns, a)]
        rb = rk[np.searchsorted(ns, b)]
        lo_first = ra < rb
        u = np.where(lo_first, a, b)
        v = np.where(lo_first, b, a)
        part = (hash64_int(u) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "_part": pa.array(part),
            }
        )

    def wedges_and_edges(g: pa.Table) -> pa.Table:
        """Per hash(u) partition: emit wedge candidates (kind=1) AND the
        partition's oriented edges (kind=0), both re-keyed by the hash of
        the candidate/closing edge's lower-rank endpoint, so one more
        keyed exchange co-locates every wedge with the only edge that can
        close it."""
        ns, rk = ray.get(ref)
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        if not u.size:
            return pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                    "_cpart": pa.array([], pa.int32()),
                }
            )
        rv = rk[np.searchsorted(ns, v)]
        order = np.lexsort((rv, u))  # each u's out-list in rank order
        u_s, v_s = u[order], v[order]
        new = np.empty(u_s.size, dtype=bool)
        new[0] = True
        new[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        seg_len = np.diff(np.append(starts, u_s.size))
        pos = np.arange(u_s.size) - starts[seg]
        cnt = (seg_len[seg] - 1 - pos).astype(np.int64)
        first = np.repeat(np.arange(u_s.size), cnt)
        excl = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        second = np.arange(int(cnt.sum())) - np.repeat(excl, cnt) + first + 1
        x, y = v_s[first], v_s[second]  # rank(x) < rank(y): oriented pair
        pk = np.concatenate([(x << np.int64(32)) | y, (u << np.int64(32)) | v])
        kind = np.concatenate(
            [np.ones(x.size, np.int8), np.zeros(u.size, np.int8)]
        )
        lead = np.concatenate([x, u])
        cpart = (hash64_int(lead) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "pk": pa.array(pk),
                "kind": pa.array(kind),
                "_cpart": pa.array(cpart),
            }
        )

    def close_count(g: pa.Table) -> pa.Table:
        pk = g.column("pk").to_numpy(zero_copy_only=False)
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        edge_pk = np.sort(pk[kind == 0])
        wedge_pk = pk[kind == 1]
        if not edge_pk.size or not wedge_pk.size:
            n = 0
        else:
            idx = np.searchsorted(edge_pk, wedge_pk)
            idx[idx == edge_pk.size] = edge_pk.size - 1
            n = int((edge_pk[idx] == wedge_pk).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    n_tri = int(
        e.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(wedges_and_edges, batch_format="pyarrow")
        .groupby("_cpart")
        .map_groups(close_count, batch_format="pyarrow")
        .sum("n")
        or 0
    )
    trans = float(3 * n_tri) / float(n_wedges) if n_wedges > 0 else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([n_tri], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
                "transitivity": pa.array([trans], pa.float64()),
            }
        )
    )


def sssp_pipeline(
    edges,
    seeds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
    max_rounds: int = 4,
    num_partitions: int = 64,
    mode: str = "auto",
    max_broadcast_nodes: int = _MAX_BROADCAST_NODES,
):
    """K-round Bellman-Ford single-source-set shortest paths over the
    UNDIRECTED weighted edge set: -> Dataset[(node, dist)] — the minimum
    total weight over paths of <= max_rounds edges from ANY seed
    (unreached nodes absent).  Weights must be non-negative int64, so the
    min-plus relaxation is exact and order-free.

    ``mode="broadcast"`` (and ``"auto"`` while the reached set fits): the
    BFS/PageRank contract — the reached distance table fits the driver;
    edges pin partitioned by src after the one build exchange (undirected
    symmetrization keeps the MINIMUM weight per direction-independent
    pair); per round ONE map relaxes the edges whose src improved last
    round (searchsorted against the sorted frontier, per-block per-dst min
    via lexsort+reduceat) and the driver folds the per-block minima.
    Rounds after the frontier empties are free.  ``mode="shuffle"``: fully
    distributed min-plus propagation (the BFS shuffle plan with weighted
    relaxation) — only nodes whose distance improved message their
    neighbors; no driver-side state, the unbounded-reach path."""
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"mode must be auto|broadcast|shuffle, got {mode!r}")

    def norm(t: pa.Table) -> pa.Table:
        src = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = np.concatenate([src, dst])
        d2 = np.concatenate([dst, src])
        w2 = np.concatenate([w, w])
        part = (hash64_int(s2) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "src": pa.array(s2),
                "dst": pa.array(d2),
                "w": pa.array(w2),
                "_part": pa.array(part),
            }
        )

    def dedup_min(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, dst, src))
        s_s, d_s, w_s = src[order], dst[order], w[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (s_s[1:] != s_s[:-1]) | (d_s[1:] != d_s[:-1])
        # first row of each (src, dst) run carries the MIN weight
        return pa.table(
            {
                "src": pa.array(s_s[keep]),
                "dst": pa.array(d_s[keep]),
                "w": pa.array(w_s[keep]),
            }
        )

    pinned = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(dedup_min, batch_format="pyarrow")
        .materialize()
    )

    if mode in ("auto", "broadcast"):
        try:
            return _sssp_broadcast(
                pinned,
                seeds,
                seed_col=seed_col,
                max_rounds=max_rounds,
                max_nodes=(
                    max_broadcast_nodes if mode == "auto" else (1 << 62)
                ),
            )
        except _TooManyNodes:
            pass  # auto: reached set outgrew the driver -> shuffle plan
    return _sssp_shuffle(
        pinned,
        seeds,
        seed_col=seed_col,
        max_rounds=max_rounds,
        num_partitions=num_partitions,
    )


def _sssp_broadcast(pinned, seeds, *, seed_col: str, max_rounds: int, max_nodes: int):
    """Broadcast-frontier Bellman-Ford over the pinned src-partitioned
    min-weight edge table (see ``sssp_pipeline``); raises ``_TooManyNodes``
    when the reached distance table outgrows the driver contract."""
    import ray
    import ray.data as rd

    seed_tabs = [
        ray.get(r)
        for r in seeds.map_batches(
            lambda t: pa.table({"node": t.column(seed_col).cast(pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_arrow_refs()
    ]
    seed_tabs = [t for t in seed_tabs if t.num_rows]
    if seed_tabs:
        frontier = np.unique(
            pa.concat_tables(seed_tabs).column("node").to_numpy(zero_copy_only=False)
        )
    else:
        frontier = np.empty(0, dtype=np.int64)
    dist: dict = {int(x): 0 for x in frontier.tolist()}
    f_dist = np.zeros(frontier.size, dtype=np.int64)

    for _ in range(max_rounds):
        if not frontier.size:
            break
        if len(dist) > max_nodes:
            raise _TooManyNodes(len(dist))
        ref = ray.put((frontier, f_dist))  # frontier sorted

        def relax(t: pa.Table) -> pa.Table:
            fr, fd = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(fr, src)
            pos_c = np.minimum(pos, max(fr.size - 1, 0))
            hit = fr[pos_c] == src
            if not np.any(hit):
                return pa.table(
                    {"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
                )
            cand_n = dst[hit]
            cand_d = fd[pos_c[hit]] + w[hit]
            order = np.lexsort((cand_d, cand_n))
            n_s, d_s = cand_n[order], cand_d[order]
            new = np.empty(n_s.size, dtype=bool)
            new[0] = True
            new[1:] = n_s[1:] != n_s[:-1]
            first = np.flatnonzero(new)  # per-dst MIN candidate
            return pa.table(
                {"node": pa.array(n_s[first]), "d": pa.array(d_s[first])}
            )

        tabs = [
            ray.get(r)
            for r in pinned.map_batches(
                relax, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            break
        cat = pa.concat_tables(tabs)
        nn = cat.column("node").to_numpy(zero_copy_only=False)
        dd = cat.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, nn))
        nn, dd = nn[order], dd[order]
        new = np.empty(nn.size, dtype=bool)
        new[0] = True
        new[1:] = nn[1:] != nn[:-1]
        first = np.flatnonzero(new)
        next_f = []
        next_d = []
        for n_, d_ in zip(nn[first].tolist(), dd[first].tolist()):
            if n_ not in dist or d_ < dist[n_]:
                dist[n_] = d_
                next_f.append(n_)
                next_d.append(d_)
        if not next_f:
            break
        order2 = np.argsort(np.asarray(next_f, dtype=np.int64))
        frontier = np.asarray(next_f, dtype=np.int64)[order2]
        f_dist = np.asarray(next_d, dtype=np.int64)[order2]

    nodes = np.array(sorted(dist), dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "dist": pa.array(
                    np.array([dist[int(x)] for x in nodes.tolist()], dtype=np.int64)
                ),
            }
        )
    )


def _sssp_shuffle(pinned, seeds, *, seed_col: str, max_rounds: int, num_partitions: int):
    """Fully distributed min-plus Bellman-Ford (the BFS shuffle plan with
    weighted relaxation): distance state lives in a hash-partitioned
    (node, dist, fresh) table, never the driver.  The min-weight edge
    table is pinned ONCE as per-partition dst-sorted object-store slices
    (see ``_pin_edge_slices``); per round, one keyed exchange co-locates
    each fresh node's state with its partition, relaxation + per-dst
    block-local min run in the group task against the by-ref slices, and
    a second keyed exchange folds candidate minima into the state table.
    Only improved nodes message their neighbors next round — the edges
    never re-shuffle."""
    import ray

    def with_src_part(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part",
            pa.array((hash64_int(src) % np.uint64(num_partitions)).astype(np.int32)),
        )

    edge_refs = _pin_edge_slices(
        pinned.map_batches(
            with_src_part, batch_format="pyarrow", zero_copy_batch=True
        ).materialize(),
        ("src", "dst", "w"),
        sort_col="dst",
        num_partitions=num_partitions,
    )

    def seed_states(t: pa.Table) -> pa.Table:
        n = np.unique(t.column(seed_col).to_numpy(zero_copy_only=False).astype(np.int64))
        return _with_part(
            pa.table(
                {
                    "node": pa.array(n),
                    "dist": pa.array(np.zeros(n.size, dtype=np.int64)),
                    "fresh": pa.array(np.ones(n.size, dtype=np.int8)),
                }
            ),
            "node",
            num_partitions,
        )

    state = seeds.map_batches(
        seed_states, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def relax(g: pa.Table) -> pa.Table:
        """One partition's FRESH state rows -> per-dst min (dist + w)
        candidates over the partition's pinned edge slices (by ref).
        Block-local per-dst min cuts the candidate exchange to one row per
        (slice, dst) — min-plus is idempotent so this is exact."""
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())}
        )
        if not g.num_rows:
            return empty
        part = int(g.column("_part")[0].as_py())
        node = g.column("node").to_numpy(zero_copy_only=False)
        dist = g.column("dist").to_numpy(zero_copy_only=False)
        o = np.argsort(node, kind="stable")
        node_s, dist_s = node[o], dist[o]
        outs = []
        for ref in edge_refs.get(part, []):
            et = ray.get(ref)
            src = et.column("src").to_numpy(zero_copy_only=False)
            dst = et.column("dst").to_numpy(zero_copy_only=False)
            w = et.column("w").to_numpy(zero_copy_only=False)
            if not src.size:
                continue
            pos = np.searchsorted(node_s, src)
            pc_ = np.minimum(pos, node_s.size - 1)
            valid = node_s[pc_] == src  # src is fresh this round
            if not valid.any():
                continue
            dv = dst[valid]  # dst-sorted slice: order survives the mask
            cv = dist_s[pc_[valid]] + w[valid]
            new = np.empty(dv.size, dtype=bool)
            new[0] = True
            new[1:] = dv[1:] != dv[:-1]
            starts = np.flatnonzero(new)
            outs.append(
                pa.table(
                    {
                        "node": pa.array(dv[starts]),
                        "cand": pa.array(np.minimum.reduceat(cv, starts)),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    def fold(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        cand = g.column("cand").to_numpy(zero_copy_only=False)
        is_old = g.column("is_old").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        n_s, c_s, io_s = node[order], cand[order], is_old[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = n_s[1:] != n_s[:-1]
        starts = np.flatnonzero(new)
        mins = np.minimum.reduceat(c_s, starts)
        seg = np.cumsum(new) - 1
        old = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
        old[seg[io_s == 1]] = c_s[io_s == 1]
        part = g.column("_part")[0].as_py()
        return pa.table(
            {
                "node": pa.array(n_s[starts]),
                "dist": pa.array(np.minimum(mins, old)),
                "fresh": pa.array((mins < old).astype(np.int8)),
                "_part": pa.array(np.full(len(starts), part, dtype=np.int32)),
            }
        )

    for _ in range(max_rounds):
        fresh_rows = state.map_batches(
            lambda t: t.filter(
                pa.compute.equal(t.column("fresh"), pa.scalar(1, pa.int8()))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if fresh_rows.count() == 0:
            break  # fixed point: no distance improved last round
        msgs = fresh_rows.groupby("_part").map_groups(
            relax, batch_format="pyarrow"
        )
        msg_rows = msgs.map_batches(
            lambda t: _with_part(
                pa.table(
                    {
                        "node": t.column("node"),
                        "cand": t.column("cand"),
                        "is_old": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                    }
                ),
                "node",
                num_partitions,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        old_rows = state.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "cand": t.column("dist"),
                    "is_old": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                    "_part": t.column("_part"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        state = (
            msg_rows.union(old_rows)
            .groupby("_part")
            .map_groups(fold, batch_format="pyarrow")
            .repartition(min(num_partitions, 16))
            .materialize()
        )

    return state.map_batches(
        lambda t: pa.table({"node": t.column("node"), "dist": t.column("dist")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def degree_histogram_pipeline(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 64,
):
    """Dataset[(src, dst)] -> Dataset[(degree, n_nodes)]: the distinct-
    neighbor OUT-degree histogram of the directed multigraph — the basic
    shape diagnostic (power-law check, super-node detection) run before
    committing to a partitioning for the iterative algorithms.

    Plan: per-block Arrow group_by dedups (src, dst) pairs locally, ONE
    hash(src) co-partition makes per-src dedup + counting global and
    local to each group task (lexsort + boundary scan, no per-key
    Python), and each task emits its own (degree, n_nodes) PARTIAL
    histogram — O(distinct degrees) rows — folded by a second, KB-sized
    keyed sum.  Only the (src, dst) id pairs ever shuffle; skewed srcs
    cost sort time, not memory (a super-node's edges co-locate but the
    task holds ids, not payloads)."""

    def pre(t: pa.Table) -> pa.Table:
        d = pa.table(
            {
                "src": t.column(src_col).cast(pa.int64()),
                "dst": t.column(dst_col).cast(pa.int64()),
            }
        ).group_by(["src", "dst"]).aggregate([])
        return _with_part(d, "src", num_partitions)

    def fold(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        o = np.lexsort((dst, src))
        src, dst = src[o], dst[o]
        keep = np.empty(src.size, dtype=bool)
        if src.size:
            keep[0] = True
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src = src[keep]
        _, deg = np.unique(src, return_counts=True)
        dval, dcnt = np.unique(deg, return_counts=True)
        return pa.table(
            {
                "degree": pa.array(dval.astype(np.int64)),
                "n_nodes": pa.array(dcnt.astype(np.int64)),
            }
        )

    from .fold import partitioned_group_sum

    partials = (
        edges.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )
    summed = partitioned_group_sum(partials, "degree", "n_nodes", num_partitions=8)
    return summed.map_batches(
        lambda t: pa.table(
            {"degree": t.column("degree"), "n_nodes": t.column("sum(n_nodes)")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
