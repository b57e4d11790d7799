"""Per-task kernel throughput under concurrency — DRAM-bandwidth attribution.

Measures how much a single task's throughput degrades when K identical
tasks run at once on this box.  A kernel that is CPU-bound keeps its
per-task rate flat as K grows; a kernel that is DRAM-bandwidth-bound slows
per task because all K tasks share ONE memory bus — whereas K cluster
NODES would each bring their own.  The ratio (solo rate / per-task rate at
K) is therefore the single-box scaling ceiling for that kernel: a job whose
wall is dominated by a kernel with ratio R cannot exceed efficiency 1/R
here, no matter how well the orchestration scales.

Kernels (the measured hot loops of the two BASELINE.md rows below the
0.8 bar):

- ``triad``      — STREAM-style a[:] = b + 3*c over 64M float64: the pure
                   bandwidth reference (upper bound on memory pressure).
- ``lexsort``    — np.lexsort + dedup mask over 4M-row int64 (src, dst)
                   pairs: the PageRank fused-exchange reduce kernel.
- ``gather``     — contrib[src_idx] random gather + reduceat over 4M int32
                   indices into a 2M-slot table: the PageRank iteration.
- ``minhash``    — fold_windows + _minhash_matrix + _band_buckets over a
                   synthetic 2k-doc token-hash stream: the LSH signature
                   stage (dedup.py) measured in µs/token.
- ``shmcopy``    — 256 MB heap->shared-mmap->heap round trip: the object
                   store's put/get memcpy path (the exchange bytes).

Usage:  python tools/membench.py [K ...]     (default: 1 4 16)
Prints one JSON line per (kernel, K) and a markdown table at the end.
No Ray — plain multiprocessing, so the numbers isolate the hardware from
any scheduler effect.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MIN_WALL = 2.0  # seconds each worker spends looping the kernel


def _read_steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _steal_pct(b: tuple[int, int], a: tuple[int, int]) -> float:
    dt = a[1] - b[1]
    return round(100.0 * (a[0] - b[0]) / dt, 2) if dt else 0.0


# --- kernel setup/run pairs ------------------------------------------------
# each returns (units_per_iteration, run_callable); "units" is rows or tokens


def _setup_triad():
    n = 64_000_000
    rng = np.random.default_rng(7)
    b = rng.random(n)
    c = rng.random(n)
    a = np.empty(n)

    def run():
        np.add(b, 3.0 * c, out=a)  # 3 arrays touched: ~1.5 GB traffic

    return n, run


def _setup_lexsort():
    n = 4_000_000
    rng = np.random.default_rng(11)
    src = rng.integers(0, 2_000_000, n, dtype=np.int64)
    dst = rng.integers(0, 2_000_000, n, dtype=np.int64)

    def run():
        o = np.lexsort((src, dst))
        s, d = src[o], dst[o]
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        s[keep]

    return n, run


def _setup_gather():
    n = 4_000_000
    n_nodes = 2_000_000
    rng = np.random.default_rng(13)
    src_idx = rng.integers(0, n_nodes, n, dtype=np.int32)
    dst_idx = np.sort(rng.integers(0, n_nodes, n, dtype=np.int32))
    contrib = rng.integers(0, 1 << 40, n_nodes, dtype=np.int64)

    def run():
        c = contrib[src_idx]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = dst_idx[1:] != dst_idx[:-1]
        starts = np.flatnonzero(new)
        np.add.reduceat(c, starts)

    return n, run


def _setup_minhash():
    # NOTE: mirrors dedup.py's _minhash_matrix/_band_buckets inline — the
    # pipelines module import pulls the full ray chain, which dominates
    # worker spawn time and distorts the measurement
    from ddsketch_ruby_ray.core.hashing import (
        fold_windows,
        hash64_int,
        splitmix64,
    )

    def _minhash_matrix(flat, bounds, num_hashes):
        n_docs = len(bounds) - 1
        starts = bounds[:-1]
        valid = bounds[1:] > starts
        out = np.full((num_hashes, n_docs), np.int64(2**63 - 1), dtype=np.int64)
        if flat.size and valid.any():
            vstarts = starts[valid]
            for i in range(num_hashes):
                h = (hash64_int(flat.astype(np.int64), seed=i) >> np.uint64(1)).astype(
                    np.int64
                )
                out[i, valid] = np.minimum.reduceat(h, vstarts)
        return out

    def _band_buckets(sig, bands):
        num_hashes, n = sig.shape
        r = num_hashes // bands
        out = np.empty((bands, n), dtype=np.int64)
        old = np.seterr(over="ignore")
        try:
            for b in range(bands):
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(r):
                    acc = splitmix64(acc + sig[b * r + j].astype(np.uint64))
                out[b] = acc.astype(np.int64)
        finally:
            np.seterr(**old)
        return out

    n_docs = 2_000
    toks_per_doc = 200  # ~sf corpus shape
    rng = np.random.default_rng(17)
    tokh = rng.integers(0, 1 << 63, n_docs * toks_per_doc, dtype=np.int64).astype(
        np.uint64
    )
    bounds = (np.arange(n_docs + 1, dtype=np.int64)) * toks_per_doc
    n_tokens = tokh.size

    def run():
        L = np.diff(bounds)
        n_win = np.maximum(L - 3 + 1, 1)
        doc_first = np.repeat(bounds[:-1], n_win)
        win_cum = np.concatenate([[0], np.cumsum(n_win)])
        intra = np.arange(int(n_win.sum()), dtype=np.int64) - np.repeat(
            win_cum[:-1], n_win
        )
        h = fold_windows(tokh, doc_first + intra, 3, None)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
        order = np.lexsort((h, doc_of))
        h_s, d_s = h[order], doc_of[order]
        first = np.empty(h_s.size, dtype=bool)
        first[0] = True
        first[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
        flat = h_s[first]
        per_doc = np.bincount(d_s[first], minlength=n_docs)
        b2 = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int64)
        sig = _minhash_matrix(flat, b2, 16)
        _band_buckets(sig, 8)

    return n_tokens, run


def _setup_shmcopy():
    """The object-store exchange path in miniature: every Ray Data shuffle
    byte is memcpy'd INTO shared memory by the producer (put) and OUT by
    the consumer (get).  Each worker owns a private 256 MB anonymous-mmap
    segment (like each task's plasma allocation) and round-trips a heap
    buffer through it; units = elements moved (one put + one get per
    iteration).  If this kernel's per-task rate collapses at K=16 while
    the compute kernels hold, the sub-0.8 rows are exchange-bandwidth
    bound — the resource a real N->4N cluster scales with node count."""
    import mmap

    n = 32 * 1024 * 1024  # 256 MB of float64
    src = np.random.default_rng(11).random(n)
    mm = mmap.mmap(-1, src.nbytes)
    dst = np.frombuffer(mm, dtype=np.float64)
    back = np.empty(n)

    def run():
        dst[:] = src   # put: heap -> shared segment
        back[:] = dst  # get: shared segment -> heap

    return 2 * n, run


KERNELS = {
    "triad": _setup_triad,
    "shmcopy": _setup_shmcopy,
    "lexsort": _setup_lexsort,
    "gather": _setup_gather,
    "minhash": _setup_minhash,
}


def _worker(kernel: str, barrier, out_q) -> None:
    units, run = KERNELS[kernel]()
    run()  # warm: page in inputs, JIT nothing (numpy), touch outputs
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while True:
        run()
        iters += 1
        el = time.perf_counter() - t0
        if el >= _MIN_WALL:
            break
    out_q.put(units * iters / el)


def measure(kernel: str, k: int) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(k)
    out_q = ctx.Queue()
    s0 = _read_steal()
    procs = [
        ctx.Process(target=_worker, args=(kernel, barrier, out_q)) for _ in range(k)
    ]
    for p in procs:
        p.start()
    rates = [out_q.get() for _ in range(k)]
    for p in procs:
        p.join()
    steal = _steal_pct(s0, _read_steal())
    per_task = float(np.mean(rates))
    return {
        "kernel": kernel,
        "concurrency": k,
        "per_task_units_per_s": round(per_task, 1),
        "aggregate_units_per_s": round(per_task * k, 1),
        "host_steal_pct": steal,
    }


def main() -> None:
    """Interleaved A/B/A/B rounds per (kernel, K): this box's throughput is
    non-stationary (identical back-to-back microbenchmarks measured 2-4x
    apart with ~0%% reported steal — the hypervisor hides neighbor
    contention), so solo-then-concurrent in sequence confounds box drift
    with the concurrency effect.  Interleaving + median-of-R bounds it."""
    ks = [int(a) for a in sys.argv[1:]] or [1, 16]
    reps = int(os.environ.get("MEMBENCH_REPS", "5"))
    rows = []
    for kernel in KERNELS:
        samples = {k: [] for k in ks}
        steals = {k: [] for k in ks}
        for _ in range(reps):
            for k in ks:
                r = measure(kernel, k)
                samples[k].append(r["per_task_units_per_s"])
                steals[k].append(r["host_steal_pct"])
        base = float(np.median(samples[ks[0]]))
        for k in ks:
            med = float(np.median(samples[k]))
            r = {
                "kernel": kernel,
                "concurrency": k,
                "per_task_units_per_s_median": round(med, 1),
                "spread_min_max": [round(min(samples[k]), 1), round(max(samples[k]), 1)],
                "slowdown_vs_solo": round(base / med, 2),
                "host_steal_pct_max": max(steals[k]),
                "reps": reps,
            }
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n| kernel | K | per-task units/s (median) | min-max | slowdown R | ceiling 1/R |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        lo, hi = r["spread_min_max"]
        print(
            f"| {r['kernel']} | {r['concurrency']} "
            f"| {r['per_task_units_per_s_median']:,.0f} | {lo:,.0f}-{hi:,.0f} "
            f"| {r['slowdown_vs_solo']:.2f}x | {1 / r['slowdown_vs_solo']:.2f} |"
        )


if __name__ == "__main__":
    main()
