"""Connected-components clustering tests (pipelines/cc.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(pairs, parts=4, **kw):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.cc import connected_components_pipeline

    out = connected_components_pipeline(
        rd.from_arrow(pairs), num_partitions=parts, **kw
    ).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out.node, out.cluster))


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return pa.table({"a": pa.array(list(a), pa.int64()), "b": pa.array(list(b), pa.int64())})


class TestConnectedComponents:
    def test_chain_star_and_isolated_components(self, ray_session):
        got = _run(_pairs([(9, 1), (1, 2), (2, 3), (5, 7), (20, 21), (21, 22)]))
        assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5, 20: 20, 21: 20, 22: 20}

    def test_long_chain_needs_iterations(self, ray_session):
        # a 30-node path: min label must walk the full diameter
        got = _run(_pairs([(i, i + 1) for i in range(100, 130)]), parts=3)
        assert set(got.values()) == {100} and len(got) == 31

    def test_matches_networkless_union_find(self, ray_session):
        rng = np.random.default_rng(17)
        edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2)) if a != b]
        got = _run(_pairs(edges), parts=5)
        # reference union-find
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for n in parent:
            want[n] = find(n)
        assert got == want

    def test_empty_pairs(self, ray_session):
        got = _run(_pairs([]))
        assert got == {}
