"""Per-group top-k tests (pipelines/topk.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(t, k, parts=4, **kw):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.topk import per_group_topk

    return (
        per_group_topk(
            rd.from_arrow(t), group_col="g", value_col="v", tiebreak_col="t",
            k=k, num_partitions=parts, **kw,
        )
        .to_pandas()
        .sort_values(["g", "v", "t"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


class TestPerGroupTopk:
    def test_matches_pandas_rank(self, ray_session):
        rng = np.random.default_rng(8)
        n = 2000
        t = pa.table(
            {
                "g": pa.array(rng.choice(["a", "b", "c", "d"], n).tolist()),
                "v": pa.array(rng.integers(0, 50, n), pa.int64()),
                "t": pa.array([f"i{j:05d}" for j in range(n)], pa.string()),
            }
        )
        got = _run(t, 7)
        df = t.to_pandas().sort_values(["g", "v", "t"], ascending=[True, False, True])
        want = df.groupby("g").head(7).reset_index(drop=True)
        assert got[["g", "v", "t"]].equals(want[["g", "v", "t"]])

    def test_int_groups_and_small_groups(self, ray_session):
        t = pa.table(
            {
                "g": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
                "v": pa.array([5, 9, 1, 4, 4, 2], pa.int64()),
                "t": pa.array(list("abcdef"), pa.string()),
            }
        )
        got = _run(t, 2, parts=3)
        # group 1: 9(b),5(a); group 2: 1(c); group 3 ties v=4 -> d before e
        assert list(zip(got.g, got.t)) == [(1, "b"), (1, "a"), (2, "c"), (3, "d"), (3, "e")]
