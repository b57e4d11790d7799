"""Snapshot diff (pipelines/diff.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(ta, tb, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.diff import snapshot_diff_pipeline

    a, b = rd.from_arrow(ta), rd.from_arrow(tb)
    if repartition:
        a, b = a.repartition(repartition), b.repartition(repartition)
    df = snapshot_diff_pipeline(a, b, key_col="doc_id", text_col="text").to_pandas()
    if df.empty:
        return df
    return df.sort_values("doc_id").reset_index(drop=True)


class TestSnapshotDiff:
    def test_all_statuses_and_layout(self, ray_session):
        ta = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["one", "two", "three", "four"]),
            }
        )
        tb = pa.table(
            {
                "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
                "text": pa.array(["two", "THREE!", "four", "five"]),
            }
        )
        df = _run(ta, tb)
        assert list(zip(df.doc_id, df.status)) == [
            (1, "removed"),
            (3, "changed"),
            (5, "added"),
        ]  # unchanged (2, 4) are absent: the delta IS the output
        df2 = _run(ta, tb, repartition=3)
        assert (df.values == df2.values).all()

    def test_identical_snapshots_empty_delta(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(200), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(200)]),
            }
        )
        assert len(_run(t, t)) == 0

    def test_random_delta_bruteforce(self, ray_session):
        rng = np.random.default_rng(6)
        n = 300
        ids_a = np.arange(n)
        texts_a = [f"text {i}" for i in ids_a]
        # B: drop 10%, change 10%, add 5% new ids
        drop = set(rng.choice(ids_a, n // 10, replace=False).tolist())
        change = set(
            rng.choice([i for i in ids_a if i not in drop], n // 10, replace=False).tolist()
        )
        ids_b, texts_b = [], []
        for i in ids_a:
            if i in drop:
                continue
            ids_b.append(i)
            texts_b.append(f"text {i} v2" if i in change else f"text {i}")
        new = list(range(n, n + n // 20))
        ids_b += new
        texts_b += [f"new {i}" for i in new]
        ta = pa.table({"doc_id": pa.array(ids_a, pa.int64()), "text": pa.array(texts_a)})
        tb = pa.table({"doc_id": pa.array(ids_b, pa.int64()), "text": pa.array(texts_b)})
        df = _run(ta, tb, repartition=7)
        got = dict(zip(df.doc_id, df.status))
        want = {i: "removed" for i in drop}
        want.update({i: "changed" for i in change})
        want.update({i: "added" for i in new})
        assert got == want
