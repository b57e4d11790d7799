"""KMV pairwise set operations (pipelines/setops.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.core.hashing import hash64_int
from ddsketch_ruby_ray.core.kmv import KMVSketch


def _events(n_per=3000, overlap=0.5, seed=4):
    """Three groups; ids drawn from ranges with known overlap fractions."""
    rng = np.random.default_rng(seed)
    pool = 2000
    ids_a = rng.integers(0, pool, n_per)
    ids_b = rng.integers(int(pool * (1 - overlap)), int(pool * (2 - overlap)), n_per)
    ids_c = rng.integers(3 * pool, 4 * pool, n_per)  # disjoint from a and b
    return pa.table(
        {
            "g": pa.array(["a"] * n_per + ["b"] * n_per + ["c"] * n_per),
            "uid": pa.array(np.concatenate([ids_a, ids_b, ids_c]), pa.int64()),
        }
    )


def _run(t, k, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.setops import kmv_overlap_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        kmv_overlap_pipeline(ds, group_col="g", value_col="uid", k=k)
        .to_pandas()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )


class TestKMVOverlap:
    def test_matches_incore_sketches_and_layout(self, ray_session):
        t = _events()
        df = _run(t, k=128)
        assert df.type_a.tolist() == ["a", "a", "b"]
        assert df.type_b.tolist() == ["b", "c", "c"]
        g = t["g"].to_numpy(zero_copy_only=False)
        uid = t["uid"].to_numpy(zero_copy_only=False)
        sks = {}
        for grp in ("a", "b", "c"):
            sk = KMVSketch(128)
            sk.add_hashes(hash64_int(uid[g == grp], 0))
            sks[grp] = sk
        for _, row in df.iterrows():
            a, b = sks[row.type_a], sks[row.type_b]
            u = a.merged_with(b)
            assert row.union_distinct == u.estimate()  # bit-exact
            assert row.jaccard == a.jaccard_with(b)
            assert row.intersection == a.jaccard_with(b) * u.estimate()
        df2 = _run(t, k=128, repartition=9)
        assert (df.values == df2.values).all()

    def test_estimates_track_truth(self, ray_session):
        t = _events(overlap=0.5)
        df = _run(t, k=512)
        g = t["g"].to_numpy(zero_copy_only=False)
        uid = t["uid"].to_numpy(zero_copy_only=False)
        sa, sb = set(uid[g == "a"]), set(uid[g == "b"])
        ab = df[(df.type_a == "a") & (df.type_b == "b")].iloc[0]
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(ab.jaccard - true_j) < 0.15
        assert abs(ab.union_distinct - len(sa | sb)) / len(sa | sb) < 0.15
        # disjoint pair: sampled intersection must be (near) zero
        ac = df[(df.type_a == "a") & (df.type_b == "c")].iloc[0]
        assert ac.jaccard < 0.02
        # set algebra closes: only_a + only_b + intersection == union estimate
        total = df.only_a + df.only_b + df.intersection
        assert np.allclose(total, df.union_distinct, rtol=1e-12)
        # differences track truth on the overlapping pair
        sa_d, sb_d = len(sa - sb), len(sb - sa)
        assert abs(ab.only_a - sa_d) / max(sa_d, 1) < 0.25
        assert abs(ab.only_b - sb_d) / max(sb_d, 1) < 0.25
