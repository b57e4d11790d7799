"""Integer k-means pipeline tests (pipelines/kmeans.py).

The sf0.01 oracle query pins the full 3-round run bit-exactly; these pin
the invariants the oracle can't isolate: layout independence (same result
for any block split), tie-break determinism, empty-cluster centroid
retention, and cluster quality on well-separated data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _table(mat, ids=None):
    n = mat.shape[0]
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat], pa.list_(pa.float32())
            ),
        }
    )


def _run(t, k=3, iters=3, blocks=1):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.kmeans import kmeans_pipeline

    ds = rd.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    return (
        kmeans_pipeline(ds, id_col="vec_id", vec_col="embedding", k=k, iters=iters)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_separated_clusters_recovered(ray_session):
    # rows INTERLEAVED g0,g1,g2,g0,... so the deterministic min-id seeds
    # (ids 0,1,2) land one per true group — the seeding contract a caller
    # must respect (seeds = k smallest ids)
    rng = np.random.default_rng(3)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    groups = [c + rng.normal(0, 0.3, (40, 4)) for c in centers]
    mat = np.stack(groups, axis=1).reshape(-1, 4)  # g0[0],g1[0],g2[0],g0[1],...
    df = _run(_table(mat), k=3, iters=4)
    lab = df["cluster"].to_numpy()
    # each true group lands in ONE cluster
    for g in range(3):
        assert len(set(lab[g::3])) == 1
    assert len(set(lab[:3])) == 3


def test_layout_independent(ray_session):
    rng = np.random.default_rng(5)
    mat = rng.normal(0, 1, (120, 8))
    a = _run(_table(mat), k=4, iters=3, blocks=1)
    b = _run(_table(mat), k=4, iters=3, blocks=7)
    assert a["cluster"].tolist() == b["cluster"].tolist()
    assert a["dist2"].tolist() == b["dist2"].tolist()


def test_duplicate_points_tie_to_smallest_cid(ray_session):
    # two identical seed points -> identical centroids; every point must
    # resolve the tie to the SMALLER cluster id
    mat = np.tile(np.array([[1.0, 2.0, 3.0]]), (10, 1))
    df = _run(_table(mat), k=2, iters=2)
    assert df["cluster"].tolist() == [0] * 10
    assert (df["dist2"] == 0).all()


def test_empty_cluster_keeps_centroid(ray_session):
    # duplicate seeds: round 1 ties everything into cluster 0, so cluster 1
    # EMPTIES; the keep-previous rule must preserve its centroid, which then
    # reclaims the two seed points (distance 0) in round 2.  Assignments are
    # stable from iters=2 on; centroid 0 takes one more update to shed the
    # departed seeds, so the full (cluster, dist2) state is a fixpoint from
    # iters=3 on.
    rng = np.random.default_rng(9)
    mat = np.vstack(
        [
            np.array([[5.0, 5.0, 5.0], [5.0, 5.0, 5.0]]),  # seeds 0,1 identical
            rng.normal(0, 0.05, (30, 3)) + np.array([1.0, 0.0, 0.0]),
        ]
    )
    a = _run(_table(mat), k=2, iters=2)
    b = _run(_table(mat), k=2, iters=3)
    c = _run(_table(mat), k=2, iters=4)
    assert a["cluster"].tolist()[:2] == [1, 1]  # reclaimed by the kept centroid
    assert (a["cluster"].iloc[2:] == 0).all()
    assert a["cluster"].tolist() == b["cluster"].tolist() == c["cluster"].tolist()
    assert b["dist2"].tolist() == c["dist2"].tolist()
    # shedding the departed seeds tightens cluster 0 overall (total inertia)
    assert b["dist2"].iloc[2:].sum() < a["dist2"].iloc[2:].sum()


def test_k_exceeds_rows(ray_session):
    # more seeds than distinct rows is a caller error we surface loudly
    mat = np.array([[1.0, 0.0], [0.0, 1.0]])
    import pytest

    with pytest.raises(ValueError):
        _run(_table(mat), k=5, iters=2)
