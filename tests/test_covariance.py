"""SQ8 covariance pipeline (pipelines/covariance.py) vs brute-force numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(tbl):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.covariance import sq8_covariance_pipeline

    out = sq8_covariance_pipeline(
        rd.from_arrow(tbl).repartition(4), label_col="label", vec_col="v"
    ).to_pandas()
    return out.set_index(["label", "i", "j"]).sort_index()


def _brute(tbl):
    from ddsketch_ruby_ray.pipelines.quantize import _encode, _normalized_e6

    m = np.asarray(tbl.column("v").to_pylist(), dtype=np.float64)
    labels = np.asarray(tbl.column("label").to_pylist())
    a6 = max(1, int(np.abs(_normalized_e6(m)).max()))
    q = _encode(m, a6)
    rows = {}
    for lab in np.unique(labels):
        c = q[labels == lab]
        n = c.shape[0]
        for i in range(c.shape[1]):
            for j in range(i, c.shape[1]):
                si, sj = int(c[:, i].sum()), int(c[:, j].sum())
                sij = int((c[:, i] * c[:, j]).sum())
                rows[(lab, i + 1, j + 1)] = (n, si, sj, sij, n * sij - si * sj)
    return rows


class TestSq8Covariance:
    def test_vs_brute_force(self, ray_session):
        rng = np.random.default_rng(3)
        n, d = 300, 6
        m = rng.normal(size=(n, d))
        m[5] = 0.0  # zero vector: norm guard path
        tbl = pa.table(
            {
                "label": pa.array(rng.integers(0, 3, n), pa.int32()),
                "v": pa.array(list(m.astype(np.float32))),
            }
        )
        got = _run(tbl)
        want = _brute(tbl)
        assert len(got) == len(want)
        for key, (wn, wsi, wsj, wsij, wcov) in want.items():
            r = got.loc[key]
            assert (r.n, r.sum_i, r.sum_j, r.sum_ij, r.cov_num) == (
                wn, wsi, wsj, wsij, wcov,
            ), key

    def test_diagonal_cov_nonnegative(self, ray_session):
        rng = np.random.default_rng(4)
        tbl = pa.table(
            {
                "label": pa.array(np.zeros(50, dtype=np.int32)),
                "v": pa.array(list(rng.normal(size=(50, 4)).astype(np.float32))),
            }
        )
        out = _run(tbl).reset_index()
        diag = out[out.i == out.j]
        assert (diag.cov_num >= 0).all()
