"""Sequence packing tests (pipelines/packing.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs(n, seed=5, max_tok=900):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(rng.permutation(10 * n)[:n].astype(np.int64)),
            "n_tok": pa.array(rng.integers(0, max_tok, n).astype(np.int64)),
        }
    )


def _run(t, max_tokens, parts, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.packing import pack_sequences_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        pack_sequences_pipeline(
            ds, id_col="doc_id", tokens_col="n_tok",
            max_tokens=max_tokens, num_partitions=parts,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestPackSequences:
    def test_matches_serial_packing(self, ray_session):
        t = _docs(500)
        df = _run(t, 1000, 8)
        assert len(df) == 500
        # replay the packing serially per partition
        for part, g in df.groupby("part"):
            g = g.sort_values("doc_id")
            cum = 0
            for _, row in g.iterrows():
                tok = max(int(row.tokens), 1)
                assert row.seq_first == cum // 1000
                assert row.seq_last == (cum + tok - 1) // 1000
                cum += tok

    def test_layout_invariant(self, ray_session):
        t = _docs(400, seed=6)
        a = _run(t, 512, 4)
        b = _run(t, 512, 4, repartition=11)
        assert (a.values == b.values).all()

    def test_empty_doc_occupies_one_token(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "n_tok": pa.array([0, 0, 5], pa.int64()),
            }
        )
        df = _run(t, 4, 1)
        # packing order = doc_id asc: tokens 1,1,5 -> cum_before 0,1,2
        assert df.tokens.tolist() == [1, 1, 5]
        assert df.seq_first.tolist() == [0, 0, 0]
        assert df.seq_last.tolist() == [0, 0, 1]

    def test_boundary_straddle(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array([10, 20], pa.int64()),
                "n_tok": pa.array([3, 4], pa.int64()),
            }
        )
        df = _run(t, 4, 1)
        # doc 10: [0,3) -> seq 0; doc 20: [3,7) -> seqs 0..1
        assert df.seq_first.tolist() == [0, 0]
        assert df.seq_last.tolist() == [0, 1]
