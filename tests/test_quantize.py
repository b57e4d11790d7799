"""Symmetric int8 embedding quantization + quantized top-k (pipelines/quantize.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vectors(n=300, dim=12, seed=17):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    # plant near-duplicates so top-k has unambiguous structure
    base[50] = base[10] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    base[51] = base[10] + rng.normal(scale=0.02, size=dim).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(base.tolist(), pa.list_(pa.float32())),
        }
    )


class TestQuantize:
    def test_codes_deterministic_across_block_layouts(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.quantize import embedding_quantize_pipeline

        t = _vectors()
        outs = []
        for blocks in (1, 7):
            df = (
                embedding_quantize_pipeline(
                    rd.from_arrow(t).repartition(blocks),
                    id_col="vec_id",
                    vec_col="embedding",
                )
                .to_pandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )
            outs.append(df)
        assert (outs[0].values == outs[1].values).all()
        # symmetric code range: the calibrating dimension hits +/-127
        assert outs[0]["q_min"].min() == -127 or outs[0]["q_max"].max() == 127
        assert outs[0]["q_min"].min() >= -127
        assert outs[0]["q_max"].max() <= 127

    def test_quantized_topk_recall_vs_exact_cosine(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.quantize import quantized_knn_pipeline
        from ddsketch_ruby_ray.pipelines.similarity import knn_bruteforce_pipeline

        t = _vectors()
        ds = rd.from_arrow(t).repartition(5)
        qids = (10, 20, 30)
        quant = quantized_knn_pipeline(
            ds, id_col="vec_id", vec_col="embedding", query_ids=qids, k=5
        ).to_pandas()
        exact = knn_bruteforce_pipeline(
            ds, id_col="vec_id", vec_col="embedding", query_ids=qids, k=5
        ).to_pandas()
        assert len(quant) == len(qids) * 5
        assert quant["score"].dtype.kind == "i"  # exact integer scores
        # recall@5 of the int8 path vs exact cosine: quantizing NORMALIZED
        # vectors keeps the int dot product rank-equivalent to approximate
        # cosine, so overlap must be high (>= 4/5 per query on this data)
        for q in qids:
            a = set(quant[quant.query_id == q]["neighbor_id"])
            b = set(exact[exact.query_id == q]["neighbor_id"])
            assert len(a & b) >= 4, (q, a, b)
        # the planted near-duplicates of vec 10 must top its quantized list
        top10 = quant[quant.query_id == 10].nlargest(2, "score")["neighbor_id"]
        assert {50, 51} == set(top10)

    def test_zero_vector_and_scale(self, ray_session):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.quantize import (
            embedding_amax6,
            embedding_quantize_pipeline,
        )

        t = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 0.0], [3.0, 4.0], [-1.0, 0.0]], pa.list_(pa.float32())
                ),
            }
        )
        ds = rd.from_arrow(t)
        assert embedding_amax6(ds, vec_col="embedding") == 1_000_000  # unit dim
        df = (
            embedding_quantize_pipeline(ds, id_col="vec_id", vec_col="embedding")
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert df.loc[0, "q_sum"] == 0  # zero vector -> all-zero codes
        # (3,4)/5 = (0.6, 0.8) -> round(127 * 0.6) = 76, round(127 * 0.8) = 102
        assert (df.loc[1, "q_first"], df.loc[1, "q_sum"]) == (76, 178)
        assert df.loc[2, "q_first"] == -127
