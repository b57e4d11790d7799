"""Document chunking tests (pipelines/chunk.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _run(texts, size, overlap, repartition=3):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.chunk import chunk_documents_pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = chunk_documents_pipeline(
        rd.from_arrow(t).repartition(repartition),
        key_col="id",
        text_col="text",
        chunk_size=size,
        overlap=overlap,
    )
    return (
        out.to_pandas().sort_values(["id", "chunk_id"]).reset_index(drop=True)
    )


def _brute(texts, size, overlap):
    step = size - overlap
    rows = []
    for i, s in enumerate(texts):
        start = 0
        while start < len(s):
            c = s[start : start + size]
            rows.append((i, start // step, c, len(c)))
            start += step
    return rows


class TestChunking:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(13)
        texts = [
            "".join(rng.choice(list("abcde "), rng.integers(0, 60)).tolist())
            for _ in range(200)
        ]
        for size, ov in ((10, 0), (10, 3), (7, 6)):
            got = _run(texts, size, ov)
            want = _brute(texts, size, ov)
            assert len(got) == len(want)
            assert got.apply(
                lambda r: (r.id, r.chunk_id, r.chunk, r.chunk_len), axis=1
            ).tolist() == want

    def test_empty_docs_emit_no_chunks(self, ray_session):
        got = _run(["", "ab", ""], 5, 0)
        assert got.id.tolist() == [1]
        assert got.chunk.tolist() == ["ab"]

    def test_multibyte_raises(self, ray_session):
        import ray

        with pytest.raises((NotImplementedError, ray.exceptions.RayTaskError)):
            _run(["héllo wörld"], 4, 0, repartition=1)

    def test_bad_overlap_raises(self, ray_session):
        with pytest.raises(ValueError):
            _run(["abc"], 4, 4)
