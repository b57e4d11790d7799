"""Normalized (case/whitespace) dedup tests (pipelines/dedup.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(rows):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.dedup import normalized_dedup_pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "text": pa.array(rows, pa.string()),
        }
    )
    out = normalized_dedup_pipeline(
        rd.from_arrow(t).repartition(3), key_col="id", text_col="text"
    )
    return sorted(out.to_pandas()["id"].tolist())


class TestNormalizedDedup:
    def test_case_and_whitespace_variants_collapse(self, ray_session):
        rows = [
            "Hello World",          # 0 survives
            "hello   world",        # 1 dup of 0
            "  HELLO\tWORLD  ",     # 2 dup of 0 (tabs + edges)
            "hello worlds",         # 3 distinct
            "hello\nworld",         # 4 dup of 0 (newline run)
            "",                     # 5 empty survives
            "   ",                  # 6 dup of 5 (all-space -> empty)
        ]
        assert _run(rows) == [0, 3, 5]

    def test_matches_brute_force_normalization(self, ray_session):
        import re

        rng = np.random.default_rng(9)
        words = ["Foo", "bar", "BAZ", "qux"]
        rows = [
            ("  " if rng.random() < 0.3 else "")
            + (" ".join(rng.choice(words, rng.integers(1, 4)).tolist()))
            + ("\t" if rng.random() < 0.3 else "")
            for _ in range(300)
        ]
        got = _run(rows)
        seen, want = {}, []
        for i, r in enumerate(rows):
            k = re.sub(r"\s+", " ", r.lower()).strip(" ")
            if k not in seen:
                seen[k] = i
                want.append(i)
        assert got == sorted(want)
