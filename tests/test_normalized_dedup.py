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


class TestLevenshtein:
    def test_dp_matches_duckdb(self):
        import duckdb
        import numpy as np

        from ddsketch_ruby_ray.pipelines.dedup import _levenshtein

        rng = np.random.default_rng(2)
        con = duckdb.connect()
        cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
        for _ in range(200):
            a = "".join(rng.choice(list("abcd "), rng.integers(0, 25)).tolist())
            b = "".join(rng.choice(list("abcd "), rng.integers(0, 25)).tolist())
            cases.append((a, b))
        for a, b in cases:
            got = _levenshtein(a.encode(), b.encode())
            if a == "" or b == "":  # duckdb levenshtein('', x) handles fine
                want = max(len(a), len(b))
            else:
                want = con.execute(
                    "SELECT levenshtein(?, ?)", [a, b]
                ).fetchone()[0]
            assert got == want, (a, b, got, want)

    def test_capped_dp_contract_vs_full_dp(self):
        """_levenshtein_capped: exact when true distance <= k, strictly > k
        otherwise — fuzzed across near-dup, unrelated, shared-prefix/suffix
        and substring shapes at several caps."""
        import numpy as np

        from ddsketch_ruby_ray.pipelines.dedup import (
            _levenshtein,
            _levenshtein_capped,
        )

        rng = np.random.default_rng(11)
        alpha = list("abcd ")
        cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
        for _ in range(150):
            a = "".join(rng.choice(alpha, rng.integers(0, 40)).tolist())
            b = "".join(rng.choice(alpha, rng.integers(0, 40)).tolist())
            cases.append((a, b))
            # shared-prefix/suffix near-dups (the trim path)
            core = "".join(rng.choice(alpha, rng.integers(1, 6)).tolist())
            cases.append((a + core + b, a + b))
            cases.append((a + b, a + core + b))
        for k in (0, 1, 3, 10, 40):
            for a, b in cases:
                true = _levenshtein(a.encode(), b.encode())
                got = _levenshtein_capped(a.encode(), b.encode(), k)
                if true <= k:
                    assert got == true, (a, b, k, got, true)
                else:
                    assert got > k, (a, b, k, got, true)

    def test_pipeline_finds_planted_near_dups(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.dedup import edit_distance_pairs_pipeline

        rng = np.random.default_rng(6)
        words = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(words, 30).tolist()) for _ in range(40)
        ]
        # plant near-dups: copies of docs 0..4 with one word changed
        for i in range(5):
            toks = texts[i].split(" ")
            toks[7] = "CHANGED"
            texts.append(" ".join(toks))
        t = pa.table(
            {
                "id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = edit_distance_pairs_pipeline(
            rd.from_arrow(t).repartition(3),
            key_col="id",
            text_col="text",
            max_dist=10,
        ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        planted = {(i, 40 + i) for i in range(5)}
        got = set(zip(out.a, out.b))
        assert planted <= got
        # every reported distance is the true DP distance
        from ddsketch_ruby_ray.pipelines.dedup import _levenshtein

        for _, r in out.iterrows():
            assert r.lev == _levenshtein(
                texts[r.a].encode(), texts[r.b].encode()
            ) <= 10


class TestContainment:
    def test_planted_containment_detected(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.dedup import containment_pairs_pipeline

        rng = np.random.default_rng(14)
        words = [f"t{i}" for i in range(40)]
        texts = [" ".join(rng.choice(words, 50).tolist()) for _ in range(30)]
        # doc 30: a prefix of doc 0 (fully contained, Jaccard ~0.69).  LSH is
        # Jaccard-tuned, so narrow bands (8x2) are needed for the candidate
        # to surface reliably; the CONTAINMENT verify then shows ~1.0 one way.
        texts.append(" ".join(texts[0].split(" ")[:35]))
        t = pa.table(
            {
                "id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = containment_pairs_pipeline(
            rd.from_arrow(t).repartition(3),
            key_col="id",
            text_col="text",
            threshold=0.9,
            num_hashes=16,
            bands=8,
        ).to_pandas()
        row = out[(out.a == 0) & (out.b == 30)]
        # all of doc 30's shingles appear in doc 0 -> cont_ba == 1000
        assert len(row) == 1 and row.cont_ba1000.iloc[0] == 1000
        assert row.cont_ab1000.iloc[0] < 800  # asymmetric by construction
