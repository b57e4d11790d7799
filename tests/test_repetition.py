"""Repetition-signal pipeline tests (pipelines/repetition.py).

Edge cases the sf0.01 oracle query can't isolate: empty / null text,
single-token docs, all-identical tokens, and the top-bigram tie-break.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(texts):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.repetition import repetition_scores_pipeline

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    df = (
        repetition_scores_pipeline(rd.from_arrow(t), key_col="doc_id", text_col="text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return df


def test_empty_and_null_text(ray_session):
    df = _run(["", None, "one"])
    assert df["n_tokens"].tolist() == [0, 0, 1]
    assert df["dup_tokens"].tolist() == [0, 0, 0]
    assert df["n_bigrams"].tolist() == [0, 0, 0]
    assert df["top_bigram_count"].tolist() == [0, 0, 0]
    assert df["n_trigrams"].tolist() == [0, 0, 0]


def test_all_identical_tokens(ray_session):
    df = _run(["x x x x"])
    r = df.iloc[0]
    assert r["n_tokens"] == 4 and r["dup_tokens"] == 3
    # bigram "x x" occurs 3 times, len = 1 + 1 + 1 = 3 chars
    assert r["n_bigrams"] == 3 and r["top_bigram_count"] == 3
    assert r["top_bigram_chars"] == 9
    # trigram "x x x" occurs twice -> 1 duplicate
    assert r["n_trigrams"] == 2 and r["dup_trigrams"] == 1


def test_no_repetition(ray_session):
    df = _run(["a bb ccc dddd"])
    r = df.iloc[0]
    assert r["dup_tokens"] == 0 and r["dup_trigrams"] == 0
    assert r["top_bigram_count"] == 1
    # ties on count=1: the winner is SOME bigram; chars = count * its length
    assert r["top_bigram_chars"] in {1 + 1 + 2, 2 + 1 + 3, 3 + 1 + 4}


def test_counts_match_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)).tolist())
        for _ in range(60)
    ]
    df = _run(texts)
    for i, txt in enumerate(texts):
        toks = [t for t in txt.split(" ") if t]
        r = df.iloc[i]
        assert r["n_tokens"] == len(toks)
        assert r["dup_tokens"] == len(toks) - len(set(toks))
        bigrams = list(zip(toks, toks[1:]))
        assert r["n_bigrams"] == len(bigrams)
        if bigrams:
            from collections import Counter

            c = Counter(bigrams)
            best = max(c.values())
            assert r["top_bigram_count"] == best
            # chars consistent with SOME argmax bigram
            cand = {
                best * (len(a) + 1 + len(b)) for (a, b), n in c.items() if n == best
            }
            assert r["top_bigram_chars"] in cand
        tri = list(zip(toks, toks[1:], toks[2:]))
        assert r["n_trigrams"] == len(tri)
        assert r["dup_trigrams"] == len(tri) - len(set(tri))


def test_multiline_docs_extra_spaces(ray_session):
    # double spaces create empty splits which must be dropped
    df = _run(["a  a   b", "q w q w q w"])
    assert df["n_tokens"].tolist() == [3, 6]
    assert df["dup_tokens"].tolist() == [1, 4]
    # "q w" occurs 3x (len 3); "w q" occurs 2x
    assert df.iloc[1]["top_bigram_count"] == 3
    assert df.iloc[1]["top_bigram_chars"] == 9


class TestMovingWindow:
    """moving_window_pipeline edge cases (pipelines/windows.py)."""

    def _run(self, keys, ts, vals, frame=3):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.windows import moving_window_pipeline

        t = pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "ts": pa.array(
                    np.asarray(ts, dtype=np.int64) * 1_000_000, pa.timestamp("us")
                ),
                "eid": pa.array(range(len(keys)), pa.int64()),
                "v": pa.array(vals, pa.float64()),
            }
        )
        df = moving_window_pipeline(
            rd.from_arrow(t),
            key_col="k",
            ts_col="ts",
            tiebreak_col="eid",
            value_col="v",
            frame=frame,
            value_scale=1.0,
            carry_cols=["eid"],
        ).to_pandas()
        return df.sort_values("eid").reset_index(drop=True)

    def test_basic_frame(self, ray_session):
        df = self._run([1, 1, 1, 1], [0, 1, 2, 3], [5.0, 1.0, 4.0, 2.0], frame=3)
        assert df["mov_sum"].tolist() == [5, 6, 10, 7]
        assert df["mov_min"].tolist() == [5, 1, 1, 1]
        assert df["mov_max"].tolist() == [5, 5, 5, 4]
        assert df["frame_count"].tolist() == [1, 2, 3, 3]

    def test_keys_isolated(self, ray_session):
        df = self._run([1, 2, 1, 2], [0, 0, 1, 1], [10.0, 20.0, 1.0, 2.0], frame=2)
        by_key = {(int(k), int(r)): int(s) for k, r, s in zip(df["k"], df["rn"], df["mov_sum"])}
        assert by_key == {(1, 1): 10, (1, 2): 11, (2, 1): 20, (2, 2): 22}

    def test_frame_one(self, ray_session):
        df = self._run([1, 1], [0, 1], [3.0, 7.0], frame=1)
        assert df["mov_sum"].tolist() == [3, 7]
        assert df["mov_min"].tolist() == [3, 7]

    def test_matches_duckdb_fuzz(self, ray_session):
        import duckdb

        rng = np.random.default_rng(11)
        n, k = 400, 4
        keys = rng.integers(0, 12, n)
        ts = rng.integers(0, 1000, n)
        vals = np.round(rng.normal(0, 50, n), 3)
        df = self._run(keys, ts, vals, frame=k)
        con = duckdb.connect()
        import pandas as pd

        con.register(
            "e",
            pd.DataFrame(
                {"k": keys, "ts": ts, "eid": np.arange(n), "v": np.round(vals)}
            ),
        )
        exp = con.execute(
            f"""
            SELECT eid, CAST(sum(v) OVER f AS BIGINT) AS ms,
                   CAST(min(v) OVER f AS BIGINT) AS mn,
                   CAST(max(v) OVER f AS BIGINT) AS mx
            FROM e
            WINDOW f AS (PARTITION BY k ORDER BY ts, eid
                         ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
            ORDER BY eid
            """
        ).fetchdf()
        # engine quantizes round(v * 1.0) half-away; regenerate to match:
        from ddsketch_ruby_ray.core.numeric import round_half_away

        qv = round_half_away(vals * 1.0).astype(np.int64)
        # recompute engine run on the quantized values via scale=1 on ints
        df2 = self._run(keys, ts, qv.astype(float), frame=k)
        assert df2["mov_sum"].tolist() == exp["ms"].tolist()
        assert df2["mov_min"].tolist() == exp["mn"].tolist()
        assert df2["mov_max"].tolist() == exp["mx"].tolist()
